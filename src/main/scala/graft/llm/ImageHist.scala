package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** m19 — luminance histogram over the decoded image column: 8 buckets
  * of 32 gray levels each, per image, with each bucket's share in
  * integer per-mille. The exposure/contrast profile an image-curation
  * pass filters on (near-constant images put ~all mass in one bucket;
  * harsh binarized scans split between the extremes).
  *
  * Decode happens where the bytes live ([[Multimodal.imageTable]]'s
  * partitioning) and only the 8-row histogram leaves the task — the
  * blobs never shuffle. The oracle rebuilds the same pixels from the
  * md5 chain in SQL (the m02 convention), so a codec bug breaks the
  * hash match.
  */
object ImageHist {

  case class LumBucket(doc_id: Long, bucket: Int, n_px: Int, share_pm: Long)

  val NumBuckets = 8

  def lumHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.imageTable(spark, dir).mapPartitions { rows =>
      Multimodal.CodecInit.ready
      rows.flatMap { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
        val counts = new Array[Int](NumBuckets)
        px.foreach(p => counts(p >> 5) += 1)
        val total = w * h
        (0 until NumBuckets).iterator
          .filter(counts(_) > 0)
          .map(b => LumBucket(r.doc_id, b, counts(b), counts(b).toLong * 1000L / total))
      }
    }.toDF().orderBy("doc_id", "bucket")
  }

  /** Same md5-chain pixel rebuild as m02's oracle, bucketed. */
  val oracleLumHistogram: String =
    """WITH px AS (
      |  SELECT doc_id,
      |         (8 + doc_id % 9)::INT AS width,
      |         (8 + doc_id % 7)::INT AS height,
      |         ('0x' || substr(md5(doc_id || ':' || (i // 16)),
      |                         (i % 16) * 2 + 1, 2))::BIGINT AS px
      |  FROM documents,
      |       LATERAL (SELECT unnest(range((8 + doc_id % 9) * (8 + doc_id % 7))) AS i) t)
      |SELECT doc_id, (px // 32)::INT AS bucket, count(*)::INT AS n_px,
      |       (count(*) * 1000 // (width * height))::BIGINT AS share_pm
      |FROM px
      |GROUP BY doc_id, width, height, px // 32
      |ORDER BY doc_id, bucket""".stripMargin

  // -- m21: luminance entropy + contrast ---------------------------------------

  case class LumStats(doc_id: Long, n_px: Int, n_levels: Int,
                      entropy: Double, mean_lum: Double, stddev_lum: Double)

  /** m21 — per-image luminance ENTROPY and contrast from the decoded
    * raster: Shannon entropy of the 256-level gray distribution (a
    * near-constant scan ≈ 0 bits; dithered noise ≈ 8) plus mean and
    * population stddev — the information-content filter an image
    * curation pass runs next to m19's exposure histogram (entropy
    * catches low-information images the bucket shares can miss).
    *
    * Decode and the level-count fold happen where the bytes live (the
    * m19 rule — blobs never shuffle, one fixed-width stats row leaves
    * the task). The stddev is computed from exact integer Σpx/Σpx² in
    * the same expression shape as the SQL oracle so the doubles agree
    * bit-for-bit before the 6-dp rounding; entropy terms sum in level
    * order and the oracle in hash order, which is what the rounding
    * absorbs.
    */
  def lumStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val log2 = math.log(2.0)
    Multimodal.imageTable(spark, dir).mapPartitions { rows =>
      Multimodal.CodecInit.ready
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
        val counts = new Array[Int](256)
        var sum = 0L; var sumSq = 0L
        px.foreach { p => counts(p) += 1; sum += p; sumSq += p.toLong * p }
        val n = w * h
        var nLevels = 0; var clog = 0.0
        var v = 0
        while (v < 256) {
          val c = counts(v)
          if (c > 0) { nLevels += 1; clog += c * (math.log(c.toDouble) / log2) }
          v += 1
        }
        val entropy = math.log(n.toDouble) / log2 - clog / n
        val mean = sum.toDouble / n
        val sd = math.sqrt((n.toLong * sumSq - sum * sum).toDouble) / n
        LumStats(r.doc_id, n, nLevels, entropy, mean, sd)
      }
    }.toDF()
      // rounding via functions.round (BigDecimal HALF_UP on the exact
      // double), the same rounding every oracled double in the suite
      // goes through — never a JVM-side rint, whose multiply-first
      // ties-to-even can disagree at representable .5 products
      .select(col("doc_id"), col("n_px"), col("n_levels"),
        round(col("entropy"), 6).as("entropy"),
        round(col("mean_lum"), 6).as("mean_lum"),
        round(col("stddev_lum"), 6).as("stddev_lum"))
      .orderBy("doc_id")
  }

  // -- m22: sharpness / gradient profile ---------------------------------------

  case class GradStats(doc_id: Long, n_pairs: Int, total_abs: Long, max_grad: Int)

  /** m22 — per-image sharpness from the decoded raster: mean and max
    * absolute HORIZONTAL gradient (|px[r,c+1] − px[r,c]|, the 1-D
    * Laplacian-energy proxy). Blurry or synthetically upscaled images
    * sit near zero; dithered noise pegs the mean near the 85 expected
    * of uniform random levels — the focus/quality filter an image
    * curation pass runs next to m21's entropy (entropy measures the
    * level DISTRIBUTION; gradient measures its spatial arrangement, so
    * a smooth ramp and white noise separate here and not there).
    *
    * Decode and the gradient fold happen where the bytes live (the m19
    * rule — blobs never shuffle, one fixed-width row leaves the task);
    * the totals are exact integers, so `mean_grad` is a quotient of
    * identical BIGINTs in both engines under the 6-dp round.
    */
  def gradientStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.imageTable(spark, dir).mapPartitions { rows =>
      Multimodal.CodecInit.ready
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
        var tot = 0L; var mx = 0
        var row = 0
        while (row < h) {
          var c = 0
          while (c < w - 1) {
            val d = math.abs(px(row * w + c + 1) - px(row * w + c))
            tot += d; if (d > mx) mx = d
            c += 1
          }
          row += 1
        }
        GradStats(r.doc_id, h * (w - 1), tot, mx)
      }
    }.toDF()
      .select(col("doc_id"), col("n_pairs"), col("total_abs"),
        round(col("total_abs").cast("double") / col("n_pairs"), 6).as("mean_grad"),
        col("max_grad"))
      .orderBy("doc_id")
  }

  /** Same md5-chain pixel rebuild; row-major adjacency via lead() with
    * the last column of each row excluded.
    */
  val oracleGradientStats: String =
    """WITH px AS (
      |  SELECT doc_id, (8 + doc_id % 9)::INT AS width, i,
      |         ('0x' || substr(md5(doc_id || ':' || (i // 16)),
      |                         (i % 16) * 2 + 1, 2))::BIGINT AS px
      |  FROM documents,
      |       LATERAL (SELECT unnest(range((8 + doc_id % 9) * (8 + doc_id % 7))) AS i) t),
      |g AS (
      |  SELECT doc_id, width, i,
      |         abs(lead(px) OVER (PARTITION BY doc_id ORDER BY i) - px) AS d
      |  FROM px),
      |f AS (SELECT doc_id, d FROM g WHERE d IS NOT NULL AND i % width <> width - 1)
      |SELECT doc_id, count(*)::INT AS n_pairs, sum(d)::BIGINT AS total_abs,
      |  round(sum(d)::DOUBLE / count(*), 6) AS mean_grad, max(d)::INT AS max_grad
      |FROM f GROUP BY 1
      |ORDER BY doc_id""".stripMargin

  /** Same md5-chain pixel rebuild, folded per level then per doc. */
  val oracleLumStats: String =
    """WITH px AS (
      |  SELECT doc_id,
      |         ('0x' || substr(md5(doc_id || ':' || (i // 16)),
      |                         (i % 16) * 2 + 1, 2))::BIGINT AS px
      |  FROM documents,
      |       LATERAL (SELECT unnest(range((8 + doc_id % 9) * (8 + doc_id % 7))) AS i) t),
      |lv AS (SELECT doc_id, px, count(*) AS c FROM px GROUP BY 1, 2),
      |a AS (
      |  SELECT doc_id, sum(c)::BIGINT AS n, count(*) AS n_levels,
      |         sum(c::DOUBLE * log2(c)) AS clog
      |  FROM lv GROUP BY 1),
      |b AS (
      |  SELECT doc_id, sum(px)::BIGINT AS s, sum(px * px)::BIGINT AS ss
      |  FROM px GROUP BY 1)
      |SELECT a.doc_id, n::INT AS n_px, n_levels::INT AS n_levels,
      |  round(log2(n) - clog / n, 6) AS entropy,
      |  round(s::DOUBLE / n, 6) AS mean_lum,
      |  round(sqrt((n * ss - s * s)::DOUBLE) / n, 6) AS stddev_lum
      |FROM a JOIN b USING (doc_id)
      |ORDER BY doc_id""".stripMargin
}
