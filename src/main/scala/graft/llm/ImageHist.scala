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
}
