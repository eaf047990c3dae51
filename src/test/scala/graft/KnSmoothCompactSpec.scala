package graft

import graft.llm.LangModel
import graft.streaming.StreamCompact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operators: t23 Kneser-Ney-style discounted familiarity and
  * s24 streaming small-file compaction.
  */
class KnSmoothCompactSpec extends AnyFunSuite {
  import SparkTestBase.spark

  test("t23: KN components satisfy their exact algebraic ties to t12") {
    val sf = SparkTestBase.Sf
    val kn = LangModel.knFamiliarity(spark, sf)
    val t12 = LangModel.bigramFamiliarity(spark, sf)
      .select(col("doc_id"), col("sum_bigram_freq"), col("sum_context_freq"),
        col("familiarity"), col("n_bigrams").as("n12"))
    val joined = kn.join(t12, Seq("doc_id")).collect()
    assert(joined.nonEmpty)
    var scored = 0
    joined.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      assert(n == r.getAs[Long]("n12"), s"doc ${r.getAs[Long]("doc_id")} n_bigrams")
      if (n > 0) {
        scored += 1
        // Σ(4·bc − 3) = 4·Σbc − 3n and Σcc is shared with t12 verbatim
        assert(r.getAs[Long]("sum_disc4") + 3 * n == 4 * r.getAs[Long]("sum_bigram_freq"))
        assert(r.getAs[Long]("sum_ctx") == r.getAs[Long]("sum_context_freq"))
        // discounting strictly lowers the direct ratio; backoff re-adds
        // strictly positive continuation mass
        assert(r.getAs[Double]("kn_direct") < r.getAs[Double]("familiarity"))
        assert(r.getAs[Double]("kn_backoff") > 0.0)
        assert(r.getAs[Double]("kn_score") ==
          r.getAs[Double]("kn_direct") + r.getAs[Double]("kn_backoff"))
      } else {
        // short docs survive with zero bigrams and NULL sums/scores
        assert(r.isNullAt(r.fieldIndex("sum_disc4")))
        assert(r.isNullAt(r.fieldIndex("kn_score")))
      }
    }
    assert(scored > 0, "no scored docs — fixture degenerate")
  }

  test("t23 is deterministic across runs") {
    val sf = SparkTestBase.Sf
    val a = LangModel.knFamiliarity(spark, sf).collect()
    val b = LangModel.knFamiliarity(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("m18: EXIF parser recovers the embedded IFD in both byte orders; corruption surfaces") {
    import graft.llm.Multimodal
    // golden corpus path: every field matches the writer's arithmetic
    val out = Multimodal.exifMeta(spark, SparkTestBase.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == (if (id % 2 == 0) "II" else "MM"), s"bo($id)")
      assert(r.getInt(2) == 4, s"n($id)")
      assert(r.getInt(3) == (1 + id % 8).toInt, s"orient($id)")
      assert(r.getString(4) == "cam" + (id % 5), s"make($id)")
      assert(r.getInt(5) == (8 + id % 9).toInt && r.getInt(6) == (8 + id % 7).toInt, s"dims($id)")
    }
    // a JPEG with NO APP1 parses to the declared absent tuple
    val plainJpeg = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos); bos.toByteArray
    }
    assert(Multimodal.parseExif(plainJpeg) == (("none", 0, -1, "", -1, -1)))
    // flipping the byte-order marker is not silently misread: "II" vs
    // "MM" swaps every multi-byte decode, so the TIFF magic check trips
    val fixture = Multimodal.exifJpegBytesOf(2L) // little-endian
    val flipped = fixture.clone()
    flipped(2 + 4 + 6) = 'M'.toByte // first byte-order byte inside APP1
    flipped(2 + 4 + 7) = 'M'.toByte
    assertThrows[IllegalArgumentException](Multimodal.parseExif(flipped))
  }

  test("s24: compaction preserves content exactly and lands the predicted layout") {
    val sf = SparkTestBase.Sf
    val out = StreamCompact.compactedIngest(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.tables.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sum("event_id").as("ids"),
        countDistinct(pmod(col("event_id"), lit(StreamCompact.NumBatches))).as("resid"))
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.length == ev.size, "one audit row per day")
    out.foreach { r =>
      val day = r.getDate(0).toString
      val (n, ids, resid) = ev(day)
      assert(r.getLong(1) == n, s"$day rows")
      assert(r.getLong(2) == ids, s"$day id parity")
      assert(r.getLong(3) == resid, s"$day files_before")
      val rpf = StreamCompact.rowsPerFile(ev.values.map(_._1).sum)
      val expAfter = (n + rpf - 1) / rpf
      assert(r.getLong(4) == expAfter, s"$day files_after")
    }
    // independent filesystem check: the compacted layout really holds
    // ceil(rows/RowsPerFile) parquet files per day partition
    val base = graft.ops.Staging.stagePath("stream_compact", sf)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    out.foreach { r =>
      val day = r.getDate(0).toString
      val hits = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$base/compact/day=$day/part-*.parquet"))
      assert(hits != null && hits.length == r.getLong(4), s"$day fs layout")
    }
  }
}
