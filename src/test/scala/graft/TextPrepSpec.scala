package graft

import graft.llm.TextPrep
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextPrepSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}

  test("t07: scrubbed text contains no residual PII matches") {
    val out = TextPrep.piiScrub(spark, Sf)
    // every 3rd doc gains an email, every 5th a phone — counts must reflect that
    val withEmail = out.filter(col("doc_id") % 3 === 0)
    assert(withEmail.filter(col("n_emails") < 1).isEmpty)
    assert(out.filter(col("doc_id") % 3 =!= 0 && col("n_emails") > 0).isEmpty)
    assert(out.filter(col("doc_id") % 5 =!= 0 && col("n_phones") > 0).isEmpty)
    // redaction shortens or rewrites: a doc with PII must not hash like its seeded form
    assert(out.filter(col("n_emails") > 0 || col("n_phones") > 0).count() > 0)
  }

  test("t08: chunks tile the document with the configured stride and cap") {
    val docs = graft.tables.Tables.documents(spark, Sf)
      .select(col("doc_id"), length(col("text")).as("len"))
    val chunks = TextPrep.chunk(spark, Sf)
    // every chunk ≤ ChunkLen; every start = 1 + idx*stride; last chunk reaches doc end
    assert(chunks.filter(col("chunk_len") > TextPrep.ChunkLen).isEmpty)
    assert(chunks.filter(col("start") =!= col("chunk_idx") * TextPrep.ChunkStride + 1).isEmpty)
    val coverage = chunks.groupBy("doc_id")
      .agg(max(col("start") + col("chunk_len") - 1).as("covered"))
      .join(docs, "doc_id")
      .filter(col("covered") < col("len"))
    assert(coverage.isEmpty, "chunks must cover every document to its last character")
  }

  test("t09: packing is contiguous per source and respects capacity arithmetic") {
    val packed = TextPrep.pack(spark, Sf)
    // pack_id must be non-decreasing in doc_id order within a source,
    // and equal to the concat-then-cut formula
    assert(packed.filter(
      col("pack_id") =!= ((col("cum_tokens") - 1) / TextPrep.PackCapacity).cast("long")).isEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    assert(packed.withColumn("prev", lag("pack_id", 1).over(w))
      .filter(col("prev").isNotNull && col("pack_id") < col("prev")).isEmpty)
  }

  test("t09: pack_id uses floor division — zero-token head doc lands in pack -1") {
    import spark.implicits._
    // cum_tokens = 0 (n_chars = 0 doc at the head of a source) must floor
    // to -1 like the oracle's `//`, not truncate to 0
    val got = Seq(0L, 1L, 2048L, 2049L, 4096L).toDF("cum_tokens")
      .select(col("cum_tokens"), TextPrep.packIdCol(col("cum_tokens")).as("pack_id"))
      .orderBy("cum_tokens").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((0L, -1L), (1L, 0L), (2048L, 0L), (2049L, 1L), (4096L, 1L)))
  }

  test("t10: docs with fewer than 3 words yield empty trigram metrics, not a crash") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "one"), (3L, "one two"), (4L, "a b a b a b"))
      .toDF("doc_id", "text")
    val out = graft.llm.TextStats.repetitionMetrics(docs)
      .orderBy("doc_id").collect()
    // short docs: 0 trigrams, null dup fraction (matches the oracle's empty range)
    assert(out.take(3).forall(r => r.getInt(r.fieldIndex("n_trigrams")) === 0))
    assert(out.take(3).forall(r => r.isNullAt(r.fieldIndex("dup_trigram_frac"))))
    // the 6-word doc still computes real metrics: 4 trigrams, 2 distinct
    val r4 = out(3)
    assert(r4.getInt(r4.fieldIndex("n_trigrams")) === 4)
    assert(r4.getInt(r4.fieldIndex("n_distinct_trigrams")) === 2)
  }

  test("t11: BPE encoding is lossless and strictly compresses the char count") {
    import graft.llm.Bpe
    val merges = Bpe.learnMerges(spark, Sf)
    assert(merges.size === Bpe.NumMerges)
    assert(merges.distinct.size === merges.size, "a merge rule repeated — learning is stuck")
    val out = Bpe.bpeTokens(spark, Sf)
    val docs = graft.tables.Tables.documents(spark, Sf)
      .select(col("doc_id"),
        aggregate(transform(graft.llm.TextStats.tokens(col("text")), t => length(t)),
          lit(0L), (a, x) => a + x).as("alnum_chars"))
    // token count bounded by [n_words, alnum_chars]; merges actually fired
    val joined = out.join(docs, "doc_id")
    assert(joined.filter(col("n_bpe_tokens") > col("alnum_chars")).isEmpty)
    assert(joined.filter(col("n_bpe_tokens") < col("n_words")).isEmpty)
    assert(joined.filter(col("n_bpe_tokens") < col("alnum_chars")).count() > 0,
      "no doc compressed below char count — merges never applied")
    // lossless: stripping the symbol delimiters reproduces each word
    import spark.implicits._
    val probe = Seq("hash", "partition", "join", "zzzqx").toDF("w")
    val bad = probe.select(col("w"),
        regexp_replace(graft.llm.Bpe.encodeWord(col("w"), merges), "\\|", "").as("rt"))
      .filter(col("w") =!= col("rt"))
    assert(bad.isEmpty, "BPE encoding lost characters")
  }

  test("d16: HLL distinct estimate stays within 15% of exact") {
    val rows = graft.llm.TextStats.distinctSketchRaw(spark, Sf)
      .select(col("n_distinct_exact").cast("double"), col("n_distinct_approx").cast("double"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, approx) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"sketch error too large: exact=$exact approx=$approx")
    }
  }

  test("d15: every language stratum is sampled at ceil(20%)") {
    val docs = graft.tables.Tables.documents(spark, Sf)
    val expected = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), ceil(col("n") * TextPrep.SamplePct / 100.0).as("want"))
    val got = TextPrep.stratifiedSample(spark, Sf)
      .groupBy("lang").agg(count(lit(1)).as("got"))
    assert(expected.join(got, Seq("lang"), "left")
      .filter(col("got").isNull || col("got") =!= col("want")).isEmpty)
  }
}
