package graft

import graft.llm.{Curation, Dedup, Sampling}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape contracts for the corpus-curation family
  * (d18 decontamination, d19 span dedup, d20 language mixing).
  */
class CurationSpec extends AnyFunSuite {
  import SparkTestBase.{Sf, spark}

  test("d18: train-split docs are flagged against their cross-split twins") {
    import org.apache.spark.sql.functions.col
    val splits = Sampling.splitAssign(spark, Sf)
      .withColumn("twin_split",
        Sampling.splitCol(col("doc_id") + Dedup.TwinIdOffset))
      .collect().map(r => r.getLong(0) -> (r.getString(3), r.getString(4))).toMap
    val flagged = Curation.decontaminate(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged.nonEmpty, "the seeded twins must produce contamination pairs")
    // every flagged pair is (train doc, test doc) under the d13 split
    flagged.foreach { case (t, e) =>
      def splitOf(id: Long) = {
        val base = if (id >= Dedup.TwinIdOffset) id - Dedup.TwinIdOffset else id
        if (id >= Dedup.TwinIdOffset) splits(base)._2 else splits(base)._1
      }
      assert(splitOf(t) == "train" && splitOf(e) == "test", s"pair ($t,$e)")
    }
    // an (original in train, twin in test) pair whose shared prefix is
    // long enough MUST be caught — pick one and demand its presence
    val leaked = splits.collect {
      case (id, ("train", "test")) => (id, id + Dedup.TwinIdOffset)
    }
    assert(leaked.nonEmpty, "fixture should place some twin across the split boundary")
    assert(leaked.exists(flagged.contains),
      s"none of ${leaked.size} cross-split twin pairs was flagged")
  }

  test("t14: boilerplate removal drops ALL occurrences, so it never keeps more than d19") {
    val d19 = Curation.spanDedup(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_kept
    val t14 = Curation.boilerplate(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap // doc -> (n_chunks, n_boiler)
    assert(t14.keySet == d19.keySet, "both ops cover the same corpus")
    // keep-none semantics can only remove MORE than keep-first semantics
    t14.foreach { case (doc, (chunks, boiler)) =>
      assert(chunks - boiler <= d19(doc), s"doc $doc kept more than span dedup")
    }
    // and strictly more somewhere: the FIRST copy of a duplicated chunk
    // survives d19 but not t14
    val t14Kept = t14.values.map { case (c, b) => c - b }.sum
    assert(t14Kept < d19.values.sum, "boilerplate must also drop first occurrences")
    // long docs share whole 120-char chunks with their twin (truncation
    // only clips the tail), so SOME original+twin pair co-flags. Not
    // ALL: a twin whose truncation lands mid-chunk shares nothing with
    // its original but can still match another doc's aligned prefix.
    val boiler = t14.filter(_._2._2 > 0).keySet
    val coFlagged = boiler.filter(_ >= Dedup.TwinIdOffset)
      .map(_ - Dedup.TwinIdOffset).intersect(boiler)
    assert(coFlagged.nonEmpty, "no original+twin pair was co-flagged")
  }

  test("d18: candidate generation is an equi-join on the n-gram hash, never all-pairs") {
    val plan = Curation.decontaminate(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), "must not fall back to NLJ")
  }

  test("d19: a twin's shared prefix chunks are dropped, its stats reflect survival") {
    val rows = Curation.spanDedup(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val twins = rows.keys.filter(_ >= Dedup.TwinIdOffset)
    assert(twins.nonEmpty)
    // every corpus doc appears exactly once, even fully-deduped ones
    assert(rows.size == Dedup.corpus(spark, Sf).count())
    // twins duplicate their original's leading chunks, so at least one
    // twin must lose at least its first chunk to the original
    val losers = twins.count(t => rows(t)._2 < rows(t)._1)
    assert(losers > 0, "some twin must have a dropped (duplicate) chunk")
    // global invariant: each distinct chunk survives exactly once, so
    // total kept == the corpus's distinct chunk-hash count
    import org.apache.spark.sql.functions._
    val distinctChunks = Dedup.corpus(spark, Sf)
      .select(explode(sequence(lit(1), greatest(length(col("text")), lit(1)),
        lit(Curation.SpanLen))).as("start"), col("text"))
      .select(md5(col("text").substr(col("start"), lit(Curation.SpanLen))).as("h"))
      .distinct().count()
    assert(rows.values.map(_._2).sum == distinctChunks,
      "every distinct chunk must be kept exactly once across the corpus")
  }

  test("d20: tail languages are upweighted relative to proportional sampling") {
    val docs = graft.tables.Tables.documents(spark, Sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Curation.langMix(spark, Sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keepRate = docs.map { case (l, n) => l -> kept.getOrElse(l, 0L).toDouble / n }
    val maxLang = docs.maxBy(_._2)._1
    val minLang = docs.minBy(_._2)._1
    assert(keepRate(minLang) > keepRate(maxLang),
      s"temperature mixing must keep a higher fraction of $minLang than $maxLang: $keepRate")
    // overall sample is near the T = N/2 target (hash sampling is
    // binomial around p; 3-sigma bound at fixture scale)
    val total = kept.values.sum.toDouble
    val n = docs.values.sum.toDouble
    assert(total > 0.35 * n && total < 0.65 * n, s"sampled $total of $n")
  }

  test("t16: a shared sentence yields one maximal span at the right positions") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog tonight"   // 10 words
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),                           // span at words 3..12
      (2L, s"$shared omega"),                                            // span at words 1..10
      (3L, "completely unrelated text with no repeated phrases at all xyzzy"),
      (4L, "alpha beta unrelated")                                       // < SpanK shared words
    ).toDF("doc_id", "text")
    val got = Curation.dupSpansOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 12L, 10L), (2L, 1L, 10L, 10L)))
  }

  test("t16 on corpus: spans are maximal, disjoint, ordered, ≥ SpanK words") {
    val rows = Curation.dupSpans(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty) // exact copies exist in documents (d01 finds them)
    rows.groupBy(_._1).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._2)
      sorted.foreach { case (_, s, e, w) =>
        assert(e - s + 1 == w && w >= Curation.SpanK, s"doc $doc span $s..$e")
      }
      // maximality: islands merge any overlapping/touching word windows,
      // so successive spans are disjoint in word space
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1, s"doc $doc not maximal")
        case _ =>
      }
    }
  }

  test("t16b: spans cover every EXACT duplicated k-word window (the pinned bound)") {
    val rows = Curation.spanBound(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("all_covered") == 1L,
        s"doc ${r.getLong(0)}: ${r.getAs[Long]("n_covered")}/${r.getAs[Long]("n_dup_windows")} covered")
      assert(r.getAs[Long]("excess_positions") >= 0L)
    }
    // the approximation found real duplicated mass, not an empty claim
    assert(rows.map(_.getAs[Long]("n_dup_windows")).sum > 0L)
  }

  test("t17: exact char spans equal hand-computed suffix-array output on a crafted corpus") {
    import SparkTestBase.spark.implicits._
    val l = 10
    // doc 1/2 share chars 11..40 ("BBBB...B" block); doc 3 shares
    // nothing ≥ l; doc 4 is an exact copy of doc 1 (fully covered)
    val shared = "B" * 30
    val d1 = "a" * 10 + shared + "c" * 10
    val d2 = "x" * 5 + shared + "y" * 20
    val d3 = "unique-" * 10
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d1)).toDF("doc_id", "text")
    val got = graft.llm.Curation.exactCharSpansOn(docs, l).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // docs 1 and 4 are identical → whole doc covered; doc 2's covered
    // region is exactly the shared block (chars 6..35 1-based)
    assert(got == Set(
      (1L, 1L, d1.length.toLong), (4L, 1L, d1.length.toLong),
      (2L, 6L, 35L)), s"got $got")
  }

  test("t17 on corpus: spans exact, ≥ L chars, disjoint; exact-copy docs fully covered") {
    val l = graft.llm.Curation.ExactSpanL
    val rows = graft.llm.Curation.exactCharSpans(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._2)
      sorted.foreach { case (_, s, e, w) =>
        assert(e - s + 1 == w && w >= l, s"doc $doc span $s..$e") }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1)
        case _ =>
      }
    }
  }

  test("d43: after enforcement no near-dup cluster spans splits; only linked docs move") {
    val rows = graft.llm.Sampling.splitEnforce(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    // every cluster lands on exactly ONE new split
    rows.groupBy(_._2).foreach { case (c, ms) =>
      assert(ms.map(_._4).distinct.length == 1, s"cluster $c still spans splits")
    }
    // moved flag is consistent, canonical members never move,
    // and the fixture must contain at least one genuine leak to fix
    rows.foreach { case (id, canon, old, nw, moved) =>
      assert(moved == (old != nw))
      if (id == canon) assert(!moved, s"canonical $id moved")
    }
    assert(rows.exists(_._5), "fixture should contain a split-spanning cluster")
  }
}
