package graft

import graft.llm.{Curation, Dedup, Multimodal}
import graft.ops.Warehouse
import graft.streaming.StreamRouter
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the fifth-session additions: q66 CDC apply,
  * d51 threshold sweep, t22 contamination attribution, m16 audio
  * near-dup, s22 streaming quality router.
  */
class RouterCdcSweepSpec extends AnyFunSuite {
  import SparkTestBase.{Sf, spark}

  test("q66: delete-then-reinsert, update, and untouched keys all land in the right state") {
    val out = Warehouse.cdcApply(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3), r.getLong(4))).toMap
    val base = Tables.orders(spark, Sf)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base.nonEmpty)
    base.foreach { case (k, p) =>
      if (k % 15 == 0)
        assert(out(k) == ((p / 2, 4, 4L)), s"reinserted key $k")
      else if (k % 5 == 0)
        assert(!out.contains(k), s"deleted key $k must be absent")
      else if (k % 3 == 0)
        assert(out(k) == ((p + 10.0, 2, 2L)), s"updated key $k")
      else
        assert(out(k) == ((p, 1, 1L)), s"untouched key $k")
    }
    assert(out.size == base.count { case (k, _) => k % 5 != 0 || k % 15 == 0 })
  }

  test("d51: pair/doc/cluster masses are monotone in the cutoff and account for the corpus") {
    val rows = Dedup.thresholdSweep(spark, Sf).collect()
    assert(rows.length == Dedup.SweepTaus.length)
    val corpusN = Dedup.corpus(spark, Sf).count()
    rows.foreach { r =>
      // keep-one-per-cluster arithmetic: survivors = corpus − dropped
      assert(r.getLong(5) == corpusN - r.getLong(2) + r.getLong(3), s"tau ${r.getDouble(0)}")
      assert(r.getLong(4) <= r.getLong(2), "max cluster cannot exceed paired docs")
    }
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getLong(1) >= hi.getLong(1), "n_pairs must not grow with tau")
        assert(lo.getLong(2) >= hi.getLong(2), "n_docs must not grow with tau")
        assert(lo.getLong(4) >= hi.getLong(4), "max_cluster must not grow with tau")
        assert(lo.getLong(5) <= hi.getLong(5), "survivors must not shrink with tau")
      case _ => ()
    }
    // the base cutoff row IS d03: same verified-pair relation
    val d03Pairs = Dedup.lshJaccardPairs(spark, Sf).count()
    assert(rows.head.getDouble(0) == Dedup.JaccardThreshold)
    assert(rows.head.getLong(1) == d03Pairs,
      "tau = base-threshold pair count must equal the d03 relation")
  }

  test("t22: attribution is consistent with d18's pair counts and its own ppm arithmetic") {
    val t22 = Curation.contamAttribution(spark, Sf).collect()
    assert(t22.nonEmpty)
    t22.foreach { r =>
      val (elig, matched, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(matched <= elig, s"eval ${r.getLong(0)}")
      assert(ppm == matched * 1000000L / elig, s"eval ${r.getLong(0)} ppm")
      assert(r.getBoolean(6) == (ppm >= Curation.ContamFlagPpm))
      if (matched == 0) assert(r.isNullAt(4) && r.isNullAt(5))
      else assert(r.getLong(5) <= matched, "top train doc shares a subset of matched")
    }
    val d18 = Curation.decontaminate(spark, Sf)
      .groupBy("eval_id").agg(max("n_shared").as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val withMatch = t22.filter(_.getLong(2) > 0)
    assert(withMatch.map(_.getLong(0)).toSet == d18.keySet,
      "evals with a match must be exactly d18's eval set")
    withMatch.foreach(r =>
      assert(r.getLong(5) == d18(r.getLong(0)),
        s"top_shared for eval ${r.getLong(0)} must equal d18's max pair count"))
  }

  // sf0.001 has only 50 docs (< NdBases), so no variant pairs exist —
  // the fingerprint/banding contract needs the 500-doc fixture
  private val M16Sf = "/root/testdata/sf0.01"

  test("m16: banded engine output equals a brute-force Hamming join of independently built fingerprints") {
    val ids = Tables.documents(spark, M16Sf).select("doc_id")
      .collect().map(_.getLong(0))
    // independent reference: samples -> scale -> window energies ->
    // delta-sign bits, NO wav container, NO codec, NO banding
    def fp(id: Long): (Int, Long) = {
      val base = id % Multimodal.NdBases
      val s = Multimodal.samplesOf(base, 160 + (base % 97).toInt)
      val scaled =
        if ((id / Multimodal.NdBases) % 2 == 1)
          s.map(v => if (v < 0) -((-v) * 7 / 8) else v * 7 / 8)
        else s
      val nw = scaled.length / Multimodal.EnvWin
      val e = Array.tabulate(nw)(w =>
        (0 until Multimodal.EnvWin).map { i =>
          val v = scaled(w * Multimodal.EnvWin + i).toLong; v * v
        }.sum)
      var f = 0L
      (1 until nw).foreach(w => if (e(w) > e(w - 1)) f |= 1L << (w - 1))
      (nw, f)
    }
    val fps = ids.map(id => id -> fp(id)).toMap
    val expected = (for {
      a <- ids; b <- ids
      if a < b && fps(a)._1 == fps(b)._1
      h = java.lang.Long.bitCount(fps(a)._2 ^ fps(b)._2)
      if h <= Multimodal.NdHamMax
    } yield (a, b, h)).toSet
    val got = Multimodal.audioNearDup(spark, M16Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected, "banding must be lossless vs brute force")
    // the fixture produces real near-dups: most scaled siblings survive
    val siblings = expected.count { case (a, b, _) => b - a == Multimodal.NdBases.toLong }
    assert(siblings >= 200, s"expected most of 250 sibling pairs, got $siblings")
  }

  // the t02 quality gates recomputed independently in plain Scala
  private def qLevelRef(text: String): Int = {
    val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
    val n = toks.length
    val stopRatio = toks.count(graft.llm.TextStats.Stopwords.contains).toDouble / n
    val meanLen = toks.map(_.length).sum.toDouble / n
    (if (n >= 20) 4 else 0) +
      (if (stopRatio >= 0.05 && stopRatio <= 0.5) 3 else 0) +
      (if (meanLen >= 3.0 && meanLen <= 10.0) 3 else 0)
  }

  test("d52: kept set equals brute-force top-k per source, on both binding and non-binding fixtures") {
    for (sf <- Seq(Sf, M16Sf)) {
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("source"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1), qLevelRef(r.getString(2))))
      val expected = docs.groupBy(_._2).valuesIterator.flatMap { rows =>
        rows.sortBy(r => (-r._3, r._1)).take(llm.Sampling.DomainCap)
      }.map(r => (r._2, r._1, r._3)).toSet
      val got = llm.Sampling.domainCap(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected, s"at $sf")
    }
    // the cap BINDS on the 500-doc fixture (25 docs/source > cap)
    val perSrc = llm.Sampling.domainCap(spark, M16Sf)
      .groupBy("source").count().collect()
    assert(perSrc.forall(_.getLong(1) == llm.Sampling.DomainCap))
  }

  test("m17: the parser rediscovers every damage class from the bytes alone") {
    val got = llm.Multimodal.mediaIntegrity(spark, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      val exp = if (id % 8 == 5) "bad_crc" else if (id % 8 == 1) "truncated" else "ok"
      assert(r.getString(1) == exp, s"doc $id")
      if (exp == "bad_crc") assert(r.getString(2) == "IDAT")
      else assert(r.isNullAt(2))
    }
    assert(got.exists(_.getString(1) == "bad_crc") && got.exists(_.getString(1) == "truncated"))
  }

  test("s22: the two sinks partition the corpus and agree with the batch rule") {
    val out = StreamRouter.qualityRoute(spark, Sf).collect()
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size, "every doc routed exactly once")
    assert(out.map(_.getLong(0)).toSet == docs.keySet)
    out.foreach { r =>
      val text = docs(r.getLong(0))
      val len = text.length
      val alpha = text.toLowerCase.count(c => (c >= 'a' && c <= 'z') || c == ' ')
      val reason =
        if (len < StreamRouter.MinChars) "short"
        else if (alpha * 5 < len * 4) "low_alpha"
        else "ok"
      assert(r.getString(2) == reason, s"doc ${r.getLong(0)}")
      assert(r.getString(1) == (if (reason == "ok") "clean" else "quarantine"))
      assert(r.getInt(4) == len)
    }
    // both sinks are non-empty on the fixture (the router routes, not rubber-stamps)
    assert(out.exists(_.getString(1) == "clean") && out.exists(_.getString(1) == "quarantine"))
  }
}
