package graft

import graft.expr.VectorFunctions.pqNearestCode
import graft.llm.Pq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d31 product-quantization ANN: the native argmin expression's
  * semantics, the ADC output contract, and the plan shape (the encode
  * leg must stay a shuffle-free projection — that IS the PQ value
  * proposition at scale).
  */
class PqSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}
  import spark.implicits._

  test("pqNearestCode picks min ordered-fold L2, ties to lowest index") {
    val cb = Seq(
      Seq(1.0, 0.0), // d² to (0.6,0) = 0.16
      Seq(0.0, 0.0), // d² = 0.36
      Seq(1.0, 0.0)) // duplicate of 0: tie must resolve to index 0
    val df = Seq((0, Seq(0.6f, 0.0f)), (1, Seq(0.1f, 0.0f)))
      .toDF("id", "v")
      .select(col("id"), pqNearestCode(col("v"), typedlit(cb)).as("code"))
    assert(df.orderBy("id").as[(Int, Int)].collect().toSeq == Seq((0, 0), (1, 1)))
  }

  test("pqNearestCode agrees between codegen and interpreted eval") {
    val cb = Seq.tabulate(8)(k => Seq.tabulate(16)(d => math.sin(k * 17 + d).toDouble))
    val vecs = Seq.tabulate(20)(i => (i, Seq.tabulate(16)(d => math.cos(i * 31 + d).toFloat)))
    val expected = vecs.map { case (i, v) =>
      val dists = cb.map(ce => v.zip(ce).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y) * (x.toDouble - y) })
      (i, dists.zipWithIndex.minBy { case (d, k) => (d, k) }._2)
    }
    val got = vecs.toDF("id", "v")
      .select(col("id"), pqNearestCode(col("v"), typedlit(cb)).as("code"))
      .orderBy("id").as[(Int, Int)].collect().toSeq
    assert(got == expected)
  }

  test("d31 output: 10 ranks per query, adist non-decreasing, codes bounded") {
    val out = Pq.annPq(spark, Sf).collect()
    assert(out.length == llm.Similarity.NumQueries * llm.Similarity.TopK)
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until llm.Similarity.NumQueries).toSet)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to llm.Similarity.TopK))
      val ds = sorted.map(_.getDouble(2)).toSeq
      assert(ds == ds.sorted, s"adist not monotone: $ds")
      assert(ds.forall(_ >= 0.0))
    }
  }

  test("d31 plan: broadcast ADC join, no cartesian/NLJ anywhere") {
    val p = Pq.annPq(spark, Sf).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "ADC lookup must ride a broadcast LUT equi-join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "PQ must never go all-pairs")
  }

  test("d33 output: probed-cell candidates only, ranks dense, adist monotone") {
    val out = Pq.annIvfPq(spark, Sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until llm.Similarity.NumQueries).toSet)
    byQ.foreach { case (q, rows) =>
      assert(!rows.exists(_.getLong(1) == q), "self excluded")
      val cells = rows.map(_.getInt(2)).distinct
      assert(cells.length <= llm.Similarity.NProbe,
        s"query $q candidates span ${cells.length} cells > NProbe")
      val sorted = rows.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq == (1 to sorted.length))
      val ds = sorted.map(_.getDouble(3)).toSeq
      assert(ds == ds.sorted && ds.forall(_ >= 0.0))
    }
  }

  test("d33 plan: ADC scan is a broadcast equi-join on (cell, m, code)") {
    val p = Pq.annIvfPq(spark, Sf).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "probed-cell ADC must ride a broadcast LUT equi-join")
    assert(!p.contains("CartesianProduct"), "no cartesian legs")
    // the only NLJ allowed is the tiny query×centroid cross (5×16 rows)
    val nljs = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(nljs.forall(_.contains("Cross")),
      s"unexpected non-cross NLJ: ${nljs.mkString("; ")}")
  }

  test("d46: exact rerank never loses recall vs raw ADC, and draws only from the shortlist") {
    import graft.llm.Similarity
    val exact = Similarity.cosineTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adc = Pq.annIvfPq(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rr = Pq.annIvfRerank(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(4)))
    val rrBy = rr.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(rr.nonEmpty && rrBy.keySet == adc.keySet)
    rrBy.foreach { case (q, got) =>
      assert(got.size <= Similarity.TopK)
      // refine reorders the wider shortlist: recall@K against the exact
      // top-K must be >= the raw ADC top-K's recall for every query
      val ex = exact(q)
      assert((got & ex).size >= (adc(q) & ex).size,
        s"query $q: rerank recall ${(got & ex).size} < ADC ${(adc(q) & ex).size}")
    }
    // scores are exact cosines in rank order
    rr.groupBy(_._1).foreach { case (_, qs) =>
      val byRank = qs.sortBy(_._4).map(_._3).toSeq
      assert(byRank == byRank.sorted.reverse)
    }
    // the refine stage visibly corrects at least one ADC ordering miss
    assert(rrBy.exists { case (q, got) => got != adc(q) },
      "rerank returned ADC's exact sets everywhere; refine untested on this fixture")
  }

  test("d40: one recall row per (method, query), n_hits within [0, K]") {
    val rows = graft.llm.Similarity.annRecall(spark, Sf).collect()
    val methods = Seq("d07_lsh", "d08_ivf", "d31_pq", "d33_ivfpq", "d46_rerank", "d71_hnsw")
    assert(rows.length == methods.size * graft.llm.Similarity.NumQueries)
    rows.foreach { r =>
      val (h, rec) = (r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))
      assert(h >= 0 && h <= graft.llm.Similarity.TopK)
      assert(rec == h.toDouble / graft.llm.Similarity.TopK)
    }
  }
}
