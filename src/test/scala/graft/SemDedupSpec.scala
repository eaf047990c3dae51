package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape contracts for d24 SemDeDup (cluster-scoped
  * semantic dedup over the embeddings table).
  */
class SemDedupSpec extends AnyFunSuite {
  import SparkTestBase.{Sf, spark}

  test("d24: covers every vector; keep flag is exactly n_dups == 0") {
    val out = Similarity.semDedup(spark, Sf).collect()
    val nVec = graft.tables.Tables.embeddings(spark, Sf).count()
    assert(out.length.toLong == nVec, "one row per vector, kept or not")
    out.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) == 0L),
        s"vec ${r.getLong(0)}: keep must mirror n_dups")
    }
  }

  test("d24: the smallest vec_id in every cell is always kept (min-id canonical)") {
    val out = Similarity.semDedup(spark, Sf)
      .select("vec_id", "cell", "keep").collect()
    out.groupBy(_.getInt(1)).foreach { case (cell, vs) =>
      val first = vs.minBy(_.getLong(0))
      assert(first.getBoolean(2), s"cell $cell: min vec_id must survive")
    }
  }

  test("d24: pairwise scoring stays cell-scoped — equi-join, no cartesian blow-up") {
    val plan = Similarity.semDedup(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "corpus x corpus is forbidden")
    // the pairwise stage must be an equi-join keyed on the cell (the
    // only nested-loop joins in the tree are the 16-row centroid
    // broadcasts echoed by the cached members relation)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cell".r
      .findFirstIn(plan).isDefined,
      s"self-join must hash/merge on the cell key:\n$plan")
  }

  test("centroid cache: per-dir entries, cache hits return the same object, bounded LRU") {
    val dirA = Sf                       // sf0.001
    val dirB = "/root/testdata/sf0.01"  // distinct dir, same tables
    val a1 = Similarity.lloydCentroids(spark, dirA)
    val b1 = Similarity.lloydCentroids(spark, dirB)
    assert(Set(dirA, dirB).subsetOf(Similarity.cachedCentroidDirs))
    // second call is a cache hit — identical object, no retrain
    assert(Similarity.lloydCentroids(spark, dirA) eq a1)
    assert(Similarity.lloydCentroids(spark, dirB) eq b1)
    assert(Similarity.cachedCentroidDirs.size <= Similarity.CentroidCacheCap)
  }
}
