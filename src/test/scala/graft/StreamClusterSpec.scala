package graft

import graft.llm.Dedup
import graft.streaming.StreamCluster
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** s13 streaming cluster maintenance: kappa equivalence with the
  * one-shot d32 fold, and the versioned-state layout a retry would
  * resume from.
  */
class StreamClusterSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}

  test("streamed two-batch fold equals the one-shot d32 fold (kappa)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows(StreamCluster.clusterMaintain(spark, Sf)) ==
      rows(Dedup.incrementalCc(spark, Sf)))
  }

  test("label state is versioned per trigger with a per-batch appendix") {
    // the staged layout from the run above (same process + dir)
    val base = graft.ops.Staging.stagePath("stream_cluster", Sf)
    (0 until StreamCluster.NumBatches).foreach { k =>
      assert(new java.io.File(s"$base/labels/v$k/_SUCCESS").exists, s"labels v$k")
      assert(new java.io.File(s"$base/app/batch_$k/_SUCCESS").exists, s"appendix $k")
    }
    // v0 covers exactly corpus ∪ batch-0: the fold is per-trigger, not
    // a deferred end-of-stream recompute
    val v0 = spark.read.parquet(s"$base/labels/v0")
    val nCorpus = Dedup.corpus(spark, Sf).count()
    val b0 = Dedup.gen2Batch(spark, Sf)
      .filter(pmod(col("doc_id"), lit(StreamCluster.NumBatches)) === 0).count()
    assert(v0.count() == nCorpus + b0)
    assert(v0.select("doc_id").distinct().count() == nCorpus + b0)
  }
}
