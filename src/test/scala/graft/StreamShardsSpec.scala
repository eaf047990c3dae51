package graft

import org.scalatest.funsuite.AnyFunSuite

class StreamShardsSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}

  test("s18 streamed shard assignment equals the one-shot d44 export (Kappa), with a carried total per batch") {
    val streamed = graft.streaming.StreamShards.tokenShardIngest(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = graft.llm.Sampling.tokenShards(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq, "streamed fold diverged from the batch prefix sum")
    // the per-batch carry files exist and are monotonically increasing
    // (the resumability contract: total_k is the corpus token mass
    // after batch k)
    val base = graft.ops.Staging.stagePath("stream_shards", Sf)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val totals = (0 until graft.streaming.StreamShards.NumBatches).map { k =>
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$base/state", s"total_$k"))
      try new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
        .readLine().trim.toLong
      finally in.close()
    }
    assert(totals == totals.sorted, s"carried totals not monotone: $totals")
    assert(totals.last == batch.map(_._2).sum, "final carry != corpus token mass")
  }

  test("s19 streamed CMS report equals the one-shot d22 build (the monoid fold)") {
    val streamed = graft.streaming.StreamSketch.cmsIngest(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = graft.llm.Sketch.countMinTopK(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq, "streamed grid fold diverged from the one-shot sketch")
    // the state generations exist per batch (resumability contract)
    val base = graft.ops.Staging.stagePath("stream_sketch", Sf)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    (0 until graft.streaming.StreamSketch.NumBatches).foreach { k =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/grid_$k")), s"missing grid_$k")
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/wc_$k")), s"missing wc_$k")
    }
  }
}
