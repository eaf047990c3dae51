package graft.streaming

import graft.llm.{Dedup, TextHash}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** s13 — STREAMING near-dup cluster maintenance: d32's incremental
  * connected-components fold run as the continuous pipeline it is
  * meant for. The converged corpus labeling ([[Dedup.clusterLabels]])
  * is the seed state; each micro-batch of incoming documents finds its
  * near-dup edges against the corpus index AND every previously
  * ingested batch (the batch's shingles/bands are APPENDED to a
  * growing side index after its fold, so later batches dedup against
  * earlier ones — the cross-batch dependency that makes this a real
  * stream, not N independent jobs), folds them in with
  * [[Dedup.incrementalComponents]] at batch cost, and writes the new
  * labeling version keyed by batch id.
  *
  * Exactly-once: every per-batch artifact (labels version, appended
  * shingles/bands) is written `overwrite` under the BATCH id, and each
  * fold reads only its predecessor version — a retried batch
  * deterministically rewrites its own outputs (the s04/s11/s12
  * convention).
  *
  * Kappa equivalence, oracle-enforced: the final labeling version must
  * hash-equal d32's one-shot fold AND the from-scratch closure over
  * the union graph — s13 reuses d32's oracle verbatim. A dropped
  * batch, a fold against the wrong label version, or a missing
  * cross-batch edge breaks the hash.
  *
  * Scale shape (100 TB): per trigger the work is batch-sized — the
  * corpus index and label state are read-only/versioned parquet, the
  * contracted component loop runs on the batch's edge graph, and the
  * only corpus-wide operation is the broadcast relabel map-side join
  * inside the fold. No state store: the labeling IS the state,
  * versioned in the warehouse.
  */
object StreamCluster {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Two triggers keep the per-batch fold overhead inside the bench
    * budget while still exercising the cross-batch edge path (batch 1
    * must see batch 0's docs through the appended index).
    */
  val NumBatches = 2

  /** Publish the bucketed gen-2 feed once per (data era, build) —
    * shared by [[clusterMaintain]] and the bench prestage phase.
    */
  private[graft] def stageFeed(spark: SparkSession, dir: String): String = synchronized {
    val feedIdx = graft.ops.Staging.indexPath("s13_feed", dir)
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(feedIdx, "_SUCCESS"))) {
      graft.ops.Staging.publishIndex(spark, "s13_feed", dir) { p =>
        Dedup.gen2Batch(spark, dir)
          .withColumn("bucket", pmod(col("doc_id"), lit(NumBatches)))
          .repartition(col("bucket"))
          .write.partitionBy("bucket").parquet(p)
      }
    }
    feedIdx
  }

  def clusterMaintain(spark: SparkSession, dir: String): DataFrame = {
    val ss = StreamEnv.streamSession(spark)
    // seed state + static corpus index, staged once per (data era, build), shared across processes
    val prior0 = Dedup.clusterLabels(spark, dir)
    Dedup.ccIndex(spark, dir)
    val ccShPath = graft.ops.Staging.indexPath("cc_sh", dir)
    val ccBandsPath = graft.ops.Staging.indexPath("cc_bands", dir)

    val base = graft.ops.Staging.stagePath("stream_cluster", dir)
    val seedPath = graft.ops.Staging.indexPath("cc_labels", dir) // prior0's parquet
    val fs = FileSystem.get(ss.sparkContext.hadoopConfiguration)
    fs.delete(new Path(base), true)

    var tSetup = System.nanoTime()
    // the gen-2 feed is era/build-deterministic: stage its NumBatches
    // bucket files ONCE per (data era, build) like every other index,
    // then per run only COPY them into the stream's input dir (the
    // input dir and checkpoint stay per-run; the 3 s derive+write of
    // the feed does not repeat)
    val feedIdx = stageFeed(spark, dir)
    fs.mkdirs(new Path(s"$base/in"))
    (0 until NumBatches).foreach { k =>
      val part = fs.globStatus(new Path(s"$feedIdx/bucket=$k/part-*.parquet"))(0).getPath
      val dest = new Path(s"$base/in/batch$k.parquet")
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dest, false,
        ss.sparkContext.hadoopConfiguration)
      fs.setTimes(dest, 1700000000000L + k * 60000L, -1)
    }

    val dbg = sys.env.contains("SPARK_GRAFT_S13_DEBUG")
    def tick(name: String, t0: Long): Long = {
      if (dbg) System.err.println(f"[s13] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.nanoTime()
    }

    def foldBatch(s2: SparkSession, batch: DataFrame, id: Long): Unit = {
      // lazy persist, not an eager checkpoint: the lineage is shallow
      // (one scan + md5 projection) and the cache fills on the fold's
      // first action instead of paying a dedicated materialization job
      // explicit width (the d61/s26 rule): the session's shuffle width
      // is the state-partition knob (4 at gate SF), far too narrow for
      // the fold's dense shingle work on a 32-core host
      val bSh = batch.repartition(s2.sparkContext.defaultParallelism, col("doc_id"))
        // sorted to match the staged corpus arrays — batchEdges runs
        // the native sorted-intersect verify on every leg
        .select(col("doc_id"), sort_array(TextHash.hashedShingles(col("text"), 0)).as("hs"))
        .persist()
      // existing side = corpus index ∪ every EARLIER batch's appendix
      // (this batch's own appendix is written after the fold; on a
      // retry it may already exist, but self-rows only add (x, x)
      // candidate pairs, which the contraction drops)
      val appendices = (0L until id).map(k => s2.read.parquet(s"$base/app/batch_$k"))
      val exSh = (Seq(s2.read.parquet(ccShPath)) ++
        appendices.map(_.select("doc_id", "hs"))).reduce(_ unionByName _)
      val exBands = (Seq(s2.read.parquet(ccBandsPath)) ++
        appendices.map(Dedup.explodeBands)).reduce(_ unionByName _)
      val edges = Dedup.batchEdges(bSh, Dedup.bandsOf(bSh), exSh, exBands)
      val prev =
        if (id == 0) s2.read.parquet(seedPath)
        else s2.read.parquet(s"$base/labels/v${id - 1}")
      var t = tick(s"fold$id/plan", System.nanoTime())
      val folded = Dedup.incrementalComponents(prev, batch.select("doc_id"), edges)
      t = tick(s"fold$id/components", t)
      folded.toDF("doc_id", "label")
        .write.mode("overwrite").parquet(s"$base/labels/v$id")
      t = tick(s"fold$id/labelsWrite", t)
      Dedup.bandedShingles(bSh)
        .write.mode("overwrite").parquet(s"$base/app/batch_$id")
      tick(s"fold$id/appendixWrite", t)
      ()
    }

    tSetup = tick("stageFeed", tSetup)
    val q = ss.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$base/in")
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s2 = batch.sparkSession
        // micro-batch shuffle width: session width on the fold's
        // batch-scale joins is task-launch overhead, but the verify
        // legs still want real parallelism (the shingle arrays are the
        // heavy payload) — 8 measured best among {2, 8, 32}; AQE stays
        // on for the fold's one-shot joins (only the CC loop inside
        // scopes it off, where per-round re-planning repays nothing).
        // foreachBatch bodies run sequentially per query, so scoping
        // the session conf here cannot race another trigger.
        val sp0 = s2.conf.get("spark.sql.shuffle.partitions")
        val aqe0 = s2.conf.get("spark.sql.adaptive.enabled", "true")
        s2.conf.set("spark.sql.shuffle.partitions", "8")
        s2.conf.set("spark.sql.adaptive.enabled", "false")
        try foldBatch(s2, batch, id)
        finally {
          s2.conf.set("spark.sql.shuffle.partitions", sp0)
          s2.conf.set("spark.sql.adaptive.enabled", aqe0)
        }
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    tick("stream", tSetup)
    ss.read.parquet(s"$base/labels/v${NumBatches - 1}")
      .select(col("doc_id"), col("label"),
        when(col("doc_id") >= Dedup.G2CopyIdOffset, lit("batch"))
          .otherwise(lit("corpus")).as("src"))
      .orderBy("doc_id")
  }

  /** The micro-batching is invisible by construction: same oracle as
    * the one-shot d32 fold (from-scratch closure over the union).
    */
  val oracleClusterMaintain: String = Dedup.oracleIncrementalCc
}
