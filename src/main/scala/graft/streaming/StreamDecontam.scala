package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** s16 — STREAMING benchmark decontamination: d18's scan run as the
  * continuous admission check a training-data pipeline actually
  * deploys (every incoming training doc is probed against the eval
  * benchmarks BEFORE it can enter the corpus; Brown et al. GPT-3
  * appendix C shape). The benchmark knowledge is two era-keyed staged
  * artifacts, built once per corpus era:
  *
  *  - `dc_hot`  — the n-gram hashes with corpus df > [[graft.llm.Curation.MaxNgramDf]]
  *    (the boilerplate filter, INVERTED: the allowed set is corpus-
  *    sized and could never broadcast, the hot set is tiny by
  *    construction — df > 100 n-grams are rare);
  *  - `dc_eval` — (h, eval_id) n-gram postings of the eval split
  *    (benchmark-sized: at production scale benchmarks are fixed and
  *    small, here the d13 test split).
  *
  * Per micro-batch everything is map-side: the batch's n-grams
  * anti-join the BROADCAST hot set, the eval postings are semi-pruned
  * by a broadcast of the batch's surviving hash set (the s13
  * convention — the static side never shuffles), and the pruned
  * postings broadcast back onto the batch for the pair count. The
  * only shuffle is the batch-sized pair aggregate. Verdicts land in
  * idempotent per-batch partitions (the s04/s11/s12 exactly-once
  * convention).
  *
  * Kappa equivalence, oracle-enforced: every train doc is in exactly
  * one micro-batch, so the union of per-batch pair counts equals
  * d18's one-shot scan — s16 reuses d18's oracle verbatim. A dropped
  * batch, a doubled batch, or a stale-era index breaks the hash.
  *
  * Scale note: if a batch ever shares so many n-grams with the
  * benchmarks that the pruned postings outgrow a broadcast, the same
  * plan degrades gracefully to a keyed shuffle of batch survivors
  * only — the corpus-sized side still never moves.
  */
object StreamDecontam {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  val NumBatches = 4

  def decontamIngest(spark: SparkSession, dir: String): DataFrame = {
    import graft.llm.{Curation, Dedup, Sampling}
    val ss = StreamEnv.streamSession(spark)

    // ---- era-keyed benchmark index (dc_eval published LAST: its
    // _SUCCESS implies the pair) ----
    val hotPath = graft.ops.Staging.indexPath("dc_hot", dir)
    val evalPath = graft.ops.Staging.indexPath("dc_eval", dir)
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(evalPath, "_SUCCESS"))) {
      val ex = Dedup.corpus(spark, dir)
        .select(col("doc_id"), Sampling.splitCol(col("doc_id")).as("split"),
          explode(Curation.ngramHashes(col("text"))).as("h"))
        .persist()
      graft.ops.Staging.publishIndex(spark, "dc_hot", dir)(p =>
        ex.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") > Curation.MaxNgramDf)
          .select("h").write.mode("overwrite").parquet(p))
      graft.ops.Staging.publishIndex(spark, "dc_eval", dir)(p =>
        ex.filter(col("split") === "test")
          .select(col("h"), col("doc_id").as("eval_id"))
          .write.mode("overwrite").parquet(p))
      ex.unpersist()
    }

    // ---- the train feed as NumBatches ordered files (s12 convention) ----
    val base = graft.ops.Staging.stagePath("stream_decontam", dir)
    fs.delete(new Path(base), true)
    val feed = Dedup.corpus(spark, dir)
      .filter(Sampling.splitCol(col("doc_id")) === "train")
    fs.mkdirs(new Path(s"$base/in"))
    (0 until NumBatches).foreach { k =>
      val tmp = s"$base/tmp/b$k"
      feed.filter(pmod(col("doc_id"), lit(NumBatches)) === k)
        .coalesce(1).write.parquet(tmp)
      val part = fs.globStatus(new Path(s"$tmp/part-*.parquet"))(0).getPath
      val dest = new Path(s"$base/in/batch$k.parquet")
      fs.rename(part, dest)
      fs.setTimes(dest, 1700000000000L + k * 60000L, -1)
    }

    val verdictsDir = s"$base/verdicts"
    val q = ss.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$base/in")
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s2 = batch.sparkSession
        val bh = batch
          .select(col("doc_id").as("train_id"),
            explode(Curation.ngramHashes(col("text"))).as("h"))
          .join(broadcast(s2.read.parquet(hotPath)), Seq("h"), "left_anti")
          .persist() // feeds the key set and the pair join
        val keys = bh.select("h").distinct()
        val evalPruned = s2.read.parquet(evalPath)
          .join(broadcast(keys), Seq("h"))
        bh.join(broadcast(evalPruned), Seq("h"))
          .groupBy("train_id", "eval_id")
          .agg(count(lit(1)).as("n_shared"))
          .write.mode("overwrite").parquet(s"$verdictsDir/batch_$id")
        bh.unpersist()
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.read.parquet(s"$verdictsDir/batch_*").orderBy("train_id", "eval_id")
  }

  /** Micro-batching and the staged index are invisible to the result:
    * d18's oracle verbatim.
    */
  val oracleDecontamIngest: String = graft.llm.Curation.oracleDecontaminate
}
