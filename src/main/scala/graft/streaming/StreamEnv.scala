package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-query session derivation for the streaming legs.
  *
  * Streaming queries here want a handful of shuffle partitions (each
  * stateful partition carries a state store — at fixture scale 32
  * stores are pure overhead) and the nanos-as-long parquet read for
  * the raw `events` schema. Setting those on the CALLER's session and
  * restoring in a `finally` is racy the moment two queries share one
  * session; a child session (`newSession` — same SparkContext and
  * cached data, own SQLConf and catalog temp views) scopes both knobs
  * to the one query with nothing to restore.
  */
object StreamEnv {

  def streamSession(spark: SparkSession, parts: Int = 4): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", parts.toString)
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // opt-in per-trigger cost recording (see TriggerLog): listeners are
    // per-session, so the hook lives where the sessions are minted
    if (TriggerLog.enabled) ss.streams.addListener(TriggerLog.listener)
    ss
  }

  /** Scale-adaptive shuffle/state partition count for a stream fed by
    * `<dir>/events.parquet`: one partition per ~4 MiB of compressed
    * source parquet (≈ 16-32 MiB of in-memory rows — a sane stateful-
    * shuffle slice), floored at 4 (the fixture-scale value, so gate-SF
    * plans and state layouts are unchanged) and capped at the session's
    * core count. A FIXED 4 was the round-9 shape: correct at sf0.1
    * (2 MiB source) but it serialized the 100× fixture's 90 MiB of
    * events into 4 state stores — s14's session merge measured 20 s per
    * trigger there. Stateful results are partitioning-independent (all
    * folds here are per-key and commutative or explicitly sorted), so
    * only wall time changes; the oracle gate checks that per SF.
    */
  def sizedParts(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val target = (bytes / (4L << 20)).toInt
    math.max(4, math.min(spark.sparkContext.defaultParallelism, target))
  }

  /** [[streamSession]] with the partition count derived from the data
    * era's events table ([[sizedParts]]) — the events-fed stateful legs
    * use this so state parallelism follows input size.
    */
  def streamSessionFor(spark: SparkSession, dir: String): SparkSession =
    streamSession(spark, sizedParts(spark, dir))

  /** The physical schema of `<dir>/events.parquet` as the batch reader
    * sees it under this session's confs. `readStream` requires a
    * declared schema; deriving it from the footer (instead of
    * hard-coding `ts: Long`) keeps the stream sources working across
    * BOTH driver testdata generations (raw-nanos INT64 vs
    * timestamp[us] — see graft.tables.Tables.events).
    */
  def eventsPhysicalSchema(ss: SparkSession,
                           dir: String): org.apache.spark.sql.types.StructType =
    ss.read.parquet(s"$dir/events.parquet").schema

  /** File-stream source over `<dir>/events.parquet` with `ts`
    * normalized to canonical microsecond TimestampType, accepting BOTH
    * table layouts: a single parquet file of that name (the driver
    * testdata — the source's basePath must be a directory, so stream
    * the parent glob-filtered to the file) or a directory of part
    * files (any `df.write.parquet` output, e.g. the Amplify stress
    * fixture — streamed directly).
    */
  def eventsStream(ss: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = p.getFileSystem(ss.sparkContext.hadoopConfiguration)
    val reader = ss.readStream.schema(eventsPhysicalSchema(ss, dir))
    val raw =
      if (fs.getFileStatus(p).isDirectory) reader.parquet(p.toString)
      else reader.option("pathGlobFilter", "events.parquet").parquet(dir)
    graft.tables.Tables.normalizeTs(raw)
  }
}
