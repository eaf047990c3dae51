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
    ss
  }

  /** File-stream source over `<dir>/events.parquet`, accepting BOTH
    * table layouts: a single parquet file of that name (the driver
    * testdata — the source's basePath must be a directory, so stream
    * the parent glob-filtered to the file) or a directory of part
    * files (any `df.write.parquet` output, e.g. the Amplify stress
    * fixture — streamed directly).
    */
  def eventsRawStream(ss: SparkSession,
                      dir: String,
                      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = p.getFileSystem(ss.sparkContext.hadoopConfiguration)
    val reader = ss.readStream.schema(schema)
    if (fs.getFileStatus(p).isDirectory) reader.parquet(p.toString)
    else reader.option("pathGlobFilter", "events.parquet").parquet(dir)
  }
}
