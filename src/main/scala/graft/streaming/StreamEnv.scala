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
}
