package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // events at t0, t0+8h exactly, t0+15h59m: does the 8h session window
    // split at exactly last+gap (right-open) as the oracle assumes?
    val df = Seq((1L, ts("2024-01-01 00:00:00")),
                 (1L, ts("2024-01-01 08:00:00")),
                 (1L, ts("2024-01-01 15:59:00"))).toDF("user_id", "ts")
    val out = df.groupBy(session_window(col("ts"), "8 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("string"), col("n")).collect()
    println(s"[scratch] sessions: ${out.mkString(" | ")} (expect split: 1 event then 2)")
    spark.stop()
  }
}
