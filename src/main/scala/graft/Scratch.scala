package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler/plan auditor — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)"); r
    }
    spark.range(10).count() // JVM warmup
    val sh = llm.Dedup.corpus(spark, dir)
      .select(col("doc_id"), explode(llm.TextHash.shingles(col("text"))).as("g"))
    time("shingle rows")(sh.count())
    val shHashed = sh.withColumn("base", llm.TextHash.phash(col("g"), 0))
    time("shingle+md5")(shHashed.count())
    val bands = llm.Dedup.minhashBands(spark, dir)
    time("bands")(bands.count())
    time("d03 full")(llm.Dedup.lshJaccardPairs(spark, dir).count())
    time("s01 stream")(streaming.DailyIngest.streamDaily(spark, dir).count())
    time("s01 stream again")(streaming.DailyIngest.streamDaily(spark, dir).count())
    time("q13 price")(ops.Pricing.priceBatch(spark, dir).count())
    spark.stop()
  }
}
