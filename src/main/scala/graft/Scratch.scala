package graft

import org.apache.spark.sql.SparkSession

/** Dev probe — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // end-user path: extensions via config, not test shims
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // cosine_similarity resolvable in SQL through the injected function
    graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001").createOrReplaceTempView("e")
    val r = spark.sql("SELECT cosine_similarity(embedding, embedding) AS s FROM e LIMIT 3").collect()
    println(s"[scratch] injected cosine ok: ${r.map(_.getDouble(0)).mkString(",")}")
    // stacked clamps collapse in the optimized plan
    val df = Seq(1.0, 9.0).toDF("x")
      .select(least(lit(5.0), least(lit(3.0), greatest(lit(2.0), greatest(lit(1.0), col("x"))))).as("c"))
    val opt = df.queryExecution.optimizedPlan.toString
    val n = "least\\(".r.findAllIn(opt.toLowerCase).length
    println(s"[scratch] optimized plan least() count: $n (expect 1)")
    println(s"[scratch] clamp values: ${df.as[Double].collect().sorted.mkString(",")} (expect 2.0,3.0)")
    spark.stop()
  }
}
