package graft

import org.apache.spark.sql.SparkSession

/** Dev plan auditor — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    args.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(s"[scratch] $n: $exchanges Exchange nodes")
      plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Window"))
        .take(12).foreach(l => println("[scratch]   " + l.trim.take(120)))
    }
    spark.stop()
  }
}
