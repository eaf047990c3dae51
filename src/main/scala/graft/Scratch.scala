package graft

import org.apache.spark.sql.SparkSession

/** Dev plan auditor — prints formatted physical plans for key queries
  * so scan pruning / pushdown / broadcast / codegen spans can be
  * inspected. Not part of the library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_pruned_scan", "q11_join_revenue", "q13_price", "d06_cosine_topk")
    names.foreach { n =>
      println(s"######## $n ########")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
