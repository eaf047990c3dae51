package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write each declared query's `.explain("formatted")` output
  * to `<outDir>/<query>_<suffix>.txt` — the per-round optimization
  * evidence (plans/r10/<query>_before.txt / _after.txt).
  *
  * Usage: `runMain graft.PlanDump <sfDir> <outDir> <suffix> [prefixes]`
  * e.g.   `runMain graft.PlanDump /root/testdata/sf0.1 plans/r10 before q46,t17`
  *
  * Plans are the PRE-execution formatted physical plans (AQE initial
  * plan) — the deterministic artifact `.explain("formatted")` prints;
  * construction alone is enough, queries are not executed (streaming /
  * localCheckpoint queries still drain eagerly during construction by
  * their own design).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption.getOrElse("plans/r10")
    val suffix = args.drop(2).headOption.getOrElse("before")
    val only: String => Boolean = args.drop(3).headOption match {
      case Some(pfx) =>
        val ps = pfx.split(",").map(_.trim).filter(_.nonEmpty)
        name => ps.exists(name.startsWith)
      case None => _ => true
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    SparkEntry.queries.toSeq.sortBy(_._1).filter(kv => only(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
