package graft

import org.apache.spark.sql.SparkSession

/** Dev plan auditor + stage timer — not part of the library surface.
  *
  * Usage: `runMain graft.Scratch q13_price ...` prints exchange counts;
  * `SPARK_GRAFT_SCRATCH_TIME=1 runMain graft.Scratch d03_lsh_jaccard_pairs`
  * times each named query end-to-end at the SPARK_GRAFT_SF_DIR scale
  * under the driver's local[32] config.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val timeMode = sys.env.contains("SPARK_GRAFT_SCRATCH_TIME")
    val (threads, parts) = if (timeMode) (32, 32) else (8, 8)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      if (n == "rmstage") {
        // dev helper: drop the per-process staged tables so the next
        // query re-pays staging — isolates staging cost from warmup
        import scala.reflect.io.Directory
        new Directory(new java.io.File("/tmp/graft_stage")).deleteRecursively()
        println("[scratch] rmstage: cleared /tmp/graft_stage")
      } else if (n == "d03stages") {
        llm.Dedup.d03Profile(spark, dir).foreach { case (stage, secs, rows) =>
          println(f"[scratch] d03/$stage: $rows rows in $secs%.2f s")
        }
      } else if (n == "d35stages") {
        llm.Dedup.d35Profile(spark, dir).foreach { case (stage, secs, rows) =>
          println(f"[scratch] d35/$stage: $rows rows in $secs%.2f s")
        }
      } else if (n == "d37stages") {
        llm.Dedup.d37Profile(spark, dir).foreach { case (stage, secs, rows) =>
          println(f"[scratch] d37/$stage: $rows rows in $secs%.2f s")
        }
      } else if (n == "d32stages") {
        llm.Dedup.d32Profile(spark, dir).foreach { case (stage, secs, rows) =>
          println(f"[scratch] d32/$stage: $rows rows in $secs%.2f s")
        }
      } else if (n == "d74stages") {
        llm.Sketch.d74Profile(spark, dir).foreach { case (stage, secs, rows) =>
          println(f"[scratch] d74/$stage: $rows rows in $secs%.2f s")
        }
      } else if (n.startsWith("show:")) {
        // dev helper: dump a query's result rows (stress-fixture reads
        // where the DuckDB gate doesn't apply — e.g. recall at 100×)
        SparkEntry.queries(n.stripPrefix("show:"))(spark, dir).show(200, false)
      } else if (timeMode) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        val t1 = System.nanoTime()
        val cnt = df.count()
        val t2 = System.nanoTime()
        println(f"[scratch] $n: $cnt rows in ${(t2 - t0) / 1e9}%.2f s (construct ${(t1 - t0) / 1e9}%.2f s, count ${(t2 - t1) / 1e9}%.2f s)")
      } else {
        val plan = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(plan).length
        println(s"[scratch] $n: $exchanges Exchange nodes")
        plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Window"))
          .take(12).foreach(l => println("[scratch]   " + l.trim.take(120)))
      }
    }
    spark.stop()
  }
}
