package graft

import org.apache.spark.sql.SparkSession

/** Dev runner behind SCALING.md's per-trigger p95 table: runs the
  * selected streaming queries with [[graft.streaming.TriggerLog]]
  * enabled and prints one JSON line per query with its individual
  * `triggerExecution` durations, p95, and max — the check that
  * per-trigger cost stays batch-sized as the fixture scales (the
  * full-suite stress totals only bound the SUM of triggers).
  *
  * Usage: `runMain graft.TriggerStats <sfDir> [prefixes]`, e.g.
  * `runMain graft.TriggerStats /root/testdata/sf0.1 s13,s16,s18,s19`.
  * Queries run twice: an untimed warm pass (JIT, stream machinery,
  * staged-index adoption) then the recorded pass.
  */
object TriggerStats {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TriggerStats <sfDir> [prefixes]")
    val sfDir = args(0)
    val prefixes = if (args.length > 1) args(1).split(",").toSeq else Seq("s")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries.filter(kv => prefixes.exists(kv._1.startsWith))
      .toSeq.sortBy(_._1)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      fn(spark, sfDir).queryExecution.toRdd.count(): Unit
    }
    // warm pass, unrecorded
    qs.foreach { case (_, fn) => try run(fn) catch { case _: Throwable => } }
    spark.catalog.clearCache()

    graft.streaming.TriggerLog.enabled = true
    qs.foreach { case (name, fn) =>
      graft.streaming.TriggerLog.setContext(name)
      graft.streaming.TriggerLog.drain(): Unit
      val t0 = System.nanoTime()
      val err = try { run(fn); None }
                catch { case e: Throwable => Some(e.toString.take(120)) }
      val total = (System.nanoTime() - t0) / 1e9
      // listener delivery is async; progress events for a terminated
      // AvailableNow stream land within ms — give the bus a beat
      Thread.sleep(1500)
      val recs = graft.streaming.TriggerLog.drain().filter(_._1 == name)
      val trig = recs.map(_._3.getOrElse("triggerExecution", 0L)).sorted
      val p95 =
        if (trig.isEmpty) 0L
        else trig(math.min(trig.length - 1, math.ceil(trig.length * 0.95).toInt - 1))
      val trigJson = trig.mkString("[", ",", "]")
      // per-phase sums across triggers: where an inflated total SITS
      // (addBatch = engine work; latestOffset/getBatch = source
      // listing; walCommit/commitOffsets = checkpoint fsyncs)
      val phaseSums = recs.flatMap(_._3.toSeq)
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
        .toSeq.sortBy(-_._2)
      val phaseJson = phaseSums
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val errJson = err.map(e => s""","err":"${e.replaceAll("[\"\\\\\n\r\t]", " ")}"""").getOrElse("")
      println(
        s"""{"query":"$name","total_s":$total,"n_triggers":${trig.length},""" +
        s""""trigger_ms":$trigJson,"p95_ms":$p95,"max_ms":${trig.lastOption.getOrElse(0L)},""" +
        s""""phase_sums_ms":$phaseJson$errJson}""")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
