package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the target
  * scale factor and prints one JSON line.
  *
  * A full untimed pass at sf0.001 first warms the JVM (JIT, codegen
  * compilation, parquet reader init, streaming state machinery), then
  * a PRESTAGE phase builds every per-(data era, build) staged index
  * for the target dir outside any timed window — the production
  * shape, where the corpus-index job runs once per data era and
  * queries serve warm. Staging seconds are reported separately
  * (`staging` per-tag map + `staging_total_s`), so a regression in
  * index-build cost and a regression in query cost are each visible
  * on their own: round 6 shipped rc=1 because a cold build's staging
  * landed unattributed inside d18/s13's timed windows and breached
  * caps calibrated on warm references.
  *
  * Caches are cleared between timed queries so none borrows
  * another's work; any residual first-touch index build inside a
  * timed window (an index the prestage list missed) is measured via
  * `Staging.drainBuildLog` and reported as that query's `stage_s` —
  * the budget caps compare the query's NON-staging seconds, so the
  * gate grades plan quality, not whether the builder pre-warmed /tmp.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // force FULL plan execution, not `count()`: under a count, Catalyst
    // prunes every column the aggregate doesn't need, so pure-projection
    // queries (the window suite, the JL projection, the scalar-function
    // sweeps) would be timed as bare scans. toRdd materializes every
    // output column of the final plan — what a real consumer would pay.
    def run(df: org.apache.spark.sql.DataFrame): Unit = { df.queryExecution.toRdd.count(): Unit }

    // optional subset (comma-separated name prefixes) for scale-stress
    // runs where the full suite would take hours on amplified fixtures
    val only: String => Boolean = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(pfx) =>
        val ps = pfx.split(",").map(_.trim).filter(_.nonEmpty)
        name => ps.exists(name.startsWith)
      case None => _ => true
    }
    val bench = SparkEntry.queries.filter(kv => only(kv._1))

    val warmDir = "/root/testdata/sf0.001"
    bench.foreach { case (_, fn) =>
      try { run(fn(spark, warmDir)) } catch { case _: Throwable => }
    }
    spark.catalog.clearCache()

    // prestage the target dir's per-era indexes as their own phase —
    // timed, reported per index family, and NEVER inside a query's
    // timed window (amortized corpus-era cost, not query cost)
    val stageT0 = System.nanoTime()
    val staged: Map[String, Double] =
      try graft.ops.Prestage.run(spark, sfDir)
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] prestage FAILED (first-touch queries will pay it): $e")
          graft.ops.Staging.drainBuildLog()
      }
    val prestageSecs = (System.nanoTime() - stageT0) / 1e9
    spark.catalog.clearCache()
    System.gc()

    val results = bench.toSeq.sortBy(_._1).map { case (name, fn) =>
      graft.ops.Staging.drainBuildLog(): Unit
      // guide §1.5: label each query's jobs so an event-log / UI trace
      // maps stages back to the declared query
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      // a failing query must surface as err, not masquerade as a fast time
      val err = try { run(fn(spark, sfDir)); None }
                catch { case e: Throwable => Some(e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(200)) }
      // timing stops HERE: cache clearing and the GC nudge are
      // inter-query hygiene, not part of the measured query
      val wall = (System.nanoTime() - t0) / 1e9
      // any index build that ran inside this window is once-per-era
      // staging the prestage list missed — attribute it separately so
      // the cap grades the query, but keep it visible as stage_s
      val stageS = math.min(wall, graft.ops.Staging.drainBuildLog().values.sum)
      spark.sparkContext.setJobDescription(null)
      spark.catalog.clearCache()
      // nudge the ContextCleaner: loop queries leave orphaned
      // localCheckpoint RDD blocks that only a GC cycle releases, and
      // the resulting memory pressure taxes LATER queries' timings
      // (d05 measured 3.7x slower mid-suite than isolated)
      System.gc()
      (name, wall - stageS, stageS, err)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val stageQ = results.collect { case (k, _, s, _) if s > 0.01 => "\"" + k + "\":" + s }
    val stageQJson = if (stageQ.isEmpty) "" else stageQ.mkString(""","stage_s":{""", ",", "}")
    val stagedJson = (staged.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v } :+ s""""total_s":$prestageSecs""")
      .mkString(""","staging":{""", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.map(_._2).sum
    val wallTotal = total + results.map(_._3).sum + prestageSecs
    results.foreach { case (k, _, _, e) => e.foreach(msg => System.err.println(s"[bench] $k FAILED: $msg")) }
    // `total_s` is REPEATED as the LAST field: the driver keeps only a
    // fixed-size TAIL of stdout, and with 227 queries the per-query map
    // alone overflows it — rounds 7/8 lost the leading "value" field to
    // that truncation ("parsed": null in BENCH_r07/r08). Any tail that
    // carries the line's end now carries the total too.
    val json = s"""{"metric":"total","value":$total,"unit":"sec","wall_s":$wallTotal,"queries":$qs$stageQJson$stagedJson$errJson,"sf":"$sfDir","n_queries":${results.size},"errors_n":${errs.size},"total_s":$total}"""
    // Three-line stdout contract (the driver may keep only a head or a
    // tail window of stdout, and the full record alone overflows both):
    //   1. a SHORT summary line FIRST — survives tail-of-line loss and
    //      is the first parseable {"metric":"total"} a head-scanner hits;
    //   2. the FULL record (per-query map) — the durable copy also lands
    //      in SPARK_GRAFT_BENCH_FILE;
    //   3. a short "total_tail" line LAST — small enough that no tail
    //      window can cut it; the distinct metric name keeps a
    //      first-match parser from confusing it with the full record.
    val shortJson = s""""value":$total,"unit":"sec","wall_s":$wallTotal,"sf":"$sfDir","n_queries":${results.size},"errors_n":${errs.size}"""
    println(s"""{"metric":"total",$shortJson}""")
    println(json)
    println(s"""{"metric":"total_tail",$shortJson}""")
    // the stdout line is one long JSON record and the driver's tail
    // capture has truncated it mid-line before (BENCH_r03 lost its
    // total) — persist the same record to a file as the durable copy
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: $e") }
    spark.stop()

    // committed per-query budget at the gate SF (q16's round-4 creep to
    // 3.8 s was only visible by diffing JSON by hand — this makes drift
    // fail loudly). The cap is sized over the AMBIENT band of the
    // heaviest query, not the median: s13 (a two-trigger streaming
    // fold — per-trigger job latencies are its floor) measures
    // 8.3-9.2 s across same-code runs under the documented ~1.5×
    // same-code spread (SCALING.md; d11 itself swings 5.5-8.3 s), so
    // 8 s would false-fail on noise; 10 s still catches the class the
    // cap exists for (q16's 0.33→3.8 s creep, round-4 d23 at 9.2 s
    // before its staged-index fix was itself borderline — anything
    // new above 10 s is a real scale-killer). Checked AFTER the JSON
    // is printed and persisted so the evidence of a breach survives
    // the failure. Other SFs (the 32×/100× stress dirs) are exempt:
    // their per-query walls are the scaling study's subject, not a
    // regression gate. Caps compare each query's NON-staging seconds
    // (wall minus in-window index builds): once-per-era staging cost
    // is gated separately by the staging-phase cap below.
    val cap = sys.env.getOrElse("SPARK_GRAFT_QUERY_CAP_SECS", "10.0").toDouble
    if (sfDir.contains("sf0.1")) {
      // staging gets its own budget: the whole per-era index build for
      // sf0.1 (measured ~60-120 s cold across rounds 5-6; ambient can
      // ~1.5-3x it behind a cache-evicting oracle run)
      val stagingCap = sys.env.getOrElse("SPARK_GRAFT_STAGING_CAP_SECS", "300.0").toDouble
      val stagingTotal = prestageSecs + results.map(_._3).sum
      // per-query caps from the committed reference run (BENCH_REF.json,
      // refreshed each round): cap = clamp(4 × ref, [2 s, global cap]).
      // 4× sits above the documented same-code ambient band (~1.5×,
      // up to ~3× behind a cache-evicting DuckDB gate — SCALING.md) but
      // catches the class the global cap is blind to: a sub-second
      // query creeping to several seconds (q16's round-4 0.33→3.8 s
      // went unflagged by the 10 s cap). Queries absent from the
      // reference (new this round) get the global cap only.
      val refCaps: Map[String, Double] =
        try {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "BENCH_REF.json"))), "UTF-8")
          val qsPart = txt.drop(txt.indexOf("\"queries\""))
          val qsEnd = qsPart.indexOf("}")
          // cap = max(min(4·ref, global), 1.6·ref): 4× headroom for the
          // sub-second majority, and a query whose reference already
          // sits near the global cap (t17 7.5 s, s13 6.7 s) still gets
          // the documented ~1.5× ambient band above its own reference
          // instead of a cliff at the global value
          "\"([A-Za-z0-9_]+)\":([0-9][0-9.Ee+-]*)".r
            .findAllMatchIn(qsPart.take(if (qsEnd > 0) qsEnd + 1 else qsPart.length))
            .map { m =>
              val ref = m.group(2).toDouble
              // streaming legs (s*) get a higher absolute floor: their
              // cost is per-trigger checkpoint commits, which a host
              // I/O wave inflates far beyond the ~1.5× ambient band of
              // batch plans (round 8: s26 3.9→24.1 s on identical code
              // → rc=1 twice). The memory-backed scratch base removes
              // most of that exposure, so the loose 5 s floor applies
              // only where the reference is itself trigger-bound
              // (> 1 s); a sub-second streaming leg creeping to ~5 s —
              // exactly the q16-creep class — still breaches at 3 s.
              val floor =
                if (m.group(1).startsWith("s")) { if (ref > 1.0) 5.0 else 3.0 }
                else 2.0
              m.group(1) -> math.max(math.min(cap, math.max(floor, 4.0 * ref)), 1.6 * ref)
            }
            .toMap
        } catch { case _: Throwable => Map.empty }
      val over = results.collect {
        case (k, v, _, None) if v > refCaps.getOrElse(k, cap) => (k, v, refCaps.getOrElse(k, cap))
      }
      over.foreach { case (k, v, c) =>
        System.err.println(f"[bench] BUDGET BREACH: $k took $v%.2f s > $c%.1f s cap")
      }
      if (stagingTotal > stagingCap)
        System.err.println(f"[bench] BUDGET BREACH: staging took $stagingTotal%.2f s > $stagingCap%.1f s cap")
      if (over.nonEmpty || stagingTotal > stagingCap) sys.exit(1)
    }
  }
}
