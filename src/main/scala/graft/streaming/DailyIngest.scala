package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming re-expression of the reference's daily Airflow
  * DAG (SURVEY.md §2.10): extract → 1-day tumbling-window mean → append,
  * Kappa-style — the same aggregation code serves batch backfill and
  * the stream, replacing the DAG's XCom-materialized task boundaries
  * with one incremental plan.
  *
  * The daily slice predicate of the reference
  * (`where date='{ds-1}'`, reference
  * `airflow/dags/insert_conso_jour_region_in_bq.py:54-65`) becomes the
  * event-time window; `Trigger.AvailableNow` is the daily-cron analog
  * (drain all available input, then stop); the 1-day watermark bounds
  * state exactly like the DAG's next-morning cutoff (D3).
  */
object DailyIngest {

  /** The shared (batch = stream) daily aggregation: 1-day tumbling
    * window per event_type, stable mean (see CoreOps.stableAvg).
    */
  private def dailyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg((round(sum("value"), 2) / count("value")).as("daily_mwh"))
      .select(col("event_type"), to_date(col("w.start")).as("d"), col("daily_mwh"))

  /** s01 — run the streaming pipeline to completion over the events
    * table (AvailableNow, in-memory sink) in APPEND mode: each daily
    * window is emitted exactly once when the watermark closes it and
    * its state is dropped — the only state shape that survives an
    * unbounded stream (`complete` mode re-emits and retains ALL
    * windows every trigger). The still-open tail (the last two days —
    * watermark = max(ts) − 1 day hasn't passed them when the drain
    * stops) stays in state, exactly as the oracle models; the next
    * day's run emits it incrementally (s04 proves that from a real
    * checkpoint).
    */
  def streamDaily(spark: SparkSession, dir: String): DataFrame = {
    val ss = StreamEnv.streamSessionFor(spark, dir)
    // the path works as both layouts: a single events.parquet FILE
    // (driver testdata) or a directory of part files (Amplify output)
    val raw = StreamEnv.eventsStream(ss, dir)
    val name = s"stream_daily_${System.nanoTime()}"
    val q = dailyAgg(raw).writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).orderBy("event_type", "d")
  }

  /** s01's oracle: daily means over watermark-CLOSED windows only (a
    * window [d, d+1) is final once max(ts) − 1 day passes its end).
    */
  val oracleStreamDaily: String =
    """SELECT event_type, (ts::TIMESTAMP)::DATE AS d,
      |  round(sum(value), 2) / count(value) AS daily_mwh
      |FROM events
      |GROUP BY 1, 2
      |HAVING d < (SELECT max(ts::TIMESTAMP)::DATE - 1 FROM events)
      |ORDER BY 1, 2""".stripMargin

  /** s04 — the DAG's LOAD leg as a real streaming sink (SURVEY §2
    * S7/D4): the same daily aggregation written in **append** mode to a
    * checkpointed parquet file sink, then read back. Append + watermark
    * is the at-scale shape `complete` mode (s01) can't be: each window
    * is emitted exactly once when the watermark passes it and its state
    * is dropped, and the file sink's transaction log makes the append
    * exactly-once under task retries.
    *
    * Emission boundary: a window `[d, d+1)` is final once watermark =
    * max(ts) − 1 day passes its end, so the last two (still-open) days
    * stay in state when the AvailableNow run drains — the oracle models
    * exactly that (`d < max_date − 1`). The withheld tail is not a
    * fixture artifact: it is WHAT a watermarked append sink means, and
    * the next day's run emits it incrementally from the checkpoint.
    */
  def streamAppendSink(spark: SparkSession, dir: String): DataFrame = {
    val ss = StreamEnv.streamSessionFor(spark, dir)
    val base = graft.ops.Staging.stagePath("stream_sink", dir)
    // fresh demo run: clear sink + checkpoint (a production run would
    // KEEP both — the checkpoint is what makes the next run incremental)
    val fs = org.apache.hadoop.fs.FileSystem.get(ss.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val raw = StreamEnv.eventsStream(ss, dir)
    val q = dailyAgg(raw).writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.read.parquet(s"$base/out").orderBy("event_type", "d")
  }

  val oracleStreamAppendSink: String =
    """SELECT event_type, (ts::TIMESTAMP)::DATE AS d,
      |  round(sum(value), 2) / count(value) AS daily_mwh
      |FROM events
      |GROUP BY 1, 2
      |HAVING d < (SELECT max(ts::TIMESTAMP)::DATE - 1 FROM events)
      |ORDER BY 1, 2""".stripMargin

  /** Batch leg of the Kappa pair — identical transform, batch source
    * (used by the batch/stream-equivalence spec).
    */
  def batchDaily(spark: SparkSession, dir: String): DataFrame =
    dailyAgg(graft.tables.Tables.events(spark, dir))
      .orderBy("event_type", "d")

  /** s03 — sliding event-time windows (7-day window, 1-day slide): the
    * streaming generalization of the API's "trailing 30 days at query
    * time" (SURVEY.md §2.10). Each event lands in 7 windows; day-aligned
    * slide means window starts are exactly date(ts)−k, k∈[0,7) — which
    * is the oracle's spelling. Same code runs under readStream with a
    * watermark.
    */
  def slidingDaily(spark: SparkSession, dir: String): DataFrame =
    graft.tables.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"), col("event_type"))
      .agg((round(sum("value"), 2) / count("value")).as("mean_value"),
           count(lit(1)).as("n"))
      .select(to_date(col("w.start")).as("wstart"), col("event_type"),
              col("mean_value"), col("n"))
      .orderBy("wstart", "event_type")

  val oracleSlidingDaily: String =
    """SELECT (ts::TIMESTAMP)::DATE - k::INT AS wstart, event_type,
      |  round(sum(value), 2) / count(value) AS mean_value,
      |  count(*) AS n
      |FROM events, range(7) t(k)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Backfill (SURVEY.md §2.10 D3 — the reference's
    * `airflow dags backfill -s .. -e ..`): re-run the daily aggregation
    * as a batch over a closed date range. Kappa: same `dailyAgg` code
    * as the stream; pair with Ingest.loadDailyPartitioned so re-running
    * a range replaces those partitions idempotently.
    */
  def backfill(spark: SparkSession, dir: String,
               from: java.sql.Date, to: java.sql.Date): DataFrame =
    dailyAgg(graft.tables.Tables.events(spark, dir))
      .filter(col("d").between(lit(from), lit(to)))
      .orderBy("event_type", "d")

  /** s17 — D3 backfill as a GATED query: replay a closed 10-day range
    * (derived from the data so it exists at every SF: days +3..+12
    * from the first event) through the same daily aggregation the
    * stream runs — the reference's
    * `airflow dags backfill -s .. -e ..` re-expressed Kappa-style.
    * The range bound is the only difference from the live pipeline;
    * pairing with `Ingest.loadDailyPartitioned` makes a re-run
    * replace exactly those partitions. The min-date lookup is one
    * 1-row driver aggregate (the bounded-driver-state convention).
    */
  def backfillRange(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.tables.Tables.events(spark, dir)
    val d0 = ev.agg(min(to_date(col("ts"))).as("d0")).head.getDate(0).toLocalDate
    backfill(spark, dir,
      java.sql.Date.valueOf(d0.plusDays(3)), java.sql.Date.valueOf(d0.plusDays(12)))
  }

  val oracleBackfillRange: String =
    """SELECT event_type, (ts::TIMESTAMP)::DATE AS d,
      |  round(sum(value), 2) / count(value) AS daily_mwh
      |FROM events
      |WHERE (ts::TIMESTAMP)::DATE
      |  BETWEEN (SELECT min(ts::TIMESTAMP)::DATE + 3 FROM events)
      |      AND (SELECT min(ts::TIMESTAMP)::DATE + 12 FROM events)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin
}
