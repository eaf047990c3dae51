package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join — probe rows matched to every interval
  * containing their timestamp. Spark has no native range join: the
  * naive `ts BETWEEN start AND end` theta-join plans as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * broadcasts) — O(P·I) comparisons, the same failure shape the as-of
  * join avoids ([[AsOfJoin]]).
  *
  * The scale-safe form is GRAIN BUCKETING: explode each interval to
  * the coarse time grains it covers (here calendar hours — a 2-hour
  * window covers ≤ 3), map each probe row to its single grain, then
  * EQUI-join on the grain and post-filter the exact bounds. The join
  * is hash-partitionable, the fan-out is bounded by
  * ⌈interval/grain⌉ + 1, and each (interval, probe) pair meets in
  * exactly one grain, so no dedup is needed. This is how Databricks'
  * range-join optimization and Flink's interval join are built; at
  * 100 TB both sides shuffle once on the grain key and skew is bounded
  * by the hottest hour.
  */
object RangeJoin {

  val TopWindows = 50
  val WindowHours = 2

  /** q37 — clicks inside the 2-hour windows opened by the top-50
    * purchases by value: per campaign window, the click count and
    * cent-snapped click-value total. Deterministic top-k (value DESC,
    * event_id ASC tiebreak); inner semantics (zero-click windows drop).
    */
  def clicksInPurchaseWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("event_id", "ts", "event_type", "value")
    val campaigns = ev.filter(col("event_type") === "purchase")
      .orderBy(desc("value"), col("event_id"))
      .limit(TopWindows)
      .select(col("event_id").as("campaign_id"), col("ts").as("w_start"),
        (col("ts") + expr(s"INTERVAL $WindowHours HOURS")).as("w_end"))
    val grains = campaigns.select(col("campaign_id"), col("w_start"), col("w_end"),
      explode(sequence(date_trunc("hour", col("w_start")),
        date_trunc("hour", col("w_end")), expr("INTERVAL 1 HOUR"))).as("grain"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("value"),
        date_trunc("hour", col("ts")).as("grain"))
    clicks.join(grains, Seq("grain"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("campaign_id")
      .agg(count(lit(1)).as("n_clicks"),
        round(sum("value"), 2).as("sum_value")) // value sits on the cent grid — snap collapses sum-order noise
      .orderBy("campaign_id")
  }

  /** The oracle states the SEMANTICS as a plain theta-join (DuckDB's
    * optimizer runs it as an IEJoin); the Spark side demonstrates the
    * distributed grain-bucketed plan for the same relation.
    */
  val oracleClicksInPurchaseWindows: String =
    s"""WITH ev AS (
       |  SELECT event_id, ts::TIMESTAMP AS ts, event_type, value FROM events),
       |camp AS (
       |  SELECT event_id AS campaign_id, ts AS w_start,
       |         ts + INTERVAL $WindowHours HOUR AS w_end
       |  FROM ev WHERE event_type = 'purchase'
       |  ORDER BY value DESC, event_id LIMIT $TopWindows)
       |SELECT campaign_id, count(*) AS n_clicks, round(sum(value), 2) AS sum_value
       |FROM ev e JOIN camp c ON e.ts >= c.w_start AND e.ts < c.w_end
       |WHERE e.event_type = 'click'
       |GROUP BY campaign_id
       |ORDER BY campaign_id""".stripMargin
}
