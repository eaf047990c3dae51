package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — each probe row matched to the most recent
  * reference row at-or-before its timestamp, per key. The operator the
  * reference's daily-slice pricing would need the moment tariffs became
  * intraday (reference `api.py:95-132` prices against the latest
  * notice-period row; this is that lookup as a set operation).
  *
  * Spark has no ASOF JOIN; the naive spelling is a range theta-join
  * (`r.ts <= p.ts` → BroadcastNestedLoopJoin, O(P·R) — the d05/d07
  * round-1 failure shape). The scale-safe form used here is
  * union + window: tag both sides, union them, and per key take
  * `last(ref value, ignoreNulls)` over rows-unbounded-preceding in
  * (ts, side, event_id) order. ONE hash shuffle on the key, sort within
  * partitions, zero NLJ — survives any probe/ref cardinality ratio and
  * is skew-bound only by the hottest key, same as any window.
  *
  * Tie discipline (bit-determinism for the oracle): refs sort before
  * probes at equal ts (side 0 < 1) → the match is INCLUSIVE
  * (`ref.ts <= probe.ts`, DuckDB ASOF semantics); among refs sharing
  * (key, ts) the max event_id wins (event_id is the final sort key, and
  * the oracle side dedups with arg_max before its ASOF JOIN).
  */
object AsOfJoin {

  /** Generic as-of: returns `probe.*` plus the as-of-matched `refVals`
    * (null when no ref at-or-before). `ordCol` breaks ref ties
    * deterministically (latest wins).
    */
  def asOf(probe: DataFrame, ref: DataFrame, key: String, ts: String,
           ordCol: String, refVals: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val tagged = probe
      .withColumn("side", lit(1))
      .withColumns(refVals.map(v => v -> lit(null)).toMap)
      .unionByName(ref.select(
        (Seq(col(key), col(ts), lit(0).as("side"), col(ordCol)) ++
          refVals.map(col) ++
          probeCols.filterNot(c => c == key || c == ts || c == ordCol).map(c => lit(null).as(c))): _*))
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("side"), col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = refVals.foldLeft(tagged) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    matched.filter(col("side") === 1).select((probeCols ++ refVals).map(col): _*)
  }

  /** q28 — each purchase event matched to the user's most recent
    * at-or-before click: the "feature as of decision time" join every
    * training pipeline needs (no peeking at future events).
    * `staleness_us` is the exact µs gap — long arithmetic, no float.
    */
  def purchaseAsOfClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val probe = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val ref = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("ord"),
        col("event_id").as("ref_event_id"), col("value").as("ref_value"),
        col("ts").as("ref_ts"))
    asOf(probe.withColumn("ord", col("event_id")), ref,
        key = "user_id", ts = "ts", ordCol = "ord",
        refVals = Seq("ref_event_id", "ref_value", "ref_ts"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("ref_event_id").cast("long").as("ref_event_id"),
        col("ref_value").cast("double").as("ref_value"),
        (unix_micros(col("ts")) - unix_micros(col("ref_ts"))).as("staleness_us"))
      .orderBy("event_id")
  }

  val oraclePurchaseAsOfClick: String =
    """WITH probe AS (
      |  SELECT event_id, ts::TIMESTAMP AS ts, user_id, value
      |  FROM events WHERE event_type = 'purchase'),
      |ref AS (
      |  SELECT user_id, ts::TIMESTAMP AS ref_ts,
      |         max(event_id) AS ref_event_id,
      |         arg_max(value, event_id) AS ref_value
      |  FROM events WHERE event_type = 'click'
      |  GROUP BY user_id, ts::TIMESTAMP)
      |SELECT p.event_id, p.user_id, p.ts, p.value,
      |       r.ref_event_id, r.ref_value,
      |       epoch_us(p.ts) - epoch_us(r.ref_ts) AS staleness_us
      |FROM probe p ASOF LEFT JOIN ref r
      |  ON p.user_id = r.user_id AND p.ts >= r.ref_ts
      |ORDER BY p.event_id""".stripMargin
}
