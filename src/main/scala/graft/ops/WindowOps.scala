package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators — the two computations that are
  * *semantically* windows in the reference (SURVEY.md §2.5): the
  * year-over-year ratio α (reference `api.py:86-90`) and the trailing
  * mean that feeds M (reference `api.py:47-61`), both rewritten
  * set-oriented so one pass computes every group instead of one query
  * per request.
  */
object WindowOps {

  /** q05 — year-over-year ratio + clamp (α, reference `api.py:89-90`;
    * documented semantics α = conso(n+1)/conso(n) from the notice, not
    * the reference's label-indexing bug — SURVEY.md §2.5).
    *
    * One shuffle on the group key computes α for *all*
    * (priority, year) pairs; the reference re-queried per request.
    * α is clamped to [1, 1.3] (reference `api.py:90`); the final-year
    * rows (no successor) keep a NULL α via the explicit CASE — both
    * engines' greatest() skips NULLs, so the CASE pins the semantics.
    */
  def yoyAlpha(spark: SparkSession, dir: String): DataFrame = {
    val yearly = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
      .agg(CoreOps.stableAvg(col("o_totalprice")).as("conso"))
    val w = Window.partitionBy("o_orderpriority").orderBy("yr")
    yearly
      .withColumn("alpha_raw", lead("conso", 1).over(w) / col("conso"))
      .select(
        col("o_orderpriority"), col("yr"),
        col("conso"),
        when(col("alpha_raw").isNotNull,
          round(least(lit(1.3), greatest(lit(1.0), col("alpha_raw"))), 6)).as("alpha"))
      .orderBy("o_orderpriority", "yr")
  }

  /** q06 — trailing 7-day windowed mean over daily totals
    * (`rangeBetween` frame ≡ the reference's 30-day slice generalized to
    * every day at once). Ordering key is days-since-epoch so the frame
    * is a true range (calendar gaps widen the frame correctly, unlike
    * rowsBetween). Two shuffles total: daily pre-aggregation, then the
    * window partition — the pre-aggregation shrinks the window input to
    * one row per (type, day) regardless of raw volume.
    */
  def rollingMean(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(round(sum("value"), 2).as("v"))
    val w = Window.partitionBy("event_type").orderBy(unix_date(col("d")))
      .rangeBetween(-6, 0)
    daily
      .withColumn("avg7", round(sum("v").over(w), 2) / count("v").over(w))
      .select(col("event_type"), col("d"), col("v"), col("avg7"))
      .orderBy("event_type", "d")
  }

  /** q38 — the rest of the analytic-window surface in one query: lag,
    * first/last value over an explicit unbounded frame, percent_rank
    * and cume_dist, per customer in order-date order. ONE window
    * shuffle on o_custkey serves all six functions (they share the
    * partition spec; Spark evaluates them in a single Window operator).
    * percent_rank/cume_dist are int/int divisions — bit-deterministic
    * across engines, shipped unrounded.
    */
  def windowSuite(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        lag("o_totalprice", 1).over(ord).as("prev_price"),
        first("o_totalprice").over(full).as("first_price"),
        last("o_totalprice").over(full).as("last_price"),
        percent_rank().over(ord).as("pr"),
        cume_dist().over(ord).as("cd"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val oracleWindowSuite: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  first_value(o_totalprice) OVER wf AS first_price,
      |  last_value(o_totalprice) OVER wf AS last_price,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW
      |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** q51 — time-series gap-fill (last observation carried forward):
    * densify each user's sparse daily purchase series so every calendar
    * day between their first and last purchase carries the most recent
    * observed value, with `is_gap` marking the filled rows.
    *
    * Written as an INTERVAL EXPLODE, not the textbook dense-calendar
    * left join + `last(..., ignoreNulls)` window: each observed day
    * looks at its successor (`lead` over the user window) and emits
    * `sequence(day, next_day - 1)` — the carried rows are generated
    * from the run length directly. At 100 TB the difference is one
    * user-keyed window and zero joins versus building a calendar
    * spine, shuffling it to align with the observations, and dragging
    * null-heavy rows through an unbounded-preceding window. The fill
    * value rides along verbatim (no arithmetic), so the oracle is
    * hash-exact on doubles.
    *
    * The per-day representative is the LAST event of the day —
    * `max_by(value, (ts, event_id))`, a partial-aggregable map-side
    * combine (ties beyond the µs timestamp break on event_id).
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(expr("max_by(value, struct(ts, event_id))").as("value"))
    val w = Window.partitionBy("user_id").orderBy("day")
    daily
      .withColumn("next_day", lead("day", 1).over(w))
      .select(col("user_id"), col("day").as("obs_day"), col("value"),
        explode(sequence(col("day"),
          coalesce(date_sub(col("next_day"), 1), col("day")))).as("day"))
      .select(col("user_id"), col("day"), col("value").as("filled"),
        (col("day") =!= col("obs_day")).as("is_gap"))
      .orderBy("user_id", "day")
  }

  /** The oracle picks the same per-day representative via row_number
    * (DuckDB's `arg_max` tuple-ordering support is version-dependent;
    * the rn formulation is unambiguous), then replays the interval
    * explode with `generate_series`. `ts::TIMESTAMP` truncates the
    * parquet ns timestamps to µs exactly like the Spark reader.
    */
  val oracleGapFill: String =
    """WITH e AS (
      |  SELECT user_id, (ts::TIMESTAMP)::DATE AS day, ts::TIMESTAMP AS ts,
      |         event_id, value
      |  FROM events WHERE event_type = 'purchase'),
      |d AS (
      |  SELECT user_id, day, value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id, day
      |                 ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM e) WHERE rn = 1),
      |n AS (
      |  SELECT user_id, day AS obs_day, value,
      |         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
      |  FROM d),
      |g AS (
      |  SELECT user_id, obs_day, value,
      |         unnest(generate_series(obs_day::TIMESTAMP,
      |           coalesce(next_day::TIMESTAMP - INTERVAL 1 DAY,
      |                    obs_day::TIMESTAMP),
      |           INTERVAL 1 DAY))::DATE AS day
      |  FROM n)
      |SELECT user_id, day, value AS filled, day != obs_day AS is_gap
      |FROM g
      |ORDER BY user_id, day""".stripMargin
}
