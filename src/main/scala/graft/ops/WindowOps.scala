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
}
