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
}
