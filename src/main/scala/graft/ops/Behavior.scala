package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-behavior analytics over the `events` stream table: funnel
  * conversion and cohort retention — the two aggregate shapes every
  * product-analytics warehouse runs at fact-table scale.
  *
  * Scale shape: both are one hash-aggregate keyed on user_id (the
  * natural shuffle key of a user-event fact table) followed by a tiny
  * second aggregate; no windows over the full fact, no self-joins —
  * the per-user reduction happens map-side first, so the exchange
  * moves one row per user, not per event.
  */
object Behavior {

  /** q32 — ordered funnel: view → click → purchase. A user converts
    * through stage k if their earliest stage-k event is strictly after
    * their earliest stage-(k−1) event. One groupBy(user) computing the
    * three first-touch timestamps, then a global conversion rollup.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val firstOf = (t: String) => min(when(col("event_type") === t, col("ts")))
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(firstOf("view").as("t_view"),
           firstOf("click").as("t_click"),
           firstOf("purchase").as("t_purchase"))
      .select(
        when(col("t_view").isNotNull, 1).otherwise(0).as("viewed"),
        when(col("t_view").isNotNull && col("t_click") > col("t_view"), 1)
          .otherwise(0).as("clicked_after"),
        when(col("t_view").isNotNull && col("t_click") > col("t_view")
          && col("t_purchase") > col("t_click"), 1).otherwise(0).as("purchased_after"))
      .agg(count(lit(1)).as("n_users"),
           sum("viewed").cast("long").as("n_viewed"),
           sum("clicked_after").cast("long").as("n_clicked_after_view"),
           sum("purchased_after").cast("long").as("n_purchased_after_click"))
  }

  val oracleFunnel: String =
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts::TIMESTAMP END) AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN ts::TIMESTAMP END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts::TIMESTAMP END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT count(*) AS n_users,
      |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
      |  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clicked_after_view,
      |  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after_click
      |FROM f""".stripMargin

  /** q33 — cohort retention: users grouped by first-active week,
    * counted in each later week they return. Two aggregates — per
    * (user, week) activity, then a broadcast-joined cohort label —
    * and the (cohort_week, active_week) matrix rollup.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val wk = ((dayofmonth(col("ts")) - 1) / 7).cast("int")
    val activity = Tables.events(spark, dir)
      .select(col("user_id"), wk.as("week"))
      .distinct()
    val cohort = activity.groupBy("user_id").agg(min("week").as("cohort_week"))
    activity.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), col("week").as("active_week"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "active_week")
  }

  val oracleRetention: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id, ((day(ts::TIMESTAMP) - 1) // 7)::INT AS week
      |  FROM events),
      |c AS (SELECT user_id, min(week) AS cohort_week FROM a GROUP BY user_id)
      |SELECT c.cohort_week, a.week AS active_week, count(*) AS n_active
      |FROM a JOIN c USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin
}
