package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / the 100 TB checklist):
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting is the fallback when one build-side key dominates so hard
  * that even split partitions overwhelm a task.
  */
object Skew {

  /** Salted equi-join: the large (skewed) side spreads each hot key
    * over `salts` shuffle partitions via a deterministic per-row salt;
    * the small side replicates each key `salts` times. Result is
    * row-identical to `large.join(small, key)` — only the shuffle
    * distribution changes.
    *
    * The salt derives from `saltSource` (any column, ideally unique per
    * row) — deterministic, so retries/speculative tasks stay stable.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** q27 — the salted join as an oracle-checked query: lineitem
    * (skewed fact: return-flag keys are few and huge) joins the 3-row
    * flag dimension salted 8 ways, then aggregates. The oracle is the
    * PLAIN join — salting must be result-invariant; only the shuffle
    * key distribution (8 salt sub-partitions per hot key) differs.
    * The small side is shuffled (not broadcast) deliberately: salting
    * only matters on a shuffle path, so the demo disables broadcast
    * via hint.
    */
  def saltedFlagRevenue(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.tables.Tables
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_returnflag", "l_extendedprice")
    val flags = li.select(col("l_returnflag")).distinct()
      .withColumn("flag_label", concat(lit("flag_"), col("l_returnflag")))
      .hint("shuffle_hash") // keep the join on the shuffle path salting targets
    saltedJoin(li, flags, "l_returnflag", col("l_orderkey"), salts = 8)
      .groupBy("flag_label")
      .agg(count(lit(1)).as("n_items"),
           round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("flag_label")
  }

  val oracleSaltedFlagRevenue: String =
    """WITH flags AS (
      |  SELECT DISTINCT l_returnflag, 'flag_' || l_returnflag AS flag_label
      |  FROM lineitem)
      |SELECT f.flag_label, count(*) AS n_items,
      |  round(sum(l.l_extendedprice), 2) AS revenue
      |FROM lineitem l JOIN flags f ON l.l_returnflag = f.l_returnflag
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
}
