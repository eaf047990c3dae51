package graft.ops

import graft.expr.BloomExpressions
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sideways information passing: reduce a fact-side scan with a bloom
  * sketch of the OTHER side's join keys before any exchange. This is
  * what Catalyst's own `InjectRuntimeFilter` rule does when its size
  * thresholds fire (creation side ≤ 10 MB, application side ≥ 10 GB —
  * tuned for real clusters, so it never triggers at fixture scale);
  * building the sketch explicitly keeps the technique testable at any
  * SF and works for key sets far beyond the broadcast-join threshold:
  * a 100 M-key dim is ~100 MB broadcast but a ~1 ppm-fpp bloom of it
  * is a few MB.
  */
object RuntimeFilter {

  /** q35 — revenue of lineitems whose order is a finished high-value
    * order. The filtered orders side (~15% of orders) is first swept
    * into a bloom sketch (one distributed pass, `stat.bloomFilter`);
    * the sketch probe then drops non-matching lineitems at the scan,
    * so the join shuffles ~15% of the fact table instead of all of it.
    * The exact equi-join afterwards removes the sketch's false
    * positives — output is bit-identical to the plain join.
    */
  def bloomJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 280000.0)
    // expected-items scales with the observed dim (cheap count on the
    // filtered side); fpp 1% keeps the sketch ~15 KB per 10k keys
    val keys = dim.select(col("o_orderkey"))
    val bloom = keys.stat.bloomFilter("o_orderkey",
      expectedNumItems = math.max(keys.count(), 1L), fpp = 0.01)
    val fact = Tables.lineitem(spark, dir)
      .filter(BloomExpressions.mightContain(bloom, col("l_orderkey")))
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  val oracleBloomJoin: String =
    """SELECT o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderstatus = 'F' AND o_totalprice > 280000.0
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin
}
