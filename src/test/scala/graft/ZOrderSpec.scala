package graft

import graft.ops.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q54 contracts: the z-order layout changes I/O, never results — and
  * the I/O claim is measured, not asserted by vibes: per-file min/max
  * boxes (exactly what parquet footer stats give a scan) must overlap a
  * single-dimension probe on EITHER dimension for at most half the
  * files, while the naive date-sorted layout cannot prune a customer
  * probe at all.
  */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestBase.{Sf, spark}

  /** Files of `rel` whose [min,max] box on `dim` overlaps [lo, hi] —
    * the footer-stats skipping decision replayed from the data.
    */
  private def overlapping(rel: DataFrame, dim: String, lo: Long, hi: Long): (Long, Long) = {
    val stats = rel
      .groupBy(input_file_name().as("f"))
      .agg(min(col(dim)).as("mn"), max(col(dim)).as("mx"))
      .persist()
    val total = stats.count()
    val hit = stats.where(col("mn") <= hi && col("mx") >= lo).count()
    stats.unpersist()
    (hit, total)
  }

  test("q54: box probe through the z-layout equals the direct filter") {
    val viaLayout = ZOrder.boxProbe(spark, Sf).collect().toSeq
    val direct = graft.tables.Tables.orders(spark, Sf)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("order_day"), col("o_totalprice"))
      .where(col("o_custkey").between(40, 90)
        && col("order_day") >= lit(java.sql.Date.valueOf("1997-01-01"))
        && col("order_day") < lit(java.sql.Date.valueOf("1999-01-01")))
      .orderBy("o_orderkey")
      .collect().toSeq
    assert(viaLayout.nonEmpty && viaLayout == direct,
      "layout must be I/O-only: identical rows to the unstaged filter")
  }

  test("q54: z-layout bounds BOTH dimensions; date sort cannot prune custkey") {
    val z = ZOrder.stageZOrdered(spark, Sf)
      .withColumn("day_nr",
        datediff(col("order_day"), lit(java.sql.Date.valueOf(ZOrder.DayEpoch))))
    val byDate = ZOrder.stageDateSorted(spark, Sf)
      .withColumn("day_nr",
        datediff(col("order_day"), lit(java.sql.Date.valueOf(ZOrder.DayEpoch))))

    // bottom-quartile probes in each dimension (custkeys 0..~149 at this
    // SF; days span 1995-01-01..2001-08-01 ≈ 2400)
    val ckHi = 35L    // ≈ bottom quartile of custkey
    val dayHi = 360L  // first year ≈ bottom 15% of days

    val (zCk, zTot) = overlapping(z, "o_custkey", 0, ckHi)
    val (zDay, _) = overlapping(z, "day_nr", 0, dayHi)
    assert(zTot == ZOrder.ZFiles.toLong, s"expected ${ZOrder.ZFiles} files, got $zTot")
    assert(zCk <= zTot / 2, s"custkey probe should skip ≥ half the z files: $zCk/$zTot")
    assert(zDay <= zTot / 2, s"date probe should skip ≥ half the z files: $zDay/$zTot")

    val (dCk, dTot) = overlapping(byDate, "o_custkey", 0, ckHi)
    val (dDay, _) = overlapping(byDate, "day_nr", 0, dayHi)
    assert(dCk == dTot,
      s"date-sorted layout has no custkey locality — every file overlaps: $dCk/$dTot")
    assert(dDay <= dTot / 2, "date-sorted layout does prune its own sort dimension")
  }

  test("q55: metadata aggregate reads ONLY the stats index, and partials re-merge exactly") {
    val agg = ZOrder.metadataAgg(spark, Sf)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("orders_stats_index"),
      "the aggregate must source from the stats index table")
    assert(!plan.contains("orders_zorder"),
      "a metadata-only query must never scan the data files")
    val r = agg.head()
    val direct = graft.tables.Tables.orders(spark, Sf)
      .agg(count(lit(1)), min("o_totalprice"), max("o_totalprice"),
        (sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).cast("double") / 100.0))
      .head()
    assert(r.getLong(0) == direct.getLong(0))
    assert(r.getDouble(1) == direct.getDouble(1) && r.getDouble(2) == direct.getDouble(2))
    assert(r.getDouble(3) == direct.getDouble(3),
      "cents partials must re-aggregate to the exact full-scan total")
  }

  test("q54: morton key interleaves bits exactly") {
    // 0b1111 × 0b0000 → odd bit positions only; symmetric for b
    val got = spark.range(1)
      .select(
        ZOrder.morton(lit(15L), lit(0L)).as("a_only"),
        ZOrder.morton(lit(0L), lit(15L)).as("b_only"),
        ZOrder.morton(lit(65535L), lit(65535L)).as("full"))
      .head()
    assert(got.getLong(0) == 0xAAL, "a occupies odd bit positions")
    assert(got.getLong(1) == 0x55L, "b occupies even bit positions")
    assert(got.getLong(2) == 0xFFFFFFFFL, "16+16 bits fill 32")
  }
}
