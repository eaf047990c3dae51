package graft

import graft.ops.Warehouse
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the warehouse-maintenance family (q47 SCD2
  * dimension history, q48 incremental aggregate maintenance).
  */
class WarehouseSpec extends AnyFunSuite {
  import SparkTestBase.{Sf, spark}

  test("q47: validity intervals chain gaplessly and exactly one version is current") {
    val rows = Warehouse.scd2Dim(spark, Sf)
      .select("c_custkey", "version", "valid_from", "valid_to", "is_current")
      .collect()
      .groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (ck, vs) =>
      val sorted = vs.sortBy(_.getInt(1))
      // versions are 1..n with no holes
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length), s"customer $ck")
      // each version closes exactly where the next one opens
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev.getDate(3) == next.getDate(2),
            s"customer $ck: v${prev.getInt(1)} valid_to != v${next.getInt(1)} valid_from")
        case _ => ()
      }
      // exactly the last version is current (open-ended)
      assert(sorted.count(_.getBoolean(4)) == 1, s"customer $ck current count")
      assert(sorted.last.getBoolean(4) && sorted.last.isNullAt(3), s"customer $ck tail")
    }
    // the change feed is real: customers with orders have > 1 version
    val multi = rows.count(_._2.length > 1)
    assert(multi > 0, "no customer produced a second SCD2 version")
  }

  test("q47: every customer appears; customers without orders keep one open base version") {
    val nCust = Tables.customer(spark, Sf).count()
    val byCust = Warehouse.scd2Dim(spark, Sf).groupBy("c_custkey")
      .agg(count(lit(1)).as("n"), max("version").as("mx"))
    assert(byCust.count() == nCust)
    val singles = byCust.filter(col("n") === 1).count()
    val orderless = Tables.customer(spark, Sf)
      .join(Tables.orders(spark, Sf),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(singles == orderless,
      "single-version customers must be exactly the orderless ones")
  }

  test("q48: merged partial states are bit-equal to a direct full aggregate") {
    val maintained = Warehouse.incrementalAgg(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val full = Tables.events(spark, Sf)
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
      .select(col("event_type"), col("n_rows"), col("sum_cents"),
        (col("sum_cents").cast("double") / lit(100.0) / col("n_rows")).as("mean_value"))
      .orderBy("event_type")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(maintained.toSeq == full.toSeq)
  }

  test("q48: both legs contribute (the delta window is non-empty and not everything)") {
    val ev = Tables.events(spark, Sf).select(to_date(col("ts")).as("d"))
    val mx = ev.agg(max("d")).collect()(0).getDate(0).toLocalDate
    val cutoff = java.sql.Date.valueOf(mx.minusDays(Warehouse.DeltaDays))
    val delta = ev.filter(col("d") > cutoff).count()
    val stored = ev.filter(col("d") <= cutoff).count()
    assert(delta > 0 && stored > 0,
      s"fixture must exercise both legs (stored=$stored delta=$delta)")
  }

  test("q52: merged delta-join legs are bit-equal to the full join") {
    val maintained = Warehouse.deltaJoin(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val full = Tables.orders(spark, Sf)
      .join(Tables.lineitem(spark, Sf)
          .select(col("l_orderkey"),
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
      .select(col("o_orderpriority"), col("n_rows"), col("sum_cents"),
        (col("sum_cents").cast("double") / lit(100.0)).as("revenue"))
      .orderBy("o_orderpriority")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(maintained.nonEmpty && maintained.toSeq == full.toSeq)
  }

  test("q52: all four legs carry rows (both sides' deltas are real)") {
    import graft.tables.Tables
    val o = Tables.orders(spark, Sf).select(col("o_orderkey"), col("o_orderdate"))
    // the production cutoff: date_sub truncates the ntz timestamp to a
    // date, so collect it as the DATE it is
    val cut = o.agg(date_sub(max("o_orderdate"), Warehouse.DeltaJoinDays))
      .collect()(0).getDate(0)
    val l = Tables.lineitem(spark, Sf).select(col("l_orderkey"), col("l_shipdate"))
    def cnt(oNew: Boolean, lNew: Boolean): Long =
      o.filter(if (oNew) col("o_orderdate") > cut else col("o_orderdate") <= cut)
        .join(l.filter(if (lNew) col("l_shipdate") > cut else col("l_shipdate") <= cut),
          col("o_orderkey") === col("l_orderkey")).count()
    val legs = Seq(cnt(false, false), cnt(false, true), cnt(true, false), cnt(true, true))
    // Δo⋈Δl is empty at sf0.001 (no last-week order also ships within
    // the window there; it is populated at sf0.01/0.1, which the
    // oracle gate covers) — require the other three, and that the
    // legs partition the full join
    assert(legs.take(3).forall(_ > 0), s"degenerate fixture split: $legs")
    val full = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
    assert(legs.sum == full, s"legs ${legs.sum} != full join $full")
  }
}
