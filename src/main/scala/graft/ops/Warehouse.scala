package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: the table-evolution patterns a
  * production warehouse runs around the reference's nightly loads
  * (the reference's airflow DAGs truncate-and-reload; these are the
  * incremental shapes that replace truncate-and-reload at scale).
  *
  *  - q47 SCD2 dimension history — the MERGE-style "close the old
  *    version, open a new one" upsert, expressed set-oriented: base
  *    rows union change rows, one window chains validity intervals.
  *  - q48 incremental aggregate maintenance — a stored partial-state
  *    table merged with a new partition's partial states; algebraic
  *    states (sum, count) make the merge exact, so the maintained
  *    aggregate is bit-equal to a full recompute (which is exactly
  *    what the DuckDB oracle computes).
  */
object Warehouse {

  /** q47 — SCD2 (slowly-changing-dimension type 2) history for the
    * customer dimension. The change feed is derived deterministically
    * from `orders`: one balance snapshot per (customer, order year) —
    * `acctbal` becomes the customer's yearly order total, effective at
    * their last order date that year. Versions chain with ONE window:
    * `valid_to = lead(valid_from)`, `is_current = valid_to IS NULL`.
    *
    * Scale shape: the change feed aggregates on the dimension key, the
    * attribute lookup is one equi-join on that key, and the version
    * chain is one window shuffle on the same key — three stages, all
    * partitioned by `c_custkey`, which AQE plans as a single exchange
    * reused across stages. No driver-side state; a 100 TB dimension
    * (conformed-dim scale) streams through hash partitions. The `src`
    * ordering column (0 = base row, order year = change row) makes the
    * version sequence deterministic even when a change lands on the
    * base row's `valid_from` date.
    */
  def scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val base = dim.select(
      col("c_custkey"), col("c_mktsegment"), col("c_acctbal").as("acctbal"),
      to_date(lit("1992-01-01")).as("valid_from"), lit(0).as("src"))
    val changes = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("c_custkey"),
        year(col("o_orderdate")).as("src"))
      .agg(to_date(max(col("o_orderdate"))).as("valid_from"),
        round(sum(col("o_totalprice")), 2).as("acctbal"))
      .join(dim.select("c_custkey", "c_mktsegment"), Seq("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("acctbal"),
        col("valid_from"), col("src"))
    val w = Window.partitionBy("c_custkey").orderBy("src")
    base.unionByName(changes)
      .select(col("c_custkey"),
        row_number().over(w).as("version"),
        col("c_mktsegment"), col("acctbal"), col("valid_from"),
        lead(col("valid_from"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("c_custkey", "version")
  }

  val oracleScd2Dim: String =
    """WITH base AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal AS acctbal,
      |         DATE '1992-01-01' AS valid_from, 0 AS src
      |  FROM customer),
      |chg AS (
      |  SELECT o_custkey AS c_custkey, CAST(year(o_orderdate) AS INT) AS src,
      |         (max(o_orderdate))::DATE AS valid_from,
      |         round(sum(o_totalprice), 2) AS acctbal
      |  FROM orders GROUP BY 1, 2),
      |u AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT c.c_custkey, d.c_mktsegment, c.acctbal, c.valid_from, c.src
      |  FROM chg c JOIN customer d USING (c_custkey))
      |SELECT c_custkey,
      |  CAST(row_number() OVER w AS INT) AS version,
      |  c_mktsegment, acctbal, valid_from,
      |  lead(valid_from) OVER w AS valid_to,
      |  (lead(valid_from) OVER w IS NULL) AS is_current
      |FROM u
      |WINDOW w AS (PARTITION BY c_custkey ORDER BY src)
      |ORDER BY c_custkey, version""".stripMargin

  /** How many trailing days count as the "new partition" in q48. */
  val DeltaDays = 7

  /** q48 — incremental aggregate maintenance: the per-event-type
    * running aggregate is maintained as algebraic PARTIAL STATE
    * (sum, count) — the stored state covers everything older than the
    * last [[DeltaDays]] days, the delta leg aggregates only the new
    * days, and the merge is a re-aggregate of the two state rows per
    * key. Because the summed measure is snapped to exact integer
    * cents first (`floor(value·100 + 0.5)` — the fixture values sit on
    * the cent grid), the partial sums are order-independent BIGINTs
    * and the maintained result is bit-equal to the full recompute the
    * oracle runs; a raw double sum would drift with partition order
    * and make incremental maintenance unverifiable.
    *
    * Scale shape: at 100 TB the old leg is a stored k-row state table
    * (k = |group keys|) — this query recomputes it only because the
    * fixture has no persisted state; the per-refresh cost is the
    * DELTA scan + a k-row merge, independent of history size. Both
    * legs are map-side partial aggregates into a k-row shuffle; the
    * date split reuses the q04 max-anchor scalar (no wall-clock
    * freshness wart).
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val anchor = ev.agg(date_sub(max(col("d")), DeltaDays).as("cutoff"))
    val base = ev.crossJoin(broadcast(anchor))
    def partial(leg: DataFrame): DataFrame =
      leg.groupBy("event_type")
        .agg(sum("cents").as("sum_cents"), count(lit(1)).as("n"))
    // null-safe split: a null-dated row must land in the STORED leg,
    // not vanish from both (`d <= cutoff` and `d > cutoff` are both
    // null-false on a null date, which would silently drop the row
    // while the oracle's full recompute keeps it)
    val isNew = coalesce(col("d") > col("cutoff"), lit(false))
    val stored = partial(base.filter(!isNew))
    val delta = partial(base.filter(isNew))
    stored.unionByName(delta)
      .groupBy("event_type")
      .agg(sum("sum_cents").as("sum_cents"), sum("n").as("n_rows"))
      .select(col("event_type"), col("n_rows"), col("sum_cents"),
        (col("sum_cents").cast("double") / lit(100.0) / col("n_rows")).as("mean_value"))
      .orderBy("event_type")
  }

  /** The oracle is the FULL recompute — the whole point of q48 is that
    * the incrementally-maintained state merges to exactly this.
    */
  val oracleIncrementalAgg: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events)
      |SELECT event_type, count(*) AS n_rows, sum(cents)::BIGINT AS sum_cents,
      |  CAST(sum(cents) AS DOUBLE) / 100.0 / count(*) AS mean_value
      |FROM ev
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** How many trailing days of each table count as "new" in q52. */
  val DeltaJoinDays = 7

  /** q52 — incremental JOIN maintenance (the delta-join sibling of
    * q48's incremental aggregate): the per-priority joined revenue is
    * maintained under inserts to BOTH join sides via the classic IVM
    * decomposition — `(A∪ΔA) ⋈ (B∪ΔB)` splits into the four disjoint
    * legs `old⋈old ∪ old⋈ΔB ∪ ΔA⋈old ∪ ΔA⋈ΔB`, each partially
    * aggregated, then merged. Every joined pair lands in exactly one
    * leg (the split is a partition of each input by its own date), so
    * the merged state is bit-equal to the oracle's full-join
    * recompute; the measure is snapped to integer cents first so the
    * partial sums are order-independent BIGINTs (the q48 argument).
    *
    * Scale shape: at 100 TB the `old⋈old` leg IS the stored
    * materialized state (k rows, k = |priorities|) — recomputed here
    * only because the fixture has no persisted state. A refresh pays
    * the three delta legs, and each has a SMALL side: Δ is
    * days-bounded, so `old⋈ΔB` / `ΔA⋈old` scan the big table once
    * with a BROADCAST hash join against the delta (plan-asserted) and
    * `ΔA⋈ΔB` is tiny⋈tiny. Refresh cost is O(scan + |Δ|), never a
    * re-shuffle of history against history.
    */
  def deltaJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"))
    val anchor = o.agg(date_sub(max(col("o_orderdate")), DeltaJoinDays).as("cutoff"))
    val ob = o.crossJoin(broadcast(anchor))
    val lb = l.crossJoin(broadcast(anchor))
    // null-safe splits (the q48 argument): a null-dated row belongs to
    // the stored leg, not to neither
    val oIsNew = coalesce(col("o_orderdate") > col("cutoff"), lit(false))
    val lIsNew = coalesce(col("l_shipdate") > col("cutoff"), lit(false))
    val oOld = ob.filter(!oIsNew).drop("cutoff")
    val oNew = ob.filter(oIsNew).drop("cutoff")
    val lOld = lb.filter(!lIsNew).drop("cutoff")
    val lNew = lb.filter(lIsNew).drop("cutoff")
    def leg(os: DataFrame, ls: DataFrame): DataFrame =
      os.join(ls, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("cents").as("sum_cents"), count(lit(1)).as("n"))
    leg(oOld, lOld)                       // the stored-state leg
      .unionByName(leg(oOld, broadcast(lNew)))  // history ⋈ Δlineitem
      .unionByName(leg(broadcast(oNew), lOld))  // Δorders ⋈ history
      .unionByName(leg(broadcast(oNew), lNew))  // Δ ⋈ Δ
      .groupBy("o_orderpriority")
      .agg(sum("sum_cents").as("sum_cents"), sum("n").as("n_rows"))
      .select(col("o_orderpriority"), col("n_rows"), col("sum_cents"),
        (col("sum_cents").cast("double") / lit(100.0)).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Full-join recompute — the maintained delta-leg state must merge
    * to exactly this.
    */
  val oracleDeltaJoin: String =
    """WITH li AS (
      |  SELECT l_orderkey, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM lineitem)
      |SELECT o_orderpriority, count(*) AS n_rows, sum(cents)::BIGINT AS sum_cents,
      |  CAST(sum(cents) AS DOUBLE) / 100.0 AS revenue
      |FROM orders JOIN li ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q65 — constraint verification suite (the dbt-test / Deequ
    * verification shape): named constraints — primary-key uniqueness,
    * two referential-integrity checks, a bounds check, an
    * accepted-values check, and a cross-column date-order check —
    * evaluated to one (constraint, violations, passed) verdict row
    * each. q46 profiles (metrics); this JUDGES (pass/fail gates a
    * load).
    *
    * Scale shape: six constraints, TWO passes. All orders-side checks
    * fuse into one scan with a broadcast customer-key join (pk
    * uniqueness, fk orders→customer, accepted status); all
    * lineitem-side checks fuse into one scan with the orders join (fk
    * lineitem→orders, ship-before-order consistency, quantity
    * bounds) — the Deequ trick of grouping checks by their required
    * data pass instead of running k separate jobs. The fact table is
    * read once per pass, never per constraint; the fk joins are
    * key-only (dims pre-projected to their key column).
    */
  def constraintSuite(spark: SparkSession, dir: String): DataFrame = {
    val custKeys = Tables.customer(spark, dir).select("c_custkey").distinct()
    val ordersPass = Tables.orders(spark, dir)
      .join(broadcast(custKeys), col("o_custkey") === col("c_custkey"), "left")
      .agg(
        (count(lit(1)) - count_distinct(col("o_orderkey"))).as("pk_orders_unique"),
        count(when(col("c_custkey").isNull, lit(1))).as("fk_orders_customer"),
        count(when(!col("o_orderstatus").isin("O", "F", "P"), lit(1)))
          .as("accepted_order_status"))
    // NOT a forced broadcast: orders is fact-sized — at sf0.1 Catalyst
    // auto-broadcasts the 2-column projection, at 100 TB this must be
    // free to become a shuffled join (AQE decides from runtime stats)
    val orderSide = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val lineitemPass = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_shipdate")
      .join(orderSide, col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        count(when(col("o_orderkey").isNull, lit(1))).as("fk_lineitem_orders"),
        count(when(col("o_orderkey").isNotNull &&
          col("l_shipdate") < col("o_orderdate"), lit(1))).as("date_ship_after_order"),
        count(when(!col("l_quantity").between(1.0, 50.0), lit(1)))
          .as("bounds_quantity"))
    def stacked(wide: DataFrame): DataFrame = {
      val cols = wide.columns
      wide.select(explode(array(cols.map(c =>
        struct(lit(c).as("constraint"), col(c).as("violations"))): _*)).as("v"))
        .select("v.*")
    }
    stacked(ordersPass).unionByName(stacked(lineitemPass))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("constraint")
  }

  /** q66 — CDC apply: collapse an insert/update/delete operation log
    * into final table state — the MERGE-shaped compaction every
    * log-structured table format (Delta/Hudi/Iceberg copy-on-write)
    * runs, and the missing third sibling of q47 (versioned history)
    * and q52 (changed-partition join). The op log derives
    * deterministically from `orders` so real CDC structure exists:
    * every key INSERTs (seq 1), every 3rd key UPDATEs (seq 2), every
    * 5th key DELETEs (seq 3), and every 15th key RE-INSERTs after its
    * delete (seq 4) — so the apply must get delete-then-reinsert
    * right, not just last-write-wins on live rows.
    *
    * Scale shape: ONE hash aggregate on the key — `max(struct(seq,
    * op, price))` picks the latest op per key (seq is unique per key,
    * so later struct fields never decide), with map-side partial
    * aggregation shrinking the log before the exchange. No window, no
    * sort: a window formulation would range-partition and sort the
    * full 100 TB log; the agg form ships only per-partition partials.
    * Deletes filter AFTER the argmax — a delete must win over the ops
    * it shadows, then vanish. Update/reinsert prices are pure IEEE
    * double arithmetic (`+ 10.0`, `/ 2`), bit-identical in any
    * engine — no rounding call, no parity risk.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey"), col("o_totalprice").as("p"))
    val log = o.select(col("k"), col("o_custkey"), lit(1).as("seq"), lit("I").as("op"),
        col("p").as("price"))
      .unionByName(o.where(col("k") % 3 === 0)
        .select(col("k"), col("o_custkey"), lit(2).as("seq"), lit("U").as("op"),
          (col("p") + lit(10.0)).as("price")))
      .unionByName(o.where(col("k") % 5 === 0)
        .select(col("k"), col("o_custkey"), lit(3).as("seq"), lit("D").as("op"),
          lit(null).cast("double").as("price")))
      .unionByName(o.where(col("k") % 15 === 0)
        .select(col("k"), col("o_custkey"), lit(4).as("seq"), lit("I").as("op"),
          (col("p") / 2).as("price")))
    log.groupBy(col("k").as("o_orderkey"))
      .agg(
        max(struct(col("seq"), col("op"), col("price"))).as("last"),
        max(col("o_custkey")).as("o_custkey"), // constant per key
        count(lit(1)).as("n_ops"))
      .where(col("last.op") =!= "D")
      .select(col("o_orderkey"), col("o_custkey"),
        col("last.price").as("final_price"),
        col("last.seq").as("last_seq"), col("n_ops"))
      .orderBy("o_orderkey")
  }

  /** q66's DuckDB replay: same op log, latest-op pick via a
    * `row_number` window (seq unique per key ⇒ same row the engine's
    * argmax picks), deletes dropped after the pick.
    */
  val oracleCdcApply: String =
    """WITH log AS (
      |  SELECT o_orderkey AS k, o_custkey, 1 AS seq, 'I' AS op, o_totalprice AS price
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, 2, 'U', o_totalprice + 10.0
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, 3, 'D', NULL
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, 4, 'I', o_totalprice / 2
      |  FROM orders WHERE o_orderkey % 15 = 0),
      |latest AS (
      |  SELECT k, o_custkey, seq, op, price,
      |         row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn,
      |         count(*) OVER (PARTITION BY k) AS n_ops
      |  FROM log)
      |SELECT k AS o_orderkey, o_custkey, price AS final_price,
      |       seq AS last_seq, n_ops
      |FROM latest
      |WHERE rn = 1 AND op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  val oracleConstraintSuite: String =
    """WITH o AS (
      |  SELECT count(*) - count(DISTINCT o_orderkey) AS pk_orders_unique,
      |         count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS fk_orders_customer,
      |         count(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END)
      |           AS accepted_order_status
      |  FROM orders
      |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |    ON o_custkey = c.c_custkey),
      |l AS (
      |  SELECT count(CASE WHEN os.o_orderkey IS NULL THEN 1 END) AS fk_lineitem_orders,
      |         count(CASE WHEN os.o_orderkey IS NOT NULL
      |                     AND l_shipdate < os.o_orderdate THEN 1 END)
      |           AS date_ship_after_order,
      |         count(CASE WHEN l_quantity NOT BETWEEN 1.0 AND 50.0 THEN 1 END)
      |           AS bounds_quantity
      |  FROM lineitem
      |  LEFT JOIN (SELECT o_orderkey, o_orderdate FROM orders) os
      |    ON l_orderkey = os.o_orderkey),
      |stacked AS (
      |  SELECT 'pk_orders_unique' AS constraint, pk_orders_unique AS violations FROM o
      |  UNION ALL SELECT 'fk_orders_customer', fk_orders_customer FROM o
      |  UNION ALL SELECT 'accepted_order_status', accepted_order_status FROM o
      |  UNION ALL SELECT 'fk_lineitem_orders', fk_lineitem_orders FROM l
      |  UNION ALL SELECT 'date_ship_after_order', date_ship_after_order FROM l
      |  UNION ALL SELECT 'bounds_quantity', bounds_quantity FROM l)
      |SELECT "constraint", violations::BIGINT AS violations,
      |       violations = 0 AS passed
      |FROM stacked ORDER BY "constraint"""".stripMargin
}
