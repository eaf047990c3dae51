package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q54 — multi-dimensional z-order (Morton) clustering layout.
  *
  * The reference stores its warehouse tables in BigQuery, whose
  * clustered tables co-locate rows on up to four columns so a filter on
  * ANY prefix dimension prunes blocks (reference `README.md` warehouse
  * notes; the daily tables are date-keyed). A single-column sort gives
  * parquet tight min/max row-group stats on ONE dimension only — a
  * 100 TB fact laid out by date answers date probes with file skipping
  * but must scan everything for a customer probe. Interleaving the
  * bits of both dimensions into one Morton key and range-partitioning
  * on it bounds EVERY file in BOTH dimensions at once (each file is a
  * contiguous z-range = a small set of axis-aligned boxes), so
  * min/max file skipping works for either predicate — the same layout
  * trick Delta's `OPTIMIZE ZORDER BY` and Hudi clustering use.
  *
  * Everything here is map-side expression work (the Morton key is ~60
  * codegen'd bit ops) plus the ONE range-partitioning shuffle any
  * re-layout must pay; bounds come from a 1-row aggregate broadcast
  * back (the q52 scalar-anchor pattern). At 100 TB you'd run it per
  * ingest partition (layout is embarrassingly parallel across date
  * partitions) with more output files — pruning precision grows with
  * file count while this demo pins 16 for a deterministic spec.
  */
object ZOrder {

  private[graft] val Bits = 16
  private[graft] val ZFiles = 16
  /** Day-number epoch for the date dimension (testdata min o_orderdate). */
  private[graft] val DayEpoch = "1995-01-01"

  /** Interleave the low [[Bits]] bits of `a` (odd positions) and `b`
    * (even positions) into one long Morton key. Pure bit arithmetic —
    * whole-stage-codegen-friendly, no UDF.
    */
  private[graft] def morton(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Min-max scale `v` into the full [0, 2^Bits) domain so the
    * interleave puts real entropy in the high bits (raw values that
    * use only low bits would make the Morton prefix degenerate).
    */
  private[graft] def scale16(v: Column, lo: Column, hi: Column): Column =
    when(hi > lo,
      ((v - lo).cast("double") * lit((1 << Bits) - 1).cast("double")
        / (hi - lo).cast("double")).cast("long"))
      .otherwise(lit(0L))

  /** Orders projected to the layout dimensions (custkey × order day). */
  private def dims(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("order_day"), col("o_totalprice"))
      .withColumn("day_nr",
        datediff(col("order_day"), lit(java.sql.Date.valueOf(DayEpoch))))

  /** Stage orders z-ordered on (o_custkey, order_day) — once per
    * (data era, build), `_SUCCESS`-guarded and shared across processes
    * like the other staged indexes — and return the staged relation.
    */
  private[graft] def stageZOrdered(spark: SparkSession, dir: String): DataFrame = synchronized {
    val loc = Staging.indexPath("orders_zorder", dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS"))) {
      val base = dims(spark, dir)
      val bounds = base.agg(
        min("o_custkey").as("ck_lo"), max("o_custkey").as("ck_hi"),
        min("day_nr").as("d_lo"), max("day_nr").as("d_hi"))
      Staging.publishIndex(spark, "orders_zorder", dir)(p =>
        base.crossJoin(broadcast(bounds))
          .withColumn("z", morton(
            scale16(col("o_custkey"), col("ck_lo"), col("ck_hi")),
            scale16(col("day_nr"), col("d_lo"), col("d_hi"))))
          .select("o_orderkey", "o_custkey", "order_day", "o_totalprice", "z")
          .repartitionByRange(ZFiles, col("z"))
          .sortWithinPartitions("z")
          .write.mode("overwrite").parquet(p))
    }
    spark.read.parquet(loc)
  }

  /** Comparison layout for the spec: the SAME rows range-partitioned on
    * the date alone — the single-dimension sort a naive pipeline ships.
    */
  private[graft] def stageDateSorted(spark: SparkSession, dir: String): DataFrame = synchronized {
    val loc = Staging.indexPath("orders_bydate", dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS"))) {
      Staging.publishIndex(spark, "orders_bydate", dir)(p =>
        dims(spark, dir).drop("day_nr")
          .repartitionByRange(ZFiles, col("order_day"))
          .sortWithinPartitions("order_day")
          .write.mode("overwrite").parquet(p))
    }
    spark.read.parquet(loc)
  }

  /** q54 — a two-dimensional box probe served FROM the z-ordered
    * staging table (both predicates prune files via parquet min/max
    * stats; the layout changes I/O, never results — which is exactly
    * what the oracle checks against the original table).
    */
  def boxProbe(spark: SparkSession, dir: String): DataFrame =
    stageZOrdered(spark, dir)
      .where(col("o_custkey").between(40, 90)
        && col("order_day") >= lit(java.sql.Date.valueOf("1997-01-01"))
        && col("order_day") < lit(java.sql.Date.valueOf("1999-01-01")))
      .select("o_orderkey", "o_custkey", "order_day", "o_totalprice")
      .orderBy("o_orderkey")

  val oracleBoxProbe: String =
    """SELECT o_orderkey, o_custkey, (o_orderdate)::DATE AS order_day, o_totalprice
      |FROM orders
      |WHERE o_custkey BETWEEN 40 AND 90
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |ORDER BY o_orderkey""".stripMargin

  // -- q55: file-statistics index → metadata-only aggregation ---------------

  /** Per-file statistics index over the z-ordered staging table: one
    * row per data file with count / min / max / exact cents sum —
    * what parquet footers and a Delta/Iceberg stats manifest already
    * hold per file. Built ONCE per (data era, build) with a single scan
    * (at 100 TB you would not even scan: the footers are written with
    * the data; this build stands in for reading them) and staged as
    * its own tiny table. The price sum is folded in integer CENTS so
    * the per-file partials re-aggregate associatively — a double sum
    * would depend on file order.
    */
  private[graft] def statsIndex(spark: SparkSession, dir: String): DataFrame = synchronized {
    val loc = Staging.indexPath("orders_stats_index", dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS"))) {
      Staging.publishIndex(spark, "orders_stats_index", dir)(p =>
        stageZOrdered(spark, dir)
          .groupBy(input_file_name().as("file"))
          .agg(count(lit(1)).as("n_rows"),
            min("o_totalprice").as("min_price"),
            max("o_totalprice").as("max_price"),
            sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("cents"))
          .write.mode("overwrite").parquet(p))
    }
    spark.read.parquet(loc)
  }

  /** q55 — a corpus-wide aggregate answered ENTIRELY from the stats
    * index: count, min, max and the exact total re-aggregate from the
    * per-file partials (count/min/max/sum are all algebraic — partial
    * states merge losslessly), so the query's input is O(files), not
    * O(rows). The spec asserts the executed plan scans ONLY the index
    * table; the 100 TB reading is a metadata-only query — the same
    * reason `SELECT count(*)` on a Delta table never touches data.
    */
  def metadataAgg(spark: SparkSession, dir: String): DataFrame =
    statsIndex(spark, dir)
      .agg(sum("n_rows").as("n_rows"),
        min("min_price").as("min_price"),
        max("max_price").as("max_price"),
        (sum("cents").cast("double") / 100.0).as("total_price"))

  val oracleMetadataAgg: String =
    """SELECT count(*) AS n_rows,
      |  min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price,
      |  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::DOUBLE / 100.0 AS total_price
      |FROM orders""".stripMargin
}
