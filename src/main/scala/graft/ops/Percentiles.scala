package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-memory exact interpolated percentiles.
  *
  * Spark's built-in `percentile` aggregate buffers the full per-group
  * value multiset in executor memory (a non-spillable
  * `ObjectHashAggregate` buffer): with a handful of groups the entire
  * fact column converges into a few merge tasks — correct at test SF,
  * OOM-shaped at 100 TB. This is the bounded replacement (the round-4
  * verdict's one flagged scale-killer):
  *
  *  - '''pass 1''' — a histogram over a '''value-independent''' bucket
  *    grid (sign + ⌊log₂|v|·64⌋: ~1.09 % relative width, monotone over
  *    all finite doubles). Because the grid needs no min/max, the
  *    histogram is the FIRST scan — there is no extrema pre-pass. The
  *    per-group bucket counts (driver-small: O(groups ×
  *    grid-buckets-touched), independent of n) are collected; plain
  *    Scala cumulates them and locates, for each target rank
  *    `k = ⌊p·(n−1)⌋ / ⌈p·(n−1)⌉`, the bucket holding it and the
  *    rank's offset within the bucket → locator rows re-injected as a
  *    literal broadcast (the Lloyd-centroid pattern: bounded driver
  *    state);
  *  - '''pass 2''' — an inner broadcast join against the locators keeps
  *    only boundary-bucket rows (~1 % of each group); a `row_number`
  *    window — Spark's sort-based window, which spills — picks the
  *    exact values at the needed offsets, and Spark's `Percentile`
  *    interpolation math is replayed on them bit-for-bit:
  *    `v_lo·(⌈rank⌉−rank) + v_hi·(rank−⌊rank⌋)` (the value itself when
  *    the rank is integral) — gate-proven to hash-match DuckDB
  *    `quantile_cont`, so the plan swap leaves q16/q30 hash-green.
  *
  * Two jobs, two column-pruned scans. What this buys at 100 TB: memory
  * no longer scales with per-group row count `n` — the built-in's
  * failure mode; every aggregate is a spillable hash agg and the only
  * data-sized sort runs over boundary-bucket rows (worst-case skew —
  * most of a group inside one 1 %-wide bucket — degrades to a
  * spillable sort, never an in-memory buffer). Group CARDINALITY still
  * bounds the locator broadcast (fine to ~10⁷ groups, the envelope of
  * any broadcast dimension); past that, the sketch twin (q56's
  * `approx_percentile` with an oracle-checked error bound) is the
  * right tool.
  */
object Percentiles {

  /** Monotone bucket id on the fixed log-magnitude grid: negative
    * values < 0 < positives; within a sign, 64 buckets per binade.
    * Deterministic pure function of the value — both passes compute it
    * identically, which is all exactness requires of the grid.
    */
  private def gridBucket(pv: Column): Column = {
    val mag = floor(log2(abs(pv)) * 64)
    // |offset| ≤ 64·1075 + 1 ≈ 68 801 keeps sign bands disjoint
    val m = lit(70000L)
    when(pv === 0.0, lit(0L))
      .when(pv > 0, m + mag)
      .otherwise(-m - mag)
  }

  /** Exact interpolated percentiles of `valueCol` per `groupCol`.
    *
    * Eager: runs the locator pass (job 1) when called.
    *
    * @param ps (outputAlias, percentile) pairs, e.g. `("p50", 0.5)`
    * @param extraAggs additional aggregates (e.g. `countDistinct`,
    *        `stddev`) computed per group over the unfiltered input and
    *        appended as trailing output columns
    * @return one row per group: `groupCol`, one double column per
    *         alias in `ps` order, then the `extraAggs` columns.
    *         Groups whose values are all NULL are dropped, and NaN
    *         values are not ordered Spark-style (the driver data has
    *         neither; the built-in would emit NULL/NaN-last).
    */
  def boundedPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[(String, Double)],
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val spark = df.sparkSession
    val base = df.withColumn("__pv", col(valueCol).cast("double"))

    // job 1: histogram on the fixed grid, collected — O(groups ×
    // grid-buckets-touched) driver rows, independent of n (the
    // Lloyd-centroid pattern: bounded driver state; the five-group gate
    // queries collect a few hundred rows). Rank location — cumulate,
    // find the bucket covering each k_lo = ⌊p·(n−1)⌋ / k_hi = ⌈p·(n−1)⌉
    // — is O(rows) driver Scala, then re-injected as a literal
    // broadcast. Group cardinality past the broadcast envelope (~10⁷)
    // is q56-sketch territory either way (see class doc).
    val hist = base
      .where(col("__pv").isNotNull)
      .select(col(groupCol), gridBucket(col("__pv")).as("bucket"))
      .groupBy(groupCol, "bucket").agg(count(lit(1)).as("cnt"))
    val histRows = hist.collect()

    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
    val locRows: Seq[Row] = histRows.toSeq.groupBy(_.get(0)).iterator.flatMap {
      case (g, rows) =>
        val sorted = rows.sortBy(_.getLong(1))
        val n = sorted.iterator.map(_.getLong(2)).sum
        // (bucket, cumBefore) per histogram row
        val cum0 = sorted.scanLeft(0L)((acc, r) => acc + r.getLong(2)).init
        ps.flatMap { case (pname, p) =>
          val rank = p * (n - 1).toDouble
          Seq(("lo", math.floor(rank).toLong), ("hi", math.ceil(rank).toLong))
            .map { case (role, k) =>
              val i = sorted.indices.lastIndexWhere(i => cum0(i) <= k)
              Row(g, pname, rank, role, sorted(i).getLong(1), k - cum0(i))
            }
        }
    }.toSeq
    val locSchema = StructType(
      hist.schema.find(_.name == groupCol).get ::
        List(StructField("pname", StringType), StructField("rank", DoubleType),
          StructField("role", StringType), StructField("b2", LongType),
          StructField("local", LongType)))
    val locd = spark
      .createDataFrame(java.util.Arrays.asList(locRows: _*), locSchema)
      .withColumnRenamed(groupCol, "g2")

    // job 2: the locator broadcast doubles as the boundary-bucket
    // filter (inner join: rows outside needed buckets drop; rows
    // inside duplicate ≤ |ps|×2 ways); a spillable row_number window
    // per locator picks the exact offsets
    val boundary = base
      .where(col("__pv").isNotNull)
      .withColumn("bucket", gridBucket(col("__pv")))
    val picked = boundary
      .join(broadcast(locd),
        boundary(groupCol) === col("g2") && boundary("bucket") === col("b2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(groupCol), col("bucket"), col("pname"), col("role"))
          .orderBy("__pv")))
      .where(col("rn") === col("local") + 1)
      .select(col(groupCol), col("pname"), col("rank"), col("role"), col("__pv"))

    // Spark Percentile interpolation, bit-for-bit (see class doc)
    val interp = picked
      .groupBy(col(groupCol), col("pname"), col("rank"))
      .agg(
        max(when(col("role") === "lo", col("__pv"))).as("vlo"),
        max(when(col("role") === "hi", col("__pv"))).as("vhi"))
      .withColumn("klo", floor(col("rank")).cast("double"))
      .withColumn("khi", ceil(col("rank")).cast("double"))
      .withColumn("res",
        when(col("klo") === col("khi"), col("vlo")).otherwise(
          col("vlo") * (col("khi") - col("rank")) +
            col("vhi") * (col("rank") - col("klo"))))

    val firstAgg = max(when(col("pname") === ps.head._1, col("res"))).as(ps.head._1)
    val restAggs = ps.tail.map { case (alias, _) =>
      max(when(col("pname") === alias, col("res"))).as(alias)
    }
    val wide = interp.groupBy(groupCol).agg(firstAgg, restAggs: _*)
    if (extraAggs.isEmpty) wide
    else {
      // extras ride their own single aggregation over the unfiltered
      // input (count(*)-style extras must see NULL-value rows too)
      val extras = base.groupBy(groupCol).agg(extraAggs.head, extraAggs.tail: _*)
      wide.join(broadcast(extras), Seq(groupCol))
    }
  }
}
