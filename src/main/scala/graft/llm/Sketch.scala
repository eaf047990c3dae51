package graft.llm

import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d22 — count-min sketch word-frequency estimation.
  *
  * The fixed-memory answer to "how often does each term occur in a
  * 100 TB corpus": a depth×width grid of counters where every word
  * adds its count to one bucket per row (bucket = portable hash of the
  * word, seeded per row). Estimates read back `min` over the word's
  * depth cells — always an OVERcount (collisions only add), with error
  * ≤ ε·N at probability 1−δ for width=e/ε, depth=ln(1/δ).
  *
  * Unlike HLL (d16, engine-specific bits → rows-only check), a CMS is
  * exactly reproducible from its hash spec, so this sketch op gets a
  * full DuckDB hash-match: both engines build the identical grid from
  * [[graft.llm.TextHash.phash]] and read back identical estimates.
  *
  * Scale shape: word counts are one explode + hash aggregate (the
  * relation t05 already materializes); the grid is a [[Depth]]-way
  * fan-out of the DISTINCT-word relation aggregated to Depth×[[Width]]
  * rows — constant memory, mergeable partials, broadcastable
  * everywhere. The probe side joins top-k words to grid cells on
  * (d, bucket) — a broadcast hash join against the tiny grid.
  */
object Sketch {

  val Depth = 4
  val Width = 512
  val TopK = 20

  /** (d, bucket) struct per depth row for a word column (shared with
    * s19's streaming grid fold).
    */
  private[graft] def cellKeys(word: Column): Column =
    array((0 until Depth).map { d =>
      struct(lit(d).as("d"), pmod(TextHash.phash(word, 100 + d), lit(Width)).as("b"))
    }: _*)

  def countMinTopK(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(spark, dir)
      .select(explode(TextStats.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("exact_count"))
      .persist() // feeds the grid AND the probe set
    val cells = wc
      .select(explode(cellKeys(col("word"))).as("db"), col("exact_count"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(sum("exact_count").as("cell"))
    val top = wc.orderBy(col("exact_count").desc, col("word")).limit(TopK)
    top
      .select(col("word"), col("exact_count"), explode(cellKeys(col("word"))).as("db"))
      .select(col("word"), col("exact_count"), col("db.d").as("d"), col("db.b").as("b"))
      .join(broadcast(cells), Seq("d", "b"))
      .groupBy("word", "exact_count")
      .agg(min("cell").as("cms_estimate"))
      .withColumn("overcount", col("cms_estimate") - col("exact_count"))
      .orderBy(col("exact_count").desc, col("word"))
  }

  /** DuckDB twin: same grid from the same hashes, probe via UNION ALL
    * over the [[Depth]] seeds.
    */
  val oracleCountMinTopK: String = {
    def bucketSql(d: Int) = s"(${TextHash.phashSql("word", 100 + d)} % $Width)"
    val gridLegs = (0 until Depth).map { d =>
      s"SELECT $d AS d, ${bucketSql(d)} AS b, exact_count FROM wc"
    }.mkString("\n  UNION ALL ")
    val probeLegs = (0 until Depth).map { d =>
      s"SELECT word, exact_count, $d AS d, ${bucketSql(d)} AS b FROM top"
    }.mkString("\n  UNION ALL ")
    s"""WITH wc AS (
       |  SELECT word, count(*) AS exact_count
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
       |        FROM documents)
       |  GROUP BY word),
       |grid AS (
       |  SELECT d, b, sum(exact_count)::BIGINT AS cell FROM (
       |  $gridLegs)
       |  GROUP BY d, b),
       |top AS (
       |  SELECT word, exact_count FROM wc
       |  ORDER BY exact_count DESC, word LIMIT $TopK),
       |probe AS (
       |  $probeLegs)
       |SELECT word, exact_count, min(cell)::BIGINT AS cms_estimate,
       |       (min(cell) - exact_count)::BIGINT AS overcount
       |FROM probe JOIN grid USING (d, b)
       |GROUP BY word, exact_count
       |ORDER BY exact_count DESC, word""".stripMargin
  }

  // ---- d42: corpus-pair overlap estimation via KMV sketches ---------------

  /** KMV sketch size: abs error of the Jaccard estimate concentrates
    * at ~1/√k ≈ 6.3 %; the emitted bound check allows 0.2 (> 3σ).
    */
  val KmvK = 256

  /** d42 — source-pair content-overlap estimation from k-minimum-values
    * sketches (Beyer et al. SIGMOD'07; the Theta-sketch set
    * intersection shape): per SOURCE, keep the [[KmvK]] smallest
    * shingle hashes; for a pair, the Jaccard estimate is the fraction
    * of the union's k smallest values present in both sketches. The
    * dataset-level planning question ("which corpora overlap enough
    * that cross-corpus dedup is worth running?") answered from
    * constant-size per-corpus state instead of a corpus×corpus
    * shingle join.
    *
    * Everything is deterministic integer/set arithmetic over the
    * portable hash — unlike HLL (d16) the estimate itself crosses
    * engines, so this sketch is FULLY oracle-checked (the d22
    * precedent), and the exact Jaccard is emitted alongside with a
    * ≤ 0.2 bound boolean (the declared-bound pattern, here checked on
    * top of an already-hash-matched estimate).
    *
    * Scale shape: one distinct (source, h) pass; per-source k-min via
    * a ranked window (partial WindowGroupLimit prunes per-partition —
    * no source's full shingle set ever sorts globally); everything
    * pairwise happens on O(sources · k) sketch rows — broadcastable
    * at any corpus size. The exact-Jaccard audit columns are the only
    * corpus-sized pairwise leg and exist for the oracle; production
    * ships the estimate alone.
    */
  def kmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = Tables.documents(spark, dir)
      .select(col("source"), explode(TextHash.hashedShingles(col("text"), 0)).as("h"))
      .distinct()
      .persist()
    val wk = Window.partitionBy("source").orderBy("h")
    val sk = sh.withColumn("rn", row_number().over(wk)).filter(col("rn") <= KmvK)
      .select("source", "h")
    val srcs = sh.select("source").distinct()
    val pairs = srcs.toDF("sa").crossJoin(srcs.toDF("sb")).filter(col("sa") < col("sb"))
    val pairSrc = pairs.select(col("sa"), col("sb"), col("sa").as("source"))
      .unionByName(pairs.select(col("sa"), col("sb"), col("sb").as("source")))
    // union sketch per pair: k smallest distinct values across both
    // sketches; estimate = fraction of them present in BOTH sources
    val uni = sk.join(pairSrc, Seq("source"))
      .groupBy("sa", "sb", "h").agg(count(lit(1)).as("n_src"))
    val wu = Window.partitionBy("sa", "sb").orderBy("h")
    val est = uni.withColumn("rn", row_number().over(wu)).filter(col("rn") <= KmvK)
      .groupBy("sa", "sb")
      .agg(count(lit(1)).as("k_eff"),
           sum(when(col("n_src") === 2, 1L).otherwise(0L)).as("n_both"))
      .withColumn("est_x1000", expr("n_both * 1000 div k_eff"))
    // exact audit leg (the oracle re-derives it): intersection via an
    // h-keyed self-join — only SHARED shingles pay the pairwise step
    // (shingles are mostly doc-unique, cf. t13), union by inclusion-
    // exclusion from per-source counts. Never fans the full shingle
    // relation into per-pair copies.
    val counts = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = sh.toDF("sa", "h").join(sh.toDF("sb", "h2"),
        col("h") === col("h2") && col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("n_inter"))
    val ex = pairs.join(inter, Seq("sa", "sb"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(counts.toDF("sa", "na"), Seq("sa"))
      .join(counts.toDF("sb", "nb"), Seq("sb"))
      .withColumn("n_union", col("na") + col("nb") - col("n_inter"))
      .withColumn("exact_x1000", expr("n_inter * 1000 div n_union"))
      .select("sa", "sb", "n_inter", "n_union", "exact_x1000")
    est.join(ex, Seq("sa", "sb"))
      .select(col("sa"), col("sb"), col("k_eff"), col("n_both"), col("est_x1000"),
        col("n_inter"), col("n_union"), col("exact_x1000"),
        (abs(col("est_x1000") - col("exact_x1000")) <= 200).as("bound_ok"))
      .orderBy("sa", "sb")
  }

  val oracleKmvOverlap: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT source, unnest(${TextHash.hashedShinglesSql("text", 0)}) AS h
       |  FROM documents),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM sh) WHERE rn <= $KmvK),
       |srcs AS (SELECT DISTINCT source FROM sh),
       |pairs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |pairsrc AS (
       |  SELECT sa, sb, sa AS source FROM pairs
       |  UNION ALL
       |  SELECT sa, sb, sb AS source FROM pairs),
       |uni AS (
       |  SELECT sa, sb, h, count(*) AS n_src
       |  FROM sk JOIN pairsrc USING (source)
       |  GROUP BY 1, 2, 3),
       |est AS (
       |  SELECT sa, sb, count(*) AS k_eff,
       |         sum(CASE WHEN n_src = 2 THEN 1 ELSE 0 END)::BIGINT AS n_both
       |  FROM (
       |    SELECT sa, sb, h, n_src,
       |           row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
       |    FROM uni) WHERE rn <= $KmvK
       |  GROUP BY 1, 2),
       |ex AS (
       |  SELECT sa, sb, count(*) AS n_union,
       |         sum(CASE WHEN n_src = 2 THEN 1 ELSE 0 END)::BIGINT AS n_inter
       |  FROM (
       |    SELECT sa, sb, h, count(*) AS n_src
       |    FROM sh JOIN pairsrc USING (source)
       |    GROUP BY 1, 2, 3)
       |  GROUP BY 1, 2)
       |SELECT sa, sb, k_eff, n_both, (n_both * 1000) // k_eff AS est_x1000,
       |       n_inter, n_union, (n_inter * 1000) // n_union AS exact_x1000,
       |       abs((n_both * 1000) // k_eff - (n_inter * 1000) // n_union) <= 200 AS bound_ok
       |FROM est JOIN ex USING (sa, sb)
       |ORDER BY sa, sb""".stripMargin

  // -- d72/d73: mergeable quantile sketch (bottom-k uniform sample) ------------

  /** Sample size of the quantile sketch. Rank error sd of a k-uniform
    * sample is √(q(1−q)/k) ≈ 4.4 % of n at the median for k = 128; the
    * emitted 25 % relative-value bound sits several sigmas out on any
    * reasonably dense value distribution.
    */
  val QsK = 128
  private val QsSeed = 72

  /** Target quantiles, in per-mille. */
  val QsQuantiles: Seq[Long] = Seq(100L, 250L, 500L, 750L, 900L)

  /** d72 — mergeable quantile sketch over document lengths: the
    * bottom-k-by-portable-hash uniform sample (the KMV selection rule
    * applied to ROWS instead of distinct values — Vitter's reservoir
    * made deterministic and mergeable). Per SOURCE, keep the [[QsK]]
    * docs with smallest `phash(doc_id)` (the constant-size mergeable
    * partial every executor/segment would ship at 100 TB); MERGE by
    * taking the k smallest of the union of partials — identically the
    * corpus bottom-k, which is the property that makes the sketch
    * mergeable (KLL/t-digest's role, with the portable hash replacing
    * their RNG so the sketch is a deterministic function of the data
    * and the DuckDB oracle replays build, merge and query
    * bit-for-bit, the d16/d42 discipline). Quantile q reads the
    * ⌊(k_eff−1)·q⌋+1-th order statistic of the sample; the exact
    * audit leg reads the same order statistic of the corpus via a
    * distinct-value histogram + running sum (the d44 prefix-sum
    * discipline — no corpus-wide sort; the value domain, not the
    * corpus, bounds the ranked relation).
    *
    * Scale shape: one scan → per-source ranked window
    * (WindowGroupLimit prunes to k per partition before the shuffle);
    * the merge ranks O(sources·k) rows; the exact leg is one hash
    * aggregate on n_chars plus a window over its distinct values.
    * Emitted columns are BIGINT/BOOLEAN only (the d16b type rule).
    */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        TextHash.phash(col("doc_id").cast("string"), QsSeed).as("h"))
      .persist() // feeds the sketch AND the exact histogram
    val ws = Window.partitionBy("source").orderBy("h", "doc_id")
    val partials = docs.withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= QsK)
    // merge of the per-source partials == corpus bottom-k; the global
    // window ranks only O(sources·k) pre-pruned rows
    val wm = Window.orderBy("h", "doc_id")
    val sample = partials.withColumn("mrn", row_number().over(wm))
      .filter(col("mrn") <= QsK)
      .select("n_chars")
    val wv = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sCum = sample.groupBy("n_chars").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wv))
    val sTot = sample.agg(count(lit(1)).as("k_eff"))
    val fCum = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wv))
    val fTot = docs.agg(count(lit(1)).as("n"))
    val qs = QsQuantiles.toDF("q_pm")
    val est = qs.crossJoin(broadcast(sTot))
      .withColumn("r", expr("(k_eff - 1) * q_pm DIV 1000 + 1"))
      .join(broadcast(sCum), col("cum") >= col("r"))
      .groupBy("q_pm", "k_eff").agg(min("n_chars").as("est_chars"))
    val exact = qs.crossJoin(broadcast(fTot))
      .withColumn("r", expr("(n - 1) * q_pm DIV 1000 + 1"))
      .join(broadcast(fCum), col("cum") >= col("r"))
      .groupBy("q_pm", "n").agg(min("n_chars").as("exact_chars"))
    val out = est.join(exact, Seq("q_pm"))
      .withColumn("abs_err", abs(col("est_chars") - col("exact_chars")))
      .withColumn("rel_err_pm",
        when(col("exact_chars") > 0, expr("abs_err * 1000 DIV exact_chars"))
          .otherwise(lit(0L)))
      .select(col("q_pm"), col("k_eff"), col("n"), col("est_chars"),
        col("exact_chars"), col("abs_err"), col("rel_err_pm"),
        (col("rel_err_pm") <= 250).as("within_bound"))
      .orderBy("q_pm")
      // eager: the report is |QsQuantiles| rows; checkpointing it lets
      // the corpus-wide docs cache be released NOW (the Dedup
      // edges.unpersist discipline) instead of accumulating storage
      // blocks across a 229-query run
      .localCheckpoint()
    docs.unpersist()
    out
  }

  lazy val oracleQuantileSketch: String = {
    val qList = QsQuantiles.mkString(", ")
    s"""WITH d AS (
       |  SELECT source, doc_id, n_chars,
       |         ${TextHash.phashSql("doc_id::VARCHAR", QsSeed)} AS h
       |  FROM documents),
       |partials AS (
       |  SELECT * FROM (
       |    SELECT source, doc_id, n_chars, h,
       |           row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
       |    FROM d) WHERE rn <= $QsK),
       |sample AS (
       |  SELECT n_chars FROM (
       |    SELECT n_chars, row_number() OVER (ORDER BY h, doc_id) AS mrn
       |    FROM partials) WHERE mrn <= $QsK),
       |scum AS (
       |  SELECT n_chars, sum(c) OVER (ORDER BY n_chars) AS cum
       |  FROM (SELECT n_chars, count(*) AS c FROM sample GROUP BY 1)),
       |stot AS (SELECT count(*)::BIGINT AS k_eff FROM sample),
       |fcum AS (
       |  SELECT n_chars, sum(c) OVER (ORDER BY n_chars) AS cum
       |  FROM (SELECT n_chars, count(*) AS c FROM d GROUP BY 1)),
       |ftot AS (SELECT count(*)::BIGINT AS n FROM d),
       |q AS (SELECT unnest([$qList])::BIGINT AS q_pm),
       |est AS (
       |  SELECT q_pm, k_eff, min(n_chars) AS est_chars
       |  FROM q, stot, scum
       |  WHERE cum >= (k_eff - 1) * q_pm // 1000 + 1
       |  GROUP BY 1, 2),
       |ex AS (
       |  SELECT q_pm, n, min(n_chars) AS exact_chars
       |  FROM q, ftot, fcum
       |  WHERE cum >= (n - 1) * q_pm // 1000 + 1
       |  GROUP BY 1, 2)
       |SELECT q_pm, k_eff, n, est_chars, exact_chars,
       |       abs(est_chars - exact_chars) AS abs_err,
       |       (CASE WHEN exact_chars > 0
       |             THEN abs(est_chars - exact_chars) * 1000 // exact_chars
       |             ELSE 0 END)::BIGINT AS rel_err_pm,
       |       (CASE WHEN exact_chars > 0
       |             THEN abs(est_chars - exact_chars) * 1000 // exact_chars
       |             ELSE 0 END) <= 250 AS within_bound
       |FROM est JOIN ex USING (q_pm)
       |ORDER BY q_pm""".stripMargin
  }

  /** d73 — per-source quantile report from the SAME per-source
    * partials d72 merges: the grouped face of the sketch (per-domain
    * length distribution across a 100 TB corpus without per-group
    * sorts — each group's state is ≤ [[QsK]] rows). Sources whose doc
    * count is below k have an unfilled sketch and the estimate is
    * exact by construction (k_eff = n_s); filled sketches exercise
    * the sampled branch (sf0.1's 250-doc sources). Same order-
    * statistic definition, same prefix-sum exact leg, per source.
    */
  def quantileBySource(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        TextHash.phash(col("doc_id").cast("string"), QsSeed).as("h"))
      .persist()
    val ws = Window.partitionBy("source").orderBy("h", "doc_id")
    val sample = docs.withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= QsK)
      .select("source", "n_chars")
    val wv = Window.partitionBy("source").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sCum = sample.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wv))
    val sTot = sample.groupBy("source").agg(count(lit(1)).as("k_eff"))
    val fCum = docs.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wv))
    val fTot = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val qs = QsQuantiles.toDF("q_pm")
    val est = sTot.crossJoin(broadcast(qs))
      .withColumn("r", expr("(k_eff - 1) * q_pm DIV 1000 + 1"))
      .join(sCum, Seq("source"))
      .filter(col("cum") >= col("r"))
      .groupBy("source", "q_pm", "k_eff").agg(min("n_chars").as("est_chars"))
    val exact = fTot.crossJoin(broadcast(qs))
      .withColumn("r", expr("(n - 1) * q_pm DIV 1000 + 1"))
      .join(fCum, Seq("source"))
      .filter(col("cum") >= col("r"))
      .groupBy("source", "q_pm", "n").agg(min("n_chars").as("exact_chars"))
    val out = est.join(exact, Seq("source", "q_pm"))
      .select(col("source"), col("q_pm"), col("k_eff"), col("n"),
        col("est_chars"), col("exact_chars"),
        (col("k_eff") === col("n")).as("unfilled_exact"))
      .withColumn("match_when_unfilled",
        !col("unfilled_exact") || (col("est_chars") === col("exact_chars")))
      .orderBy("source", "q_pm")
      .localCheckpoint() // |sources|·|QsQuantiles| rows; frees docs now
    docs.unpersist()
    out
  }

  lazy val oracleQuantileBySource: String = {
    val qList = QsQuantiles.mkString(", ")
    s"""WITH d AS (
       |  SELECT source, doc_id, n_chars,
       |         ${TextHash.phashSql("doc_id::VARCHAR", QsSeed)} AS h
       |  FROM documents),
       |sample AS (
       |  SELECT source, n_chars FROM (
       |    SELECT source, n_chars,
       |           row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
       |    FROM d) WHERE rn <= $QsK),
       |scum AS (
       |  SELECT source, n_chars, sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum
       |  FROM (SELECT source, n_chars, count(*) AS c FROM sample GROUP BY 1, 2)),
       |stot AS (SELECT source, count(*)::BIGINT AS k_eff FROM sample GROUP BY 1),
       |fcum AS (
       |  SELECT source, n_chars, sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum
       |  FROM (SELECT source, n_chars, count(*) AS c FROM d GROUP BY 1, 2)),
       |ftot AS (SELECT source, count(*)::BIGINT AS n FROM d GROUP BY 1),
       |q AS (SELECT unnest([$qList])::BIGINT AS q_pm),
       |est AS (
       |  SELECT s.source, q_pm, k_eff, min(c.n_chars) AS est_chars
       |  FROM stot s CROSS JOIN q JOIN scum c ON c.source = s.source
       |  WHERE c.cum >= (s.k_eff - 1) * q_pm // 1000 + 1
       |  GROUP BY 1, 2, 3),
       |ex AS (
       |  SELECT f.source, q_pm, n, min(c.n_chars) AS exact_chars
       |  FROM ftot f CROSS JOIN q JOIN fcum c ON c.source = f.source
       |  WHERE c.cum >= (f.n - 1) * q_pm // 1000 + 1
       |  GROUP BY 1, 2, 3)
       |SELECT source, q_pm, k_eff, n, est_chars, exact_chars,
       |       k_eff = n AS unfilled_exact,
       |       (NOT k_eff = n) OR est_chars = exact_chars AS match_when_unfilled
       |FROM est JOIN ex USING (source, q_pm)
       |ORDER BY source, q_pm""".stripMargin
  }
}
