package graft.llm

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t12 — corpus-learned bigram language-model familiarity score.
  *
  * A production corpus pipeline scores documents against a language
  * model learned from the corpus itself (the cheap stand-in for a
  * perplexity filter: docs whose word transitions are rare in the
  * corpus are boilerplate, menus, or noise). This operator learns the
  * bigram table from the whole corpus in one pass and scores each doc
  * by how "familiar" its transitions are.
  *
  * Emitted metrics stay INTEGER-exact so the oracle hash-matches:
  * per-doc `sum(bigram_freq)` and `sum(context_freq)` are BIGINT sums
  * of corpus counts, and the familiarity ratio is a single int/int
  * double division (bit-identical across engines) — never a sum of
  * per-bigram doubles, whose addition order would be
  * partition-dependent. A log-prob variant would divide per bigram and
  * sum doubles; the ratio-of-sums form is the order-independent
  * equivalent signal.
  *
  * Scale shape (100 TB): one explode + two hash aggregates build the
  * count tables (vocab-sized, pre-aggregated so the scoring joins are
  * keyed one-row-per-key lookups — hot bigrams like "of the" do NOT
  * fan out), then two shuffle joins on word keys and one per-doc
  * aggregate. No broadcast assumption on the vocab: at web scale the
  * bigram table outgrows the driver, so both joins stay shuffled
  * equi-joins.
  */
object LangModel {

  /** Per-doc bigram rows (doc_id, w1, w2); docs with < 2 words keep a
    * single all-null row (explode_outer) so the final aggregate emits
    * them with zero counts instead of dropping them.
    */
  private def bigramRows(spark: SparkSession, dir: String): DataFrame = {
    val ws = TextStats.tokens(col("text"))
    val pairs = when(size(col("ws")) >= 2,
      transform(sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
                    element_at(col("ws"), i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), explode_outer(pairs).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
  }

  def bigramFamiliarity(spark: SparkSession, dir: String): DataFrame = {
    val bg = bigramRows(spark, dir)
    val occ = bg.filter(col("w1").isNotNull)
    val bc = occ.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    val cc = occ.groupBy("w1").agg(count(lit(1)).as("cc"))
    bg.join(bc, Seq("w1", "w2"), "left")
      .join(cc, Seq("w1"), "left")
      .groupBy("doc_id")
      .agg(
        count(col("w1")).as("n_bigrams"),
        countDistinct(col("w1"), col("w2")).as("n_distinct"),
        sum("bc").as("sum_bigram_freq"),
        sum("cc").as("sum_context_freq"))
      .withColumn("familiarity",
        col("sum_bigram_freq").cast("double") / col("sum_context_freq"))
      .orderBy("doc_id")
  }

  /** t18 — perplexity-bucket filter (the CCNet shape: score every doc
    * against a corpus-trained LM, split the corpus into head/middle/
    * tail by perplexity, keep head+middle — Wenzek et al.,
    * arXiv:1911.00359). The LM is the t12 bigram table with add-one
    * smoothing over the corpus vocabulary.
    *
    * Cross-entropy is computed at INTEGER BIT RESOLUTION: each bigram
    * occurrence contributes `ilog2(cc + V) − ilog2(bc + 1)` whole bits
    * (`ilog2(n) = length(bin(n)) − 1`, exact in both engines — no
    * float log anywhere), so the per-doc total is a BIGINT sum —
    * order-independent, hash-exact — instead of a partition-order-
    * dependent sum of doubles. The 1-bit-per-term resolution is the
    * DECLARED approximation (the q56/d16 pattern: production would sum
    * float log-probs; the integer twin is the cross-engine-verifiable
    * form and preserves the head/middle/tail split semantics).
    *
    * Scale shape (100 TB): count tables as in t12 (shuffled equi-joins,
    * no vocab broadcast), one BIGINT per-doc aggregate, then a single
    * global `ntile(3)` sort on the compact (doc_id, bits) relation. At
    * real scale the exact ntile becomes two approx-quantile thresholds
    * (q56) + a map-side bucket compare; the exact sort is kept here
    * because it is the oracle-checkable form.
    */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ilog2(c: org.apache.spark.sql.Column) = length(bin(c)) - 1
    // bg feeds four subtrees (bc, cc, vocab, the scoring join) — persist
    // or the tokenize+explode runs once per consumer (the d18 lesson)
    val bg = bigramRows(spark, dir).persist()
    val occ = bg.filter(col("w1").isNotNull)
    val bc = occ.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    val cc = occ.groupBy("w1").agg(count(lit(1)).as("cc"))
    val vocab = occ.select(col("w1").as("w"))
      .unionByName(occ.select(col("w2").as("w")))
      .agg(countDistinct("w").as("v"))
    val perDoc = bg.join(bc, Seq("w1", "w2"), "left")
      .join(cc, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(col("w1")).as("n_bigrams"),
           coalesce(sum(ilog2(col("cc") + col("v")) - ilog2(col("bc") + 1)), lit(0L))
             .cast("long").as("sum_bits"))
      .withColumn("bits_x1000",
        when(col("n_bigrams") > 0, expr("sum_bits * 1000 div n_bigrams")).otherwise(lit(0L)))
    val scored = perDoc
      .localCheckpoint() // compact (doc, bits) rows; the global ntile
      // window + presentation sort would otherwise re-run the whole
      // scoring chain (rangepartitioning samples its child)
    bg.unpersist()
    scored
      .withColumn("tertile",
        ntile(3).over(Window.orderBy(col("bits_x1000"), col("doc_id"))).cast("long"))
      .withColumn("keep", col("tertile") <= 2)
      .orderBy("doc_id")
  }

  val oraclePerplexityBuckets: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      |  FROM documents),
      |bg0 AS (
      |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) u),
      |bc AS (SELECT w1, w2, count(*) AS bc FROM bg0 GROUP BY 1, 2),
      |cc AS (SELECT w1, count(*) AS cc FROM bg0 GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM (
      |  SELECT w1 AS w FROM bg0 UNION ALL SELECT w2 FROM bg0)),
      |agg AS (
      |  SELECT doc_id,
      |         count(*) AS n_bigrams,
      |         sum(length(bin(cc.cc + v.v)) - 1 - (length(bin(bc.bc + 1)) - 1))::BIGINT AS sum_bits
      |  FROM bg0 JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v
      |  GROUP BY doc_id),
      |perdoc AS (
      |  SELECT d.doc_id,
      |         coalesce(n_bigrams, 0) AS n_bigrams,
      |         coalesce(sum_bits, 0) AS sum_bits,
      |         CASE WHEN coalesce(n_bigrams, 0) > 0
      |              THEN (coalesce(sum_bits, 0) * 1000) // n_bigrams
      |              ELSE 0 END AS bits_x1000
      |  FROM documents d LEFT JOIN agg USING (doc_id))
      |SELECT doc_id, n_bigrams, sum_bits, bits_x1000,
      |  ntile(3) OVER (ORDER BY bits_x1000, doc_id) AS tertile,
      |  ntile(3) OVER (ORDER BY bits_x1000, doc_id) <= 2 AS keep
      |FROM perdoc
      |ORDER BY doc_id""".stripMargin

  /** t23 — Kneser-Ney-style discounted bigram familiarity (Kneser &
    * Ney 1995; the modified-KN form is Chen & Goodman 1998, the
    * standard n-gram smoother). Where t12 scores docs by RAW corpus
    * transition frequency, KN's two ideas are (a) absolute discounting
    * — subtract a fixed D from every observed bigram count so
    * singleton transitions stop looking as confident as frequent ones
    * — and (b) the CONTINUATION distribution — back off not to how
    * often w2 occurs but to how many distinct contexts w2 follows
    * ("york" is frequent but only ever follows "new"; KN backoff
    * scores it low in a fresh context, raw backoff scores it high).
    * Low-KN docs are template/boilerplate with rare transitions even
    * when individual words are common — the curation signal t12's raw
    * form dilutes.
    *
    * Determinism contract (the t12/t18 pattern): NEVER sum per-row
    * doubles. Every per-doc aggregate is a BIGINT sum of corpus
    * counts — `sum_disc4` (Σ 4·bc−3: the D = 3/4 discounted bigram
    * numerator at fixed-point scale 4, exact since bc ≥ 1),
    * `sum_ctx` (Σ context occurrences), `sum_fan` (Σ distinct
    * continuations of w1 — the backoff-weight numerator N1+(w1,·)),
    * `sum_cont` (Σ distinct left-contexts of w2 — the continuation
    * numerator N1+(·,w2)) — and the doc-level score composes them with
    * exactly three IEEE double divisions and one multiply/add, each
    * bit-identical across engines:
    *   kn_direct  = sum_disc4 / (4·sum_ctx)
    *   kn_backoff = (3·sum_fan / (4·sum_ctx)) · (sum_cont / (n·T))
    *   kn_score   = kn_direct + kn_backoff,   T = distinct bigram types
    * (the doc-level ratio-of-sums analog of summing per-occurrence KN
    * probabilities — order-independent where the textbook per-token
    * log-prob sum is partition-order-dependent).
    *
    * Scale shape (100 TB): one explode, three hash aggregates build
    * the count tables (each vocab-sized and pre-aggregated, so hot
    * words never fan out), the type-count T is a one-row broadcast —
    * and the scoring join runs at the (doc, DISTINCT bigram) grain,
    * never per occurrence: a map-side partial agg folds each doc's
    * bigram multiplicity k first, so the three word-keyed equi-joins
    * move one row per distinct (doc, bigram) and the sums recover
    * exactly as Σ k·f(w1,w2). No vocab broadcast assumption.
    */
  def knFamiliarity(spark: SparkSession, dir: String): DataFrame = {
    // bg feeds five subtrees (bc, cc+fan, cont, T, the scoring join) —
    // persist or the tokenize+explode runs once per consumer
    val bg = bigramRows(spark, dir).persist()
    val occ = bg.filter(col("w1").isNotNull)
    val bc = occ.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    val cc = occ.groupBy("w1")
      .agg(count(lit(1)).as("cc"), countDistinct("w2").as("fan"))
    val cont = occ.groupBy("w2").agg(countDistinct("w1").as("cont"))
    val types = bc.agg(count(lit(1)).as("t"))
    // scoring join at the (doc, DISTINCT bigram) grain, not per
    // occurrence: the joined values depend only on (w1, w2), so the
    // per-doc multiplicity k folds in BEFORE the word-keyed shuffles —
    // the groupBy's map-side partial combine means the three joins
    // move one row per distinct (doc, bigram) instead of one per
    // occurrence (template-heavy corpora repeat bigrams within a doc;
    // at the 100×/16× doc-mass fixtures this was the steepest text-leg
    // scaler). Sums recover exactly: Σ_occ f(w1,w2) = Σ_grain k·f.
    // bg (not occ): explode_outer's null row keeps short docs in the
    // grain so they emit with 0 bigrams / NULL sums, the oracle's
    // LEFT-JOIN convention; null keys never match, left joins keep them
    val grain = bg.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))
    val perDoc = grain.join(bc, Seq("w1", "w2"), "left")
      .join(cc, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(types))
      .groupBy("doc_id")
      .agg(
        sum(when(col("w1").isNotNull, col("k")).otherwise(0L)).as("n_bigrams"),
        sum(col("k") * (col("bc") * 4 - 3)).as("sum_disc4"),
        sum(col("k") * col("cc")).as("sum_ctx"),
        sum(col("k") * col("fan")).as("sum_fan"),
        sum(col("k") * col("cont")).as("sum_cont"),
        first("t").as("t"))
    val out = perDoc
      .withColumn("kn_direct",
        col("sum_disc4").cast("double") / (col("sum_ctx") * 4))
      .withColumn("kn_backoff",
        ((col("sum_fan") * 3).cast("double") / (col("sum_ctx") * 4)) *
          (col("sum_cont").cast("double") / (col("n_bigrams") * col("t"))))
      .withColumn("kn_score", col("kn_direct") + col("kn_backoff"))
      .select("doc_id", "n_bigrams", "sum_disc4", "sum_ctx", "sum_fan",
        "sum_cont", "kn_direct", "kn_backoff", "kn_score")
      .orderBy("doc_id")
      .localCheckpoint() // presentation sort samples its child; cheap rows
    bg.unpersist()
    out
  }

  /** DuckDB twin of [[knFamiliarity]]: same count tables as t12's
    * oracle plus the two KN continuation tables; the score repeats the
    * identical division/multiply tree. Docs with < 2 words re-attach
    * with 0 bigrams and NULL sums/scores via the final LEFT JOIN.
    */
  val oracleKnFamiliarity: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) u),
      |bc AS (SELECT w1, w2, count(*) AS bc FROM bg GROUP BY 1, 2),
      |cc AS (SELECT w1, count(*) AS cc, count(DISTINCT w2) AS fan FROM bg GROUP BY 1),
      |ct AS (SELECT w2, count(DISTINCT w1) AS cont FROM bg GROUP BY 1),
      |ty AS (SELECT count(*) AS t FROM bc),
      |agg AS (
      |  SELECT doc_id,
      |         count(*) AS n_bigrams,
      |         sum(bc.bc * 4 - 3)::BIGINT AS sum_disc4,
      |         sum(cc.cc)::BIGINT AS sum_ctx,
      |         sum(cc.fan)::BIGINT AS sum_fan,
      |         sum(ct.cont)::BIGINT AS sum_cont,
      |         any_value(ty.t) AS t
      |  FROM bg
      |  JOIN bc USING (w1, w2)
      |  JOIN cc USING (w1)
      |  JOIN ct USING (w2)
      |  CROSS JOIN ty
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |  coalesce(n_bigrams, 0) AS n_bigrams,
      |  sum_disc4, sum_ctx, sum_fan, sum_cont,
      |  sum_disc4::DOUBLE / (sum_ctx * 4) AS kn_direct,
      |  ((sum_fan * 3)::DOUBLE / (sum_ctx * 4)) *
      |    (sum_cont::DOUBLE / (n_bigrams * t)) AS kn_backoff,
      |  sum_disc4::DOUBLE / (sum_ctx * 4) +
      |    ((sum_fan * 3)::DOUBLE / (sum_ctx * 4)) *
      |    (sum_cont::DOUBLE / (n_bigrams * t)) AS kn_score
      |FROM documents d LEFT JOIN agg USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** DuckDB twin: same bigram extraction (1-based `t[i]`/`t[i+1]`),
    * same count tables, same ratio-of-BIGINT-sums. `range(1, len(t))`
    * is empty for len < 2 (DuckDB ranges don't reverse), so short docs
    * drop out of `bg` and are re-attached by the final LEFT JOIN.
    */
  val oracleBigramFamiliarity: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) u),
      |bc AS (SELECT w1, w2, count(*) AS bc FROM bg GROUP BY 1, 2),
      |cc AS (SELECT w1, count(*) AS cc FROM bg GROUP BY 1),
      |agg AS (
      |  SELECT doc_id,
      |         count(*) AS n_bigrams,
      |         count(DISTINCT w1 || ' ' || w2) AS n_distinct,
      |         sum(bc.bc)::BIGINT AS sum_bigram_freq,
      |         sum(cc.cc)::BIGINT AS sum_context_freq
      |  FROM bg
      |  JOIN bc USING (w1, w2)
      |  JOIN cc USING (w1)
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |  coalesce(n_bigrams, 0) AS n_bigrams,
      |  coalesce(n_distinct, 0) AS n_distinct,
      |  sum_bigram_freq, sum_context_freq,
      |  sum_bigram_freq::DOUBLE / sum_context_freq AS familiarity
      |FROM documents d LEFT JOIN agg USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin
}
