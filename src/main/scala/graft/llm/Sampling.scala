package graft.llm

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training pipelines: every
  * assignment is a pure function of the row key (hash-mod bucketing),
  * so the split is reproducible run-to-run, survives re-partitioning,
  * and never needs a global sort or a random-seed broadcast — the
  * properties `DataFrame.randomSplit` (partition-order-dependent)
  * cannot give at 100 TB.
  *
  * Hashing is the portable 56-bit md5 prefix ([[TextHash.phash]]) so
  * the DuckDB oracle reproduces buckets bit-for-bit.
  */
object Sampling {

  val SplitSeed = 7
  val TrainPct = 80
  val ValPct   = 10 // test gets the remainder

  /** d13 — train/val/test assignment: bucket = h(doc_id) mod 100,
    * train < 80 ≤ val < 90 ≤ test. Map-side only — no shuffle beyond
    * the output sort; at scale this is a zero-cost projection fused
    * into whatever reads it.
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        pmod(TextHash.phash(col("doc_id").cast("string"), SplitSeed), lit(100L)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < TrainPct, lit("train"))
          .when(col("bucket") < TrainPct + ValPct, lit("val"))
          .otherwise(lit("test")))
      .orderBy("doc_id")

  /** The split label as a pure expression of any id column (d14). */
  private[graft] def splitCol(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bucket = pmod(TextHash.phash(docId.cast("string"), SplitSeed), lit(100L))
    when(bucket < TrainPct, lit("train"))
      .when(bucket < TrainPct + ValPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** SQL twin of [[splitCol]]. */
  private[llm] def splitCaseSql(docIdExpr: String): String = {
    val bucket = s"${TextHash.phashSql(s"$docIdExpr::VARCHAR", SplitSeed)} % 100"
    s"""CASE WHEN $bucket < $TrainPct THEN 'train'
       |     WHEN $bucket < ${TrainPct + ValPct} THEN 'val'
       |     ELSE 'test' END""".stripMargin
  }

  val oracleSplitAssign: String = {
    val bucket = s"${TextHash.phashSql(s"doc_id::VARCHAR", SplitSeed)} % 100"
    s"""SELECT doc_id, lang, $bucket AS bucket,
       |       CASE WHEN $bucket < $TrainPct THEN 'train'
       |            WHEN $bucket < ${TrainPct + ValPct} THEN 'val'
       |            ELSE 'test' END AS split
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  val MixSeed   = 31
  val QuotaMult = 4L      // quota per language = min(n, 4·⌊√n⌋)
  val AcceptDen = 1000000L

  /** d26 — mixture rebalancing (sqrt-temperature language sampling, the
    * mT5/UniMax shape): head languages are down-sampled toward
    * `quota = min(n, 4·⌊√n⌋)` while tail languages keep (nearly) all
    * their mass, flattening the language distribution before training.
    *
    * The accept test is a per-million hash THRESHOLD, not a rank:
    * `h(doc_id) mod 1e6 < quota·1e6 div n`. d15's hash-rank is exact
    * per stratum but needs a window sort per language — and at 100 TB
    * the head language is most of the corpus, so that window is one
    * giant skewed partition. The threshold form needs only the
    * per-language count (a tiny agg, broadcast back): the fact side is
    * scan → broadcast-join → map-side filter, no shuffle, no skew, and
    * still deterministic row-for-row. Integer arithmetic throughout
    * (⌊√n⌋ via IEEE sqrt is exact below 2^51; truncating div on
    * positives) so the oracle reproduces membership bit-for-bit.
    */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang")
    val quotas = docs.groupBy("lang").agg(count("*").as("n_lang"))
      .withColumn("quota",
        least(col("n_lang"), lit(QuotaMult) * floor(sqrt(col("n_lang")))))
      .withColumn("accept_ppm", expr(s"quota * $AcceptDen div n_lang"))
    docs.join(broadcast(quotas), Seq("lang"))
      .where(pmod(TextHash.phash(col("doc_id").cast("string"), MixSeed),
        lit(AcceptDen)) < col("accept_ppm"))
      .select("doc_id", "lang", "n_lang", "quota", "accept_ppm")
      .orderBy("doc_id")
  }

  val oracleMixtureSample: String = {
    val h = s"${TextHash.phashSql("d.doc_id::VARCHAR", MixSeed)} % $AcceptDen"
    s"""WITH c AS (SELECT lang, count(*)::BIGINT AS n_lang FROM documents GROUP BY lang),
       |q AS (SELECT lang, n_lang,
       |        least(n_lang, $QuotaMult * floor(sqrt(n_lang))::BIGINT) AS quota
       |      FROM c),
       |a AS (SELECT lang, n_lang, quota,
       |        quota * $AcceptDen // n_lang AS accept_ppm FROM q)
       |SELECT d.doc_id, d.lang, a.n_lang, a.quota, a.accept_ppm
       |FROM documents d JOIN a USING (lang)
       |WHERE $h < a.accept_ppm
       |ORDER BY d.doc_id""".stripMargin
  }

  val ShufSeed = 47
  val Epochs   = 3
  val Shards   = 8L

  /** d27 — deterministic epoch reshuffling: each training epoch sees
    * the corpus in a different pseudorandom order, produced WITHOUT a
    * global sort. The per-epoch order key is `h(epoch:doc_id)`; the
    * shard (output file) is `key mod Shards` — map-side, uniform by
    * construction, no skew — and only the within-shard position needs
    * a sort, which is exactly the per-output-file local sort every
    * distributed writer already does. At 100 TB this is the standard
    * "shuffle by re-keying" pattern: epochs × shards partitions, each
    * independently sortable, versus an impossible corpus-wide
    * total-order shuffle per epoch.
    */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(Epochs - 1))).as("epoch"))
      .withColumn("okey", TextHash.phash(
        concat(col("epoch").cast("string"), lit(":"), col("doc_id").cast("string")),
        ShufSeed))
      .withColumn("shard", pmod(col("okey"), lit(Shards)))
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard").orderBy(col("okey"), col("doc_id")))
        .cast("long"))
      .select("epoch", "shard", "pos", "doc_id", "okey")
      .orderBy("epoch", "shard", "pos")
  }

  /** d43 — leakage-free split ENFORCEMENT: the fix for what d18
    * detects. Hash-mod splits (d13) assign near-duplicate documents
    * independently, so a near-dup cluster can span train and test —
    * the classic eval leak. Enforcement reassigns every document to
    * the split of its cluster's CANONICAL member (the d11 min-id
    * label): deterministic, order-free, and by construction no
    * verified near-dup cluster spans splits afterwards. Singletons
    * keep their hash split (their canonical is themselves), so only
    * genuinely-linked docs move.
    *
    * Scale shape: one broadcast-free keyed join of the staged d11
    * label relation against nothing at all — the split columns are
    * pure expressions of (doc_id, label); cost is a read of cc_labels
    * plus the presentation sort.
    */
  def splitEnforce(spark: SparkSession, dir: String): DataFrame =
    Dedup.clusterLabels(spark, dir)
      .select(col("doc_id"), col("label").as("canonical_id"),
        splitCol(col("doc_id")).as("old_split"),
        splitCol(col("label")).as("new_split"))
      .withColumn("moved", col("old_split") =!= col("new_split"))
      .orderBy("doc_id")

  /** d11's closure chain labels + the d13 split expression on both
    * member and canonical ids.
    */
  val oracleSplitEnforce: String =
    s"""WITH RECURSIVE ${Dedup.pairsCteSql},
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM pairs),
       |reach(u, v) AS (
       |  SELECT doc_id, doc_id FROM corpus
       |  UNION
       |  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
       |labeled AS (
       |  SELECT u AS doc_id, min(v) AS canonical_id FROM reach GROUP BY u)
       |SELECT doc_id, canonical_id,
       |  ${splitCaseSql("doc_id")} AS old_split,
       |  ${splitCaseSql("canonical_id")} AS new_split,
       |  ${splitCaseSql("doc_id")} <> ${splitCaseSql("canonical_id")} AS moved
       |FROM labeled
       |ORDER BY doc_id""".stripMargin

  val ShardTokens   = 4096L // target token mass per output shard
  val PrefixBuckets = 32L   // id-range buckets for the distributed prefix sum

  /** d44 — token-budgeted output sharding: assign each document to the
    * training shard that contains its global token OFFSET, so shards
    * carry ~`ShardTokens` tokens each regardless of document-length
    * skew (the export step every pretraining pipeline runs before
    * writing webdataset/parquet shards).
    *
    * The global running token sum is the scale problem: a single
    * `sum OVER (ORDER BY doc_id)` window is one range partition and
    * one task at 100 TB. This runs the classic two-pass distributed
    * prefix sum instead: (1) cut the id space into `PrefixBuckets`
    * contiguous ranges (order-preserving by construction); (2) one
    * tiny per-bucket total agg — O(buckets) rows collected, bounded
    * driver state like Percentiles' histogram — prefix-summed on the
    * driver into per-bucket offsets; (3) a within-bucket running-sum
    * window, parallel across buckets, plus the broadcast offset.
    * Every pass is linear, the only wide op is the final presentation
    * sort. Token count is t03's `est_bpe_tokens` arithmetic
    * ((alnum_chars+3) div 4, integer-exact in both engines).
    */
  def tokenShards(spark: SparkSession, dir: String): DataFrame =
    // materialize the token counts once: the prefix sum scans them
    // three times (min/max, bucket totals, window), and the HOF
    // tokenize is the dominant per-row cost (interpreted, no codegen)
    prefixShards(tokenCounts(Tables.documents(spark, dir)).localCheckpoint(), 0L)
      .orderBy("doc_id")

  /** (doc_id, n_tokens) with t03's est_bpe_tokens arithmetic. */
  private[graft] def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      aggregate(transform(TextStats.tokens(col("text")), t => length(t)),
        lit(0), (a, x) => a + x).as("alnum"))
      .select(col("doc_id"), expr("cast((alnum + 3) div 4 as bigint)").as("n_tokens"))

  /** The two-pass distributed prefix sum over (doc_id, n_tokens),
    * starting the global running total at `base` (0 for the batch
    * query; the carried-forward corpus total for s18's per-trigger
    * folds). Unordered output — callers add the presentation sort.
    */
  private[graft] def prefixShards(docs: DataFrame, base: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val out = Seq("doc_id", "n_tokens", "cum_tokens", "shard")
    // pass 1: contiguous id-range buckets (two scalar aggregates; the
    // span is driver-computed from min/max, not a sampled range sort)
    val b = docs.agg(min("doc_id"), max("doc_id")).head()
    if (b.isNullAt(0)) // empty slice (a range micro-batch can be)
      return docs.select(col("doc_id"), col("n_tokens"),
        col("n_tokens").as("cum_tokens"), col("n_tokens").as("shard")).limit(0)
    val (minId, maxId) = (b.getLong(0), b.getLong(1))
    val span = (maxId - minId) / PrefixBuckets + 1
    val bucketed = docs.withColumn("b", expr(s"(doc_id - $minId) div $span"))
    // pass 2: per-bucket totals → driver-side exclusive prefix sum
    val totals = bucketed.groupBy("b").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((-1L, base)) { case ((_, acc), (bk, t)) => (bk, acc + t) }
      .init.zip(totals).map { case ((_, off), (bk, _)) => (bk, off) }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("b", "off")
    // pass 3: within-bucket running sum (parallel windows) + offset
    val w = Window.partitionBy("b").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offDf), Seq("b"))
      .withColumn("cum_tokens", sum("n_tokens").over(w) + col("off"))
      .withColumn("shard", expr(s"(cum_tokens - n_tokens) div $ShardTokens"))
      .select(out.head, out.tail: _*)
  }

  /** One flat window — the oracle states WHAT (the global running sum);
    * the bucketed two-pass plan is the HOW at scale.
    */
  val oracleTokenShards: String = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH t AS (
       |  SELECT doc_id,
       |    ((list_sum(list_transform($toks, x -> length(x)))::BIGINT + 3) // 4)::BIGINT AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
       |  FROM t)
       |SELECT doc_id, n_tokens, cum_tokens,
       |       ((cum_tokens - n_tokens) // $ShardTokens)::BIGINT AS shard
       |FROM c ORDER BY doc_id""".stripMargin
  }

  val oracleEpochShuffle: String = {
    val h = TextHash.phashSql("(epoch::VARCHAR || ':' || doc_id::VARCHAR)", ShufSeed)
    s"""WITH e AS (SELECT doc_id, unnest(range($Epochs)) AS epoch FROM documents),
       |k AS (SELECT epoch::INT AS epoch, doc_id, $h AS okey FROM e),
       |s AS (SELECT epoch, doc_id, okey, okey % $Shards AS shard FROM k)
       |SELECT epoch, shard, row_number() OVER (PARTITION BY epoch, shard
       |         ORDER BY okey, doc_id) AS pos, doc_id, okey
       |FROM s ORDER BY epoch, shard, pos""".stripMargin
  }

  val DsirSeed    = 49
  val DsirBuckets = 512L
  val DsirTarget  = "en"

  /** Half-bit-resolution floor(2·log2 n): `length(bin(n²)) − 1`, exact
    * integer in both engines for n < 2^31.5 (n² must fit a BIGINT —
    * fine for per-bucket feature counts at any realistic shard size;
    * production swaps in float log2 and loses the oracle, t18's
    * declared trade at double the resolution).
    */
  private def il2sq(n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (length(bin(n * n)) - 1).cast("long")

  private def il2sqSql(e: String): String =
    s"(length(bin(($e) * ($e))) - 1)"

  /** d49 — DSIR data selection (Xie et al., arXiv:2302.03169):
    * importance-resample a raw corpus toward a target distribution by
    * scoring every document with the log-likelihood ratio of a
    * bag-of-hashed-n-grams unigram model of the TARGET (here: the
    * `lang = 'en'` slice) against one of the RAW corpus. Features are
    * word unigrams + bigrams hashed into [[DsirBuckets]] buckets
    * (the paper's hashed n-gram generative model); both models are
    * add-one smoothed; a document's importance log-weight is the sum
    * of its features' per-bucket log-ratios, and `selected` keeps the
    * docs whose per-feature average log-ratio beats the corpus
    * average (see [[dsirFlag]]).
    *
    * Log arithmetic is INTEGER HALF-BITS ([[il2sq]] — the t18
    * integer-bit pattern at 2× resolution): each occurrence of bucket
    * b contributes `il2sq(ct_b+1) − il2sq(cr_b+1)` plus the constant
    * `il2sq(R+B) − il2sq(T+B)`, so the per-doc total is an
    * order-independent BIGINT sum — hash-exact across engines, no
    * float log anywhere.
    *
    * Scale shape (100 TB): tokenize+explode is map-side; ONE
    * (doc, bucket) count shuffle feeds everything; the bucket
    * log-ratio table is B=512 rows (a broadcast), the model totals one
    * scalar agg cross-joined in; the per-doc score is a BIGINT
    * group-by. No window, no global sort except presentation, and —
    * unlike rank-based selection — the mean threshold needs only a
    * scalar agg, never a corpus-wide quantile pass.
    */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    // one shuffle: per-(doc, bucket) multiplicities; feeds the bucket
    // model, the totals and the per-doc score (persist — the d18 lesson)
    val feats = dsirFeats(spark, dir).persist()
    val scored = dsirScored(spark, dir, feats).localCheckpoint()
    feats.unpersist()
    dsirFlag(scored).orderBy("doc_id")
  }

  /** The full scoring tree lazily, no persist/checkpoint — PlanSpec
    * pins the shape on this; [[dsirSelect]] adds the materialization.
    */
  private[graft] def dsirLazy(spark: SparkSession, dir: String): DataFrame =
    dsirFlag(dsirScored(spark, dir, dsirFeats(spark, dir))).orderBy("doc_id")

  /** `selected` keeps docs whose PER-FEATURE average log-ratio beats
    * the corpus per-feature average — an integer cross-multiply
    * (`halfbits·Σfeats > feats·Σhalfbits`, exact for the BIGINT ranges
    * here), so the deterministic stand-in for the paper's top-k
    * resample costs one scalar agg over the compact per-doc relation,
    * never a corpus-wide quantile or rank pass. Normalizing by feature
    * count removes the length bias a raw log-weight threshold has
    * (long docs accumulate the positive smoothing constant).
    */
  private def dsirFlag(scored: DataFrame): DataFrame = {
    val tot = scored.agg(sum("n_feats").as("tf"), sum("dsir_halfbits").as("s"))
    scored.crossJoin(broadcast(tot))
      .withColumn("selected", col("dsir_halfbits") * col("tf") > col("n_feats") * col("s"))
      .drop("tf", "s")
  }

  private def dsirFeats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), TextStats.tokens(col("text")).as("ws"))
    val uni = docs.select(col("doc_id"), col("lang"), explode(col("ws")).as("f"))
    val bi = docs
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat(element_at(col("ws"), i), lit(" "),
                      element_at(col("ws"), i + 1)))).as("f"))
    uni.unionByName(bi)
      .select(col("doc_id"), col("lang"),
        pmod(TextHash.phash(col("f"), DsirSeed), lit(DsirBuckets)).as("b"))
      .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("c"))
  }

  private def dsirScored(spark: SparkSession, dir: String, feats: DataFrame): DataFrame = {
    val lam = feats.groupBy("b")
      .agg(sum("c").as("cr"),
           sum(when(col("lang") === DsirTarget, col("c")).otherwise(0L)).as("ct"))
      .select(col("b"), (il2sq(col("ct") + 1) - il2sq(col("cr") + 1)).as("hb"))
    val totals = feats.agg(
      sum("c").as("r"),
      sum(when(col("lang") === DsirTarget, col("c")).otherwise(0L)).as("t"))
    val perDoc = feats.join(broadcast(lam), Seq("b"))
      .groupBy("doc_id")
      .agg(sum("c").as("nf"), sum(col("c") * col("hb")).as("s1"))
    Tables.documents(spark, dir).select("doc_id", "lang")
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("lang"),
        coalesce(col("nf"), lit(0L)).as("n_feats"),
        (coalesce(col("s1"), lit(0L)) +
          coalesce(col("nf"), lit(0L)) *
            (il2sq(col("r") + lit(DsirBuckets)) -
             il2sq(col("t") + lit(DsirBuckets)))).as("dsir_halfbits"))
  }

  val oracleDsirSelect: String = {
    val h = s"${TextHash.phashSql("f", DsirSeed)} % $DsirBuckets"
    s"""WITH toks AS (
       |  SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
       |  FROM documents),
       |uni AS (SELECT doc_id, lang, unnest(ws) AS f FROM toks),
       |bi AS (SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS f
       |       FROM toks, LATERAL (SELECT unnest(range(1, len(ws))) AS i) u),
       |feats AS (
       |  SELECT doc_id, lang, $h AS b, count(*)::BIGINT AS c
       |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
       |  GROUP BY 1, 2, 3),
       |lam AS (
       |  SELECT b, ${il2sqSql("ct + 1")} - ${il2sqSql("cr + 1")} AS hb
       |  FROM (SELECT b, sum(c)::BIGINT AS cr,
       |               sum(CASE WHEN lang = '$DsirTarget' THEN c ELSE 0 END)::BIGINT AS ct
       |        FROM feats GROUP BY b)),
       |tot AS (
       |  SELECT sum(c)::BIGINT AS r,
       |         sum(CASE WHEN lang = '$DsirTarget' THEN c ELSE 0 END)::BIGINT AS t
       |  FROM feats),
       |perdoc AS (
       |  SELECT doc_id, sum(c)::BIGINT AS nf, sum(c * hb)::BIGINT AS s1
       |  FROM feats JOIN lam USING (b) GROUP BY doc_id),
       |scored AS (
       |  SELECT d.doc_id, d.lang,
       |    coalesce(nf, 0)::BIGINT AS n_feats,
       |    (coalesce(s1, 0) + coalesce(nf, 0) *
       |      (${il2sqSql(s"r + $DsirBuckets")} - ${il2sqSql(s"t + $DsirBuckets")}))::BIGINT
       |      AS dsir_halfbits
       |  FROM documents d LEFT JOIN perdoc USING (doc_id) CROSS JOIN tot),
       |tot2 AS (
       |  SELECT sum(n_feats)::BIGINT AS tf, sum(dsir_halfbits)::BIGINT AS s
       |  FROM scored)
       |SELECT doc_id, lang, n_feats, dsir_halfbits,
       |       dsir_halfbits * tf > n_feats * s AS selected
       |FROM scored CROSS JOIN tot2 ORDER BY doc_id""".stripMargin
  }

  // ---- d52: per-source quota cap (top-k per group, no group sort) ----------

  /** Max docs kept per source (the CommonCrawl-style "cap every
    * domain" curation rule; binds on the ≥ 25-docs-per-source
    * fixtures, not at sf0.001).
    */
  val DomainCap = 16

  /** d52 — per-source quota cap: keep at most [[DomainCap]] docs per
    * source, best-first by (quality level desc, doc_id asc) — the
    * anti-spam/anti-SEO rule every web-corpus curation applies so one
    * domain cannot dominate training data. The operator's point is
    * HOW top-k-per-group runs at 100 TB: q50's lateral window sorts
    * every group — at web scale the head domain is most of the corpus
    * in ONE skewed sort partition. This is the bounded two-pass
    * order-statistic instead (the q16/Percentiles discipline applied
    * to ranks):
    *
    *  - '''pass 1''' — per-(source, level) counts over the 6-value
    *    integer quality grid ([[TextStats.qualityLevel]]): a spillable
    *    hash agg with map-side partials; collected driver state is
    *    O(sources × 7) — independent of corpus size. Plain Scala walks
    *    each source's histogram top-down and finds the boundary level
    *    L* and the slots k* left there (L* = −1 when the source fits
    *    entirely);
    *  - '''pass 2''' — the locator broadcast-joins back: docs above L*
    *    pass with NO sort anywhere; only the boundary stratum
    *    (source, L*) enters a `row_number` window — Spark's sort-based
    *    spillable window over the boundary rows only, exactly the
    *    Percentiles pass-2 shape.
    *
    * Ties are impossible (doc_id breaks them), so the kept set is
    * bit-deterministic and the DuckDB oracle (a plain per-source
    * ranking window — fine at gate scale) must match row-for-row.
    */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // eager: the tokenize (regex + interpreted higher-order sums) is
    // the dominant cost and feeds BOTH passes — unmaterialized it
    // would run once for the histogram and again per pass-2 leg; the
    // checkpointed relation is 3 scalar columns
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.llm.TextStats.qualityLevel(col("text")).as("qlevel"))
      .localCheckpoint()
    val hist = docs.groupBy("source", "qlevel")
      .agg(count(lit(1)).as("cnt")).collect()
    val locator: Seq[(String, Int, Long)] = hist.toSeq.groupBy(_.getString(0))
      .iterator.map { case (src, rows) =>
        val byLevel = rows.map(r => r.getInt(1) -> r.getLong(2)).sortBy(-_._1)
        var left = DomainCap.toLong
        var lstar = -1
        var kAt = 0L
        byLevel.foreach { case (lvl, cnt) =>
          if (lstar == -1) {
            if (cnt <= left) left -= cnt
            else { lstar = lvl; kAt = left }
          }
        }
        (src, lstar, kAt)
      }.toSeq
    val loc = locator.toDF("source", "lstar", "k_at")
    val joined = docs.join(broadcast(loc), Seq("source"))
    val above = joined
      .where(col("lstar") === -1 || col("qlevel") > col("lstar"))
    val w = Window.partitionBy("source").orderBy("doc_id")
    val boundary = joined.where(col("qlevel") === col("lstar"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= col("k_at"))
    above.select("source", "doc_id", "qlevel")
      .unionByName(boundary.select("source", "doc_id", "qlevel"))
      .orderBy("source", "doc_id")
  }

  lazy val oracleDomainCap: String =
    s"""WITH q AS (
       |  SELECT doc_id, source, ${graft.llm.TextStats.qualityLevelSql} AS qlevel
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source, qlevel,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY qlevel DESC, doc_id) AS rn
       |  FROM q)
       |SELECT source, doc_id, qlevel::INT AS qlevel
       |FROM r WHERE rn <= $DomainCap
       |ORDER BY source, doc_id""".stripMargin

  /** d57 — split drift: the two-sample Kolmogorov–Smirnov statistic
    * between the document-length (`n_chars`) distributions of each
    * pair of d13 splits. The eval that catches a biased split: a
    * hash-mod split should be length-exchangeable, so KS ≈ sampling
    * noise; a KS spike means the split leaked a length covariate
    * (e.g. assignment correlated with a source whose docs run long).
    *
    * Plan shape: one n_chars-keyed aggregate with per-split
    * conditional counts, ONE bounded running window over the distinct
    * length values (hundreds of rows — the distinct-value relation,
    * not the corpus), then a 3-row stack. The corpus itself is
    * touched once, map-side.
    *
    * Parity: each CDF value is an exactly-rounded long/long IEEE
    * division, the pairwise gap is a subtraction of those doubles in
    * the same expression order in both engines, and the reported
    * statistic is floor(1e6 · gap) — integer ppm, no float hashing.
    */
  def splitDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("n_chars"), splitCol(col("doc_id")).as("split"))
    val splits = Seq("train", "val", "test")
    val countCols = splits.map(s =>
      sum(when(col("split") === s, 1L).otherwise(0L)).as(s"c_$s"))
    val counts = docs.groupBy("n_chars").agg(countCols.head, countCols.tail: _*)
    val runW = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // an empty split has no CDF: guard the denominator (0.0, not
    // NaN/Infinity — the downstream floor()-to-BIGINT cast is ANSI)
    val cdf = splits.foldLeft(counts) { (df, s) =>
      df.withColumn(s"f_$s",
        when(sum(s"c_$s").over(allW) > 0,
          sum(s"c_$s").over(runW).cast("double") / sum(s"c_$s").over(allW).cast("double"))
          .otherwise(lit(0.0)))
    }
    val pairs = Seq(("train", "val"), ("train", "test"), ("val", "test"))
    val gapCols = pairs.map { case (a, b) =>
      max(abs(col(s"f_$a") - col(s"f_$b"))).as(s"ks_${a}_$b")
    } ++ splits.map(s => sum(s"c_$s").as(s"n_$s"))
    val gaps = cdf.agg(gapCols.head, gapCols.tail: _*)
    gaps.select(expr(
      s"stack(${pairs.size}, " +
        pairs.map { case (a, b) =>
          s"'${a}_$b', n_$a, n_$b, CAST(floor(ks_${a}_$b * 1000000) AS BIGINT)"
        }.mkString(", ") +
        ") AS (pair, n_a, n_b, ks_ppm)"))
      .orderBy("pair")
  }

  lazy val oracleSplitDrift: String = {
    val splits = Seq("train", "val", "test")
    val pairs = Seq(("train", "val"), ("train", "test"), ("val", "test"))
    val bucket = s"${TextHash.phashSql(s"doc_id::VARCHAR", SplitSeed)} % 100"
    val condCounts = splits.map(s =>
      s"sum(CASE WHEN split = '$s' THEN 1 ELSE 0 END)::BIGINT AS c_$s").mkString(",\n         ")
    val cdfCols = (splits.map(s => s"c_$s") ++ splits.map(s =>
      s"CASE WHEN sum(c_$s) OVER () > 0 THEN " +
        s"(sum(c_$s) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING))::DOUBLE" +
        s" / (sum(c_$s) OVER ())::DOUBLE ELSE 0.0 END AS f_$s")).mkString(",\n         ")
    val gapCols = (pairs.map { case (a, b) =>
      s"max(abs(f_$a - f_$b)) AS ks_${a}_$b"
    } ++ splits.map(s => s"sum(c_$s)::BIGINT AS n_$s")).mkString(",\n         ")
    val rows = pairs.map { case (a, b) =>
      s"SELECT '${a}_$b' AS pair, n_$a AS n_a, n_$b AS n_b, floor(ks_${a}_$b * 1000000)::BIGINT AS ks_ppm FROM g"
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS (
       |  SELECT n_chars,
       |         CASE WHEN $bucket < $TrainPct THEN 'train'
       |              WHEN $bucket < ${TrainPct + ValPct} THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM documents),
       |counts AS (
       |  SELECT n_chars,
       |         $condCounts
       |  FROM d GROUP BY n_chars),
       |cdf AS (
       |  SELECT n_chars,
       |         $cdfCols
       |  FROM counts),
       |g AS (
       |  SELECT $gapCols
       |  FROM cdf)
       |$rows
       |ORDER BY pair""".stripMargin
  }

  // ---- d62: nested scaling-law sampling ladder -------------------------------

  /** Sampling rates in basis points of the 10000-bucket hash space. */
  val LadderBps: Seq[Int] = Seq(100, 500, 1000, 2000, 5000)
  val LadderSeed = 23
  val LadderDigestSeed = 29
  /** Digest hashes are folded mod this so a BIGINT sum can never
    * overflow at any corpus size the fixtures reach (ANSI Spark would
    * throw where DuckDB's HUGEINT silently widens).
    */
  val LadderDigestMod = 1000000L

  /** d62 — the scaling-law sampling ladder: one deterministic
    * hash-threshold per document yields every subsample rate at once,
    * and the subsets NEST by construction (bucket < 100 ⊂ bucket < 500
    * ⊂ …) — the property a scaling-law study needs (each larger run's
    * corpus is a superset of the smaller's) that `randomSplit` cannot
    * give. Per rate: document count, token budget, and an
    * order-independent id digest (sum of bounded re-hashes) that pins
    * MEMBERSHIP, not just cardinality, on the oracle gate.
    *
    * Scale shape: ONE corpus scan; the five rates are conditional sums
    * folding map-side into a single partial row per partition; the
    * 5-row stack and sort are constant-size. Zero data shuffles.
    */
  def scalingLadder(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(TextHash.phash(col("doc_id").cast("string"), LadderSeed),
      lit(10000L))
    val nTok = size(TextStats.tokens(col("text"))).cast("long")
    val idh = pmod(TextHash.phash(col("doc_id").cast("string"), LadderDigestSeed),
      lit(LadderDigestMod))
    val base = Tables.documents(spark, dir)
      .select(bucket.as("b"), nTok.as("nt"), idh.as("ih"))
    val aggs = LadderBps.flatMap { r => Seq(
      sum(when(col("b") < r, 1L).otherwise(0L)).as(s"nd_$r"),
      sum(when(col("b") < r, col("nt")).otherwise(0L)).as(s"nt_$r"),
      sum(when(col("b") < r, col("ih")).otherwise(0L)).as(s"ih_$r")) }
    base.agg(aggs.head, aggs.tail: _*)
      .select(expr("stack(" + LadderBps.length + ", " +
        LadderBps.map(r => s"$r, nd_$r, nt_$r, ih_$r").mkString(", ") +
        ") as (rate_bps, n_docs, n_tokens, id_digest)"))
      .orderBy("rate_bps")
  }

  lazy val oracleScalingLadder: String = {
    val bucket = s"${TextHash.phashSql("doc_id::VARCHAR", LadderSeed)} % 10000"
    val idh = s"${TextHash.phashSql("doc_id::VARCHAR", LadderDigestSeed)} % $LadderDigestMod"
    val values = LadderBps.map(r => s"($r)").mkString(", ")
    s"""WITH d AS (
       |  SELECT $bucket AS b,
       |         len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS nt,
       |         $idh AS ih
       |  FROM documents),
       |r(rate_bps) AS (VALUES $values)
       |SELECT rate_bps,
       |  count(*) FILTER (b < rate_bps)::BIGINT AS n_docs,
       |  coalesce(sum(nt) FILTER (b < rate_bps), 0)::BIGINT AS n_tokens,
       |  coalesce(sum(ih) FILTER (b < rate_bps), 0)::BIGINT AS id_digest
       |FROM d, r
       |GROUP BY rate_bps
       |ORDER BY rate_bps""".stripMargin
  }

  // -- d69: budget-constrained quality selection ---------------------------------

  /** Token budget for d69's selected slice. */
  val SelBudget = 8192L

  /** Id-range buckets for d69's distributed prefix sum (the d44 shape). */
  val SelBuckets = 32L

  /** d69 — budget-constrained quality selection: take documents in
    * quality order (best first, doc_id tiebreak) until a token budget
    * is exhausted — THE "train on the best N tokens" primitive that
    * closes the loop between t02's scoring and d44's budget
    * arithmetic. Quality is t02's composite re-emitted as an exact
    * integer band (`q10 = 4·[n_tokens≥20] + 3·[stopword ratio] +
    * 3·[token length] ∈ {0,3,4,6,7,10}`), so the global order
    * (q10 DESC, doc_id) is integer-total and engine-independent.
    *
    * Scale shape — NO global sort, NO single-task window: the d44
    * two-pass distributed prefix sum generalized to (band, id-range
    * bucket): per-(q10, bucket) token totals (a tiny agg) fold into
    * exclusive offsets on the |bands×buckets| relation, broadcast
    * back, and each bucket computes its within-bucket running sum
    * independently. Buckets are doc_id RANGES, so bucket-then-id
    * order equals id order within a band; the budget filter prunes
    * before the presentation sort.
    */
  def budgetSelect(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // q10 IS the shared t02/d52 band (TextStats.qualityLevel) — never
    // re-spelled inline, so a tweak to the composite can't silently
    // desynchronize d69 from the rest of the quality stack.
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tok"),
        TextStats.qualityLevel(col("text")).as("q10"))
    val maxId = base.agg(max("doc_id")).head.getLong(0)
    val span = maxId / SelBuckets + 1L
    val withBucket = base.withColumn("bkt", expr(s"doc_id DIV $span"))
    val totals = withBucket.groupBy("q10", "bkt").agg(sum("n_tok").as("t"))
    // exclusive offsets over the tiny (bands × buckets) relation — the
    // single-partition window is |bands·buckets| rows, never the corpus
    val wOff = Window.orderBy(col("q10").desc, col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum("t").over(wOff), lit(0L)))
      .select("q10", "bkt", "off")
    val wIn = Window.partitionBy("q10", "bkt").orderBy("doc_id")
    withBucket.join(broadcast(offsets), Seq("q10", "bkt"))
      .withColumn("cum_tokens", col("off") + sum("n_tok").over(wIn))
      .where(col("cum_tokens") <= SelBudget)
      .select("doc_id", "q10", "n_tok", "cum_tokens")
      .orderBy("cum_tokens", "doc_id")
  }

  lazy val oracleBudgetSelect: String = {
    val toks = TextStats.toksSql
    s"""WITH q AS (
       |  SELECT doc_id,
       |         len($toks)::BIGINT AS n_tok,
       |         (${TextStats.qualityLevelSql})::INT AS q10
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, q10, n_tok,
       |         sum(n_tok) OVER (ORDER BY q10 DESC, doc_id) AS cum
       |  FROM q)
       |SELECT doc_id, q10, n_tok, cum::BIGINT AS cum_tokens
       |FROM c WHERE cum <= $SelBudget
       |ORDER BY cum_tokens, doc_id""".stripMargin
  }

  // -- d68: lexical split drift (Jensen-Shannon) --------------------------------

  /** d68 — lexical drift between the d13 splits: the Jensen-Shannon
    * divergence between every split pair's unigram distributions, plus
    * the single most-drifted term. Completes the split-drift triptych —
    * d57 tests the LENGTH distribution (scalar KS), d63 the EMBEDDING
    * centroids, d68 the VOCABULARY USAGE: an eval split can pass both
    * and still over-represent a topic's terms, which this catches
    * (JSD is bounded [0,1] in bits and symmetric, the standard corpus
    * drift number).
    *
    * Parity: counts and totals are exact BIGINTs; per-term
    * probabilities are identical rationals, and the ~vocab-sized
    * Σ p·log2(2p/(p+q)) fold rides the 6-dp round (the m21/d65 log2
    * convention). The top term is argmax of the EXACT cross-multiplied
    * gap |c_a·N_b − c_b·N_a| (tiebreak term ASC) — no float in the
    * RANKING; its operands are bounded by term-count × split-total,
    * safe far past where a ×1e6 BIGINT product would overflow. The
    * emitted per-million gap is presentation-only and derives from
    * doubles (identical IEEE trees in both engines), keeping BIGINT
    * products out of the ×1000000 step.
    *
    * Scale shape: one corpus pass to (split, word) counts (two-level
    * hash agg, map-side partials); the pair grid lives on the
    * vocab-bounded relation (|pairs|×|vocab| rows), totals broadcast.
    * 3 result rows.
    */
  def lexicalDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    val counts = Tables.documents(spark, dir)
      .withColumn("split", splitCol(col("doc_id")))
      .select(col("split"), explode(toks).as("w"))
      .groupBy("split", "w").agg(count(lit(1)).as("c"))
      .persist() // feeds totals, the vocab grid and both pair legs
    val totals = counts.groupBy("split").agg(sum("c").as("n"))
    val prs = totals.select(col("split").as("split_a"), col("n").as("n_a"))
      .join(totals.select(col("split").as("split_b"), col("n").as("n_b")),
        col("split_a") < col("split_b"))
    val vocab = counts.select("w").distinct()
    val grid = prs.crossJoin(broadcast(vocab))
      .join(broadcast(counts.select(col("split").as("split_a"), col("w"), col("c").as("ca"))),
        Seq("split_a", "w"), "left")
      .join(broadcast(counts.select(col("split").as("split_b"), col("w"), col("c").as("cb"))),
        Seq("split_b", "w"), "left")
      .select(col("split_a"), col("split_b"), col("n_a"), col("n_b"), col("w"),
        coalesce(col("ca"), lit(0L)).as("ca"), coalesce(col("cb"), lit(0L)).as("cb"))
      .where(col("ca") + col("cb") > 0)
      .persist() // |pairs|×|vocab| rows, feeds both the JSD fold and the top window
    val pa = col("ca").cast("double") / col("n_a")
    val pb = col("cb").cast("double") / col("n_b")
    val term =
      when(col("ca") > 0, pa * log2(lit(2.0) * pa / (pa + pb))).otherwise(lit(0.0)) +
      when(col("cb") > 0, pb * log2(lit(2.0) * pb / (pa + pb))).otherwise(lit(0.0))
    val gap = abs(col("ca") * col("n_b") - col("cb") * col("n_a"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("split_a", "split_b").orderBy(gap.desc, col("w"))
    // ppm is PRESENTATION-only and derives from doubles: the BIGINT
    // form `gap * 1000000 DIV (n_a*n_b)` overflows once per-split
    // token counts pass ~3e9 (and the engines fail differently —
    // Spark wraps, DuckDB raises). The RANKING stays on the exact
    // integer gap, whose operands are bounded by c·N (a term count ×
    // a split total — safe far past the corpus sizes where the ppm
    // product already blew up; bound noted here per the d68 contract).
    val ppm = floor(abs(col("ca").cast("double") * col("n_b").cast("double")
        - col("cb").cast("double") * col("n_a").cast("double")) * 1e6
      / (col("n_a").cast("double") * col("n_b").cast("double")))
    val top = grid.withColumn("rn", row_number().over(wTop)).filter(col("rn") === 1)
      .select(col("split_a"), col("split_b"), col("w").as("top_term"),
        ppm.as("top_gap_ppm"))
    grid.groupBy("split_a", "split_b", "n_a", "n_b")
      .agg(round(sum(term) / 2.0, 6).as("jsd"))
      .join(broadcast(top), Seq("split_a", "split_b"))
      .select("split_a", "split_b", "n_a", "n_b", "jsd", "top_term", "top_gap_ppm")
      .orderBy("split_a", "split_b")
  }

  lazy val oracleLexicalDrift: String = {
    val splitCase = splitCaseSql("doc_id")
    val toks = TextStats.toksSql
    s"""WITH d AS (
       |  SELECT $splitCase AS split, unnest($toks) AS w FROM documents),
       |c AS (SELECT split, w, count(*)::BIGINT AS c FROM d GROUP BY 1, 2),
       |n AS (SELECT split, sum(c)::BIGINT AS n FROM c GROUP BY 1),
       |pr AS (
       |  SELECT a.split AS split_a, b.split AS split_b, a.n AS n_a, b.n AS n_b
       |  FROM n a JOIN n b ON a.split < b.split),
       |v AS (SELECT DISTINCT w FROM c),
       |g AS (
       |  SELECT pr.split_a, pr.split_b, pr.n_a, pr.n_b, v.w,
       |         coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
       |  FROM pr CROSS JOIN v
       |  LEFT JOIN c ca ON ca.split = pr.split_a AND ca.w = v.w
       |  LEFT JOIN c cb ON cb.split = pr.split_b AND cb.w = v.w
       |  WHERE coalesce(ca.c, 0) + coalesce(cb.c, 0) > 0),
       |t AS (
       |  SELECT split_a, split_b, n_a, n_b,
       |    CASE WHEN ca > 0 THEN (ca::DOUBLE / n_a)
       |         * log2(2.0 * (ca::DOUBLE / n_a) / ((ca::DOUBLE / n_a) + (cb::DOUBLE / n_b)))
       |         ELSE 0.0 END +
       |    CASE WHEN cb > 0 THEN (cb::DOUBLE / n_b)
       |         * log2(2.0 * (cb::DOUBLE / n_b) / ((ca::DOUBLE / n_a) + (cb::DOUBLE / n_b)))
       |         ELSE 0.0 END AS term,
       |    abs(ca * n_b - cb * n_a) AS gap,
       |    floor(abs(ca::DOUBLE * n_b::DOUBLE - cb::DOUBLE * n_a::DOUBLE)
       |          * 1000000.0 / (n_a::DOUBLE * n_b::DOUBLE))::BIGINT AS gap_ppm, w
       |  FROM g),
       |top AS (
       |  SELECT split_a, split_b, w AS top_term, gap_ppm AS top_gap_ppm FROM (
       |    SELECT split_a, split_b, w, gap_ppm,
       |           row_number() OVER (PARTITION BY split_a, split_b
       |                              ORDER BY gap DESC, w) AS rn
       |    FROM t) WHERE rn = 1)
       |SELECT s.split_a, s.split_b, s.n_a, s.n_b, s.jsd, top.top_term, top.top_gap_ppm
       |FROM (
       |  SELECT split_a, split_b, n_a, n_b, round(sum(term) / 2.0, 6) AS jsd
       |  FROM t GROUP BY 1, 2, 3, 4) s
       |JOIN top USING (split_a, split_b)
       |ORDER BY split_a, split_b""".stripMargin
  }
}
