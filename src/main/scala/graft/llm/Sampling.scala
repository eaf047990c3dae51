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
}
