package graft.llm

import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t11 — a real (learned) BPE tokenizer, replacing t03's chars/4
  * estimate: merge rules are LEARNED from the corpus word-frequency
  * table, then every document is encoded with them — the actual
  * byte-pair-encoding loop (Sennrich et al. 2016), deterministic and
  * oracle-reproducible.
  *
  * Tokenization state is a pipe-delimited symbol string per word
  * (`"hash"` → `"|h|a|s|h|"`). One merge rule (a,b) is applied as TWO
  * literal `replace(s, "|a|b|", "|ab|")` passes: a single left-to-right
  * non-overlapping pass cannot rewrite two occurrences sharing a
  * delimiter (`…|a|b|a|b|…`), and the second pass catches exactly those
  * — after pass one every remaining occurrence is isolated. Literal
  * replace-all has identical leftmost/non-overlapping semantics in
  * Spark (UTF8String.replace) and DuckDB, so learning and encoding
  * agree bit-for-bit across engines.
  *
  * Scale shape: learning loops over the WORD-TYPE table (vocab-sized —
  * orders of magnitude smaller than the corpus; the standard way BPE
  * training scales), one tiny aggregate + argmax per merge. Encoding
  * is pure map-side:
  * the learned merges become literals in a per-row `transform` over the
  * in-row word array — no explode, no shuffle, no UDF.
  */
object Bpe {

  val NumMerges = 16

  case class Merge(a: String, b: String)

  /** "hash" → "|h|a|s|h|" (initial symbol string: one char per symbol). */
  private def charSplit(w: Column): Column =
    concat(regexp_replace(w, "(.)", "|$1"), lit("|"))

  /** Two-pass literal application of one merge rule (see object doc). */
  private def applyMerge(s: Column, m: Merge): Column = {
    val pat = lit(s"|${m.a}|${m.b}|")
    val rep = lit(s"|${m.a}${m.b}|")
    call_function("replace", call_function("replace", s, pat, rep), pat, rep)
  }

  /** Adjacent symbol pairs of one tokenization string, as structs; the
    * split of "|a|b|" is ["", a, b, ""] so symbols sit at 1-based
    * positions 2..size-1 and pairs at (i, i+1) for i in 2..size-2.
    * Words of one symbol (size < 4) contribute no pairs — guarded so
    * `sequence` never counts down (ANSI element_at would throw).
    */
  private def pairStructs(s: Column): Column = {
    val arr = split(s, "\\|")
    when(size(arr) >= 4,
      transform(sequence(lit(2), size(arr) - 2), i =>
        struct(element_at(arr, i).as("a"), element_at(arr, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
  }

  /** Learn up to [[NumMerges]] merge rules from the corpus: each round
    * takes the most frequent adjacent symbol pair over the word-type
    * table (weighted by word frequency; ties → lexicographic (a, b)),
    * rewrites the table, repeats. A driver loop of vocab-sized
    * aggregates — ONE action per round (the argmax collect), like the
    * CC loop's convergence scalar. Only the corpus-wide word count is
    * checkpointed up front; each round's rewrite is then eagerly
    * re-checkpointed so round i's aggregate always reads a 1-replace-
    * deep plan. (Rounds reference the previous round ONCE, so unlike
    * the CC loop there is no exponential-lineage hazard — but without
    * truncation round i re-derives i stacked replaces and recompiles
    * an i-deep codegen stage, and 16 growing compiles dominated the
    * bench cost of the whole query. The checkpoint is a vocab-sized
    * materialization — microscopic next to a codegen compile.)
    */
  /** Merges are deterministic per corpus dir; with two consumers now
    * (t11 encode, t28 fertility) the 16-round driver-sequenced learn
    * loop is cached like [[Similarity.lloydCentroids]] — train once,
    * encode many.
    */
  private val MergeCacheCap = 8
  private val mergeCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Seq[Merge]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[Merge]]): Boolean =
        size() > MergeCacheCap
    })

  def learnMerges(spark: SparkSession, dir: String): Seq[Merge] = {
    val cached = mergeCache.get(dir)
    if (cached != null) return cached
    val computed = learnMergesUncached(spark, dir)
    mergeCache.put(dir, computed)
    computed
  }

  private def learnMergesUncached(spark: SparkSession, dir: String): Seq[Merge] = {
    var vocab = Tables.documents(spark, dir)
      .select(explode(TextStats.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(charSplit(col("w")).as("s"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.Buffer[Merge]()
    var exhausted = false
    while (!exhausted && merges.size < NumMerges) {
      val best = vocab
        .select(col("freq"), explode(pairStructs(col("s"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val m = Merge(best(0).getString(0), best(0).getString(1))
        merges += m
        vocab = vocab.select(applyMerge(col("s"), m).as("s"), col("freq")).localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Encode one word column with the learned rules, in learned order. */
  private[graft] def encodeWord(w: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(charSplit(w))(applyMerge)

  /** t11 — learn on the corpus, encode every document: word count, true
    * BPE token count, and the md5 of the full encoded form (proves the
    * token STREAM is identical, not just its length). Encoding is
    * in-row over the word array — order preserved without any shuffle.
    */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val merges = learnMerges(spark, dir)
    val symLen: Column => Column = s => size(split(s, "\\|")) - 2
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextStats.tokens(col("text")).as("ws"))
      // materialize the encoded-word array ONCE per row — the encode
      // expression is 2·NumMerges replaces deep, and building it into
      // both downstream columns would double codegen and evaluation
      .select(col("doc_id"), size(col("ws")).as("n_words"),
        transform(col("ws"), w => encodeWord(w, merges)).as("es"))
      .select(col("doc_id"), col("n_words"),
        aggregate(transform(col("es"), symLen), lit(0L), (acc, x) => acc + x)
          .as("n_bpe_tokens"),
        md5(concat_ws(" ", col("es"))).as("enc_md5"))
      .orderBy("doc_id")
  }

  /** The oracle learns the SAME merges in SQL: K chained materialized
    * CTE rounds (pair-count argmax per round — `MATERIALIZED` because
    * each round references the previous twice, and inlined expansion
    * would be exponential), then encodes with the same double-replace.
    * Rounds past vocabulary exhaustion coalesce to a no-op pattern
    * ('~' can never match — symbols are [a-z0-9|] only).
    */
  /** Shared CTE prefix for every BPE oracle: learn the K merges in SQL
    * and produce `enc` = ($cols, es) over documents. `cols` lets each
    * consumer carry the grouping columns it needs (t11: doc_id; t28:
    * lang + exact char mass).
    */
  private def encPrefixSql(cols: String): String = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val parts = scala.collection.mutable.Buffer[String]()
    parts += s"""v0 AS MATERIALIZED (
      |  SELECT '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s, freq
      |  FROM (SELECT w, count(*) AS freq
      |        FROM (SELECT unnest($toks) AS w FROM documents) GROUP BY w))""".stripMargin
    for (i <- 1 to NumMerges) {
      parts += s"""m$i AS MATERIALIZED (SELECT a, b FROM (
        |  SELECT l[j] AS a, l[j+1] AS b, sum(freq) AS cnt
        |  FROM (SELECT string_split(s, '|') AS l, freq FROM v${i - 1}),
        |       LATERAL (SELECT unnest(range(2, len(l) - 1)) AS j) u
        |  GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1))""".stripMargin
      if (i < NumMerges)
        parts += s"""v$i AS MATERIALIZED (
          |  SELECT replace(replace(s, pr.p, pr.r), pr.p, pr.r) AS s, freq
          |  FROM v${i - 1},
          |       (SELECT coalesce((SELECT '|'||a||'|'||b||'|' FROM m$i), '~') AS p,
          |               coalesce((SELECT '|'||a||b||'|' FROM m$i), '') AS r) pr)""".stripMargin
    }
    val mtCols = (1 to NumMerges).map { i =>
      s"coalesce((SELECT '|'||a||'|'||b||'|' FROM m$i), '~') AS p$i, " +
        s"coalesce((SELECT '|'||a||b||'|' FROM m$i), '') AS r$i"
    }.mkString(",\n         ")
    parts += s"mt AS (SELECT $mtCols)"
    val encExpr = (1 to NumMerges).foldLeft(
      s"'|' || regexp_replace(w, '(.)', '\\1|', 'g')") {
      (acc, i) => s"replace(replace($acc, p$i, r$i), p$i, r$i)"
    }
    parts += s"""enc AS (
      |  SELECT $cols, list_transform($toks, w -> $encExpr) AS es
      |  FROM documents, mt)""".stripMargin
    s"WITH ${parts.mkString(",\n")}"
  }

  val oracleBpeTokens: String =
    s"""${encPrefixSql("doc_id")}
      |SELECT doc_id,
      |  len(es)::INT AS n_words,
      |  CAST(coalesce(list_sum(list_transform(es, s -> len(string_split(s, '|')) - 2)), 0) AS BIGINT) AS n_bpe_tokens,
      |  md5(array_to_string(es, ' ')) AS enc_md5
      |FROM enc
      |ORDER BY doc_id""".stripMargin

  /** t28 — tokenizer fertility per language: alnum chars per BPE token
    * and BPE tokens per word (integer ×1000), from the SAME learned
    * tokenizer as t11. The eval a tokenizer owner reads per language:
    * fertility collapsing toward 1000 (1 char/token) means the merges
    * don't cover that language and its docs cost ~1 token per char.
    *
    * Plan shape: the t11 in-row encode (2·K replaces, no shuffle),
    * then ONE |langs|-row aggregate. All ratios integer ×1000.
    */
  def fertility(spark: SparkSession, dir: String): DataFrame = {
    val merges = learnMerges(spark, dir)
    val symLen: Column => Column = s => size(split(s, "\\|")) - 2
    Tables.documents(spark, dir)
      .select(col("lang"), TextStats.tokens(col("text")).as("ws"))
      .select(col("lang"),
        size(col("ws")).cast("long").as("nw"),
        aggregate(transform(col("ws"), w => length(w).cast("long")),
          lit(0L), (a, x) => a + x).as("nc"),
        aggregate(transform(col("ws"), w => symLen(encodeWord(w, merges)).cast("long")),
          lit(0L), (a, x) => a + x).as("nbpe"))
      .groupBy("lang")
      .agg(sum("nw").as("n_words"), sum("nc").as("n_chars"),
        sum("nbpe").as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_chars"), col("n_bpe_tokens"),
        when(col("n_bpe_tokens") > 0, expr("n_chars * 1000 div n_bpe_tokens"))
          .otherwise(0L).as("chars_per_token_x1000"),
        when(col("n_words") > 0, expr("n_bpe_tokens * 1000 div n_words"))
          .otherwise(0L).as("tokens_per_word_x1000"))
      .orderBy("lang")
  }

  val oracleFertility: String = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val ncExpr =
      s"CAST(coalesce(list_sum(list_transform($toks, w -> length(w))), 0) AS BIGINT)"
    s"""${encPrefixSql(s"lang, $ncExpr AS nc")}
      |, f AS (
      |  SELECT lang,
      |    sum(len(es))::BIGINT AS n_words,
      |    sum(nc)::BIGINT AS n_chars,
      |    sum(coalesce(list_sum(list_transform(es, s -> len(string_split(s, '|')) - 2)), 0))::BIGINT AS n_bpe_tokens
      |  FROM enc GROUP BY lang)
      |SELECT lang, n_words, n_chars, n_bpe_tokens,
      |  (CASE WHEN n_bpe_tokens > 0 THEN n_chars * 1000 // n_bpe_tokens ELSE 0 END)::BIGINT AS chars_per_token_x1000,
      |  (CASE WHEN n_words > 0 THEN n_bpe_tokens * 1000 // n_words ELSE 0 END)::BIGINT AS tokens_per_word_x1000
      |FROM f
      |ORDER BY lang""".stripMargin
  }
}
