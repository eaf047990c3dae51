package graft.llm

import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: language ID
  * (marker-token scoring), quality scoring (length/punct/stopword
  * ratios), token counting and document fingerprinting.
  *
  * Everything is codegen'd builtins (regexp_extract_all + higher-order
  * array functions) — no UDFs — and every ratio is a quotient of
  * integers computed identically in both engines, so outputs need no
  * rounding to hash-match the oracle.
  */
object TextStats {

  /** Marker lexicons per language (tiny stopword sets). Scoring is
    * count-of-marker-tokens; argmax with a fixed precedence order
    * breaks ties deterministically. (The fixture's `lang` labels are
    * synthetic and uncorrelated with its shared vocabulary — the
    * operator's contract is the deterministic classifier, verified by
    * the oracle, not label recovery.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "zu"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "he"))

  // call_function keeps this a plain expression tree — no SQL-text
  // splicing, so aliased/derived input columns work (the reference's
  // F8 f-string wart, avoided per SURVEY.md §2.8)
  private[graft] def tokens(text: Column): Column =
    call_function("regexp_extract_all", lower(text), lit("[a-z0-9]+"), lit(0))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(m => t === m).reduce(_ || _)))

  /** t01 — heuristic language ID: score = marker-token count per
    * language; predict the max-scoring language, ties broken by
    * [[LangMarkers]] order; no markers at all → "und" (undetermined).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val scoreCols = LangMarkers.map { case (lang, ms) =>
      markerCount(toks, ms).as(s"score_$lang")
    }
    val langs = LangMarkers.map(_._1)
    // argmax with earlier-language precedence on ties
    val best = langs.zipWithIndex.foldRight(lit("und")) { case ((lang, i), elseCol) =>
      val isMax = langs.drop(i + 1).foldLeft(col(s"score_$lang") > 0: Column) {
        (acc, other) => acc && col(s"score_$lang") >= col(s"score_$other")
      }
      val beatsEarlier = langs.take(i).foldLeft(isMax) {
        (acc, earlier) => acc && col(s"score_$lang") > col(s"score_$earlier")
      }
      when(beatsEarlier, lit(lang)).otherwise(elseCol)
    }
    Tables.documents(spark, dir)
      .select((col("doc_id") +: scoreCols): _*)
      .withColumn("pred_lang", best)
      .orderBy("doc_id")
  }

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  /** t02 — quality scoring: token counts, mean token length, non-alnum
    * ratio, stopword ratio, and a composite quality score. All ratios
    * are int/int (identical in both engines); the composite is a fixed
    * arithmetic expression of those ratios.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        size(toks).as("n_tokens"),
        aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x).as("alnum_chars"),
        markerCount(toks, Stopwords).as("n_stop"))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        (col("alnum_chars").cast("double") / col("n_tokens")).as("mean_token_len"),
        ((col("n_chars") - col("alnum_chars")).cast("double") / col("n_chars")).as("nonalnum_ratio"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stopword_ratio"))
      .withColumn("quality",
        when(col("n_tokens") >= 20, lit(1.0)).otherwise(lit(0.0)) * lit(0.4)
          + when(col("stopword_ratio").between(0.05, 0.5), lit(1.0)).otherwise(lit(0.0)) * lit(0.3)
          + when(col("mean_token_len").between(3.0, 10.0), lit(1.0)).otherwise(lit(0.0)) * lit(0.3))
      .orderBy("doc_id")
  }

  /** t03 — token counting: whitespace tokens, word tokens, distinct
    * words, and a BPE-ish subword estimate (⌈alnum_chars/4⌉ — the
    * common ~4-chars-per-token heuristic, integer arithmetic only).
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(call_function("regexp_extract_all", col("text"), lit("\\S+"), lit(0))).as("n_ws_tokens"),
        size(toks).as("n_words"),
        size(array_distinct(toks)).as("n_distinct_words"),
        aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x).as("alnum_chars"))
      .withColumn("est_bpe_tokens", expr("cast((alnum_chars + 3) div 4 as int)"))
      .orderBy("doc_id")
  }

  /** t04 — document fingerprint: min-hash + xor-fold over the distinct
    * 8-gram shingle hashes (order-independent content signature; the
    * rolling-hash shingles come from [[TextHash.shingles]]). Computed
    * as per-row array folds — no explode, no aggregate, no shuffle;
    * min and xor are order-independent so the fold equals the oracle's
    * grouped min/bit_xor exactly.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextHash.hashedShingles(col("text"), 0).as("hs"))
      .select(col("doc_id"),
        array_min(col("hs")).as("fp_min"),
        aggregate(col("hs"), lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("fp_xor"),
        size(col("hs")).cast("long").as("n_shingles"))
      .orderBy("doc_id")

  // ---- DuckDB oracles -------------------------------------------------------

  private val toksSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  private def markerCountSql(markers: Seq[String]): String =
    s"len(list_filter($toksSql, t -> t IN (${markers.map(m => s"'$m'").mkString(", ")})))::INT"

  val oracleLangId: String = {
    val langs = LangMarkers.map(_._1)
    val scoreCols = LangMarkers.map { case (lang, ms) =>
      s"${markerCountSql(ms)} AS score_$lang"
    }.mkString(",\n         ")
    val best = langs.zipWithIndex.reverse.foldLeft("'und'") { case (elseSql, (lang, i)) =>
      val geLater = langs.drop(i + 1).map(o => s"score_$lang >= score_$o")
      val gtEarlier = langs.take(i).map(e => s"score_$lang > score_$e")
      val conds = (s"score_$lang > 0" +: (geLater ++ gtEarlier)).mkString(" AND ")
      s"CASE WHEN $conds THEN '$lang' ELSE $elseSql END"
    }
    s"""WITH s AS (
       |  SELECT doc_id,
       |         $scoreCols
       |  FROM documents)
       |SELECT doc_id, ${langs.map(l => s"score_$l").mkString(", ")},
       |       $best AS pred_lang
       |FROM s
       |ORDER BY doc_id""".stripMargin
  }

  val oracleQuality: String = {
    s"""WITH s AS (
       |  SELECT doc_id, n_chars,
       |         len($toksSql)::INT AS n_tokens,
       |         list_sum(list_transform($toksSql, t -> length(t)))::INT AS alnum_chars,
       |         ${markerCountSql(Stopwords)} AS n_stop
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, n_chars, n_tokens,
       |         alnum_chars::DOUBLE / n_tokens AS mean_token_len,
       |         (n_chars - alnum_chars)::DOUBLE / n_chars AS nonalnum_ratio,
       |         n_stop::DOUBLE / n_tokens AS stopword_ratio
       |  FROM s)
       |SELECT doc_id, n_chars, n_tokens, mean_token_len, nonalnum_ratio, stopword_ratio,
       |       (CASE WHEN n_tokens >= 20 THEN 1.0 ELSE 0.0 END) * 0.4
       |       + (CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.5 THEN 1.0 ELSE 0.0 END) * 0.3
       |       + (CASE WHEN mean_token_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END) * 0.3
       |         AS quality
       |FROM r
       |ORDER BY doc_id""".stripMargin
  }

  val oracleTokenStats: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '\\S+'))::INT AS n_ws_tokens,
       |  len($toksSql)::INT AS n_words,
       |  len(list_distinct($toksSql))::INT AS n_distinct_words,
       |  list_sum(list_transform($toksSql, t -> length(t)))::INT AS alnum_chars,
       |  ((list_sum(list_transform($toksSql, t -> length(t)))::INT + 3) // 4)::INT AS est_bpe_tokens
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  val oracleFingerprint: String =
    s"""WITH h AS (
       |  SELECT DISTINCT doc_id, unnest(${TextHash.hashedShinglesSql("text", 0)}) AS h
       |  FROM documents)
       |SELECT doc_id, min(h) AS fp_min, bit_xor(h) AS fp_xor, count(*) AS n_shingles
       |FROM h GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
}
