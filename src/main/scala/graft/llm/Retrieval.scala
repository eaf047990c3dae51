package graft.llm

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** t19 — inverted-index keyword retrieval with BM25 ranking
  * (Robertson & Zaragoza, "The Probabilistic Relevance Framework:
  * BM25 and Beyond", 2009; the Lucene `1 + (N−df+0.5)/(df+0.5)` idf
  * form). The pipeline-side use: given a training corpus, retrieve
  * the top documents for audit terms (contamination probes, topic
  * spot-checks) without scanning text — the posting-list shape every
  * search-adjacent data pipeline needs.
  *
  * Query terms are derived deterministically from the corpus itself:
  * the [[QueryTerms]] words whose document frequency is closest to
  * N/10 (ties → lexicographic) — selective enough to rank, guaranteed
  * non-empty at every SF.
  *
  * Float discipline (the t06 pattern): the BM25 score is INTERNAL —
  * ranking only. Emitted columns are the bit-exact integers (tf, df,
  * dl) plus rank. ln differs by ≤ 1 ulp between engines on ~0.06% of
  * inputs, so a rank flip would need two distinct (tf, df, dl)
  * combinations scoring within 1 ulp at the top-k boundary; equal
  * combinations score identically and fall to the doc_id tiebreak.
  * Gate-verified at all three SFs.
  *
  * Scale shape (100 TB): `tf` is one explode + hash aggregate (the
  * inverted index — at production scale a staged artifact, cf. the
  * ci_* index family); `df`/`avgdl`/`N` are vocab-sized /1-row
  * aggregates; the query-term set (a handful of rows) BROADCASTS onto
  * the tf relation, so only the probed terms' postings leave the
  * scan, and the per-term top-k is a windowed rank over those
  * postings only — no global sort, no all-doc shuffle.
  */
object Retrieval {

  val QueryTerms = 5
  val TopK = 10
  val K1 = 1.2
  val B = 0.75

  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .persist()
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val qterms = df.crossJoin(broadcast(stats.select("n_docs")))
      .withColumn("sel", abs(col("df") * 10 - col("n_docs")))
      .orderBy(col("sel"), col("word"))
      .limit(QueryTerms)
      .select("word", "df")
    val avgdl = col("total_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
    val w = Window.partitionBy("word").orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qterms), Seq("word"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("score", idf * tfNorm)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("word", "rank", "doc_id", "tf", "df", "dl")
      .orderBy("word", "rank")
  }

  val oracleBm25TopK: String =
    s"""WITH tf AS (
       |  SELECT doc_id, w AS word, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
       |        FROM documents)
       |  GROUP BY doc_id, w),
       |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n_docs, sum(dl)::BIGINT AS total_dl FROM dl),
       |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
       |qterms AS (
       |  SELECT word, df FROM df CROSS JOIN stats
       |  ORDER BY abs(df * 10 - n_docs), word
       |  LIMIT $QueryTerms),
       |scored AS (
       |  -- float literals ::DOUBLE (DuckDB parses bare decimals as
       |  -- DECIMAL) and constants pre-folded exactly as the Scala side
       |  -- folds them, so both engines run the same IEEE op sequence
       |  SELECT tf.word, tf.doc_id, tf.tf, q.df, dl.dl,
       |         ln(1.0::DOUBLE + (s.n_docs - q.df + 0.5::DOUBLE) / (q.df + 0.5::DOUBLE))
       |           * (tf.tf * ${K1 + 1.0}::DOUBLE)
       |           / (tf.tf + $K1::DOUBLE * (${1.0 - B}::DOUBLE + $B::DOUBLE * dl.dl / (s.total_dl::DOUBLE / s.n_docs)))
       |           AS score
       |  FROM tf
       |  JOIN qterms q USING (word)
       |  JOIN dl USING (doc_id)
       |  CROSS JOIN stats s),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY word ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |SELECT word, rank, doc_id, tf, df, dl
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY word, rank""".stripMargin
}
