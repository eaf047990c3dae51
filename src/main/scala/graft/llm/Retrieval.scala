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
    val w = Window.partitionBy("word").orderBy(col("score").desc, col("doc_id"))
    scoredPostings(spark, dir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("word", "rank", "doc_id", "tf", "df", "dl")
      .orderBy("word", "rank")
  }

  private def scoredPostings(spark: SparkSession, dir: String): DataFrame =
    scoredPostingsWithCache(spark, dir)._1

  /** The probed postings with their BM25 score (internal double) —
    * shared by t19's per-term top-k and t21's diversified pool. Also
    * returns the persisted tf relation so an eagerly-materializing
    * caller (t21) can release it once its checkpoint lands.
    */
  private def scoredPostingsWithCache(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
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
    (tf.join(broadcast(qterms), Seq("word"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("score", idf * tfNorm)
      .select("word", "doc_id", "tf", "df", "dl", "score"), tf)
  }

  /** WITH-body down to the BM25 `scored` postings — shared by the t19
    * and t21 oracles.
    */
  private val bm25CtesSql: String =
    s"""tf AS (
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
       |  CROSS JOIN stats s)""".stripMargin

  val oracleBm25TopK: String =
    s"""WITH $bm25CtesSql,
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY word ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |SELECT word, rank, doc_id, tf, df, dl
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY word, rank""".stripMargin

  val MmrPool   = 10  // diversified selection draws from the BM25 top-10
  val MmrK      = 5   // picks per query term
  val MmrLambda = 0.5 // relevance/diversity balance

  /** t21 — MMR-diversified retrieval (Carbonell & Goldstein, SIGIR'98):
    * greedily re-rank each query term's BM25 pool so every next pick
    * maximizes `λ·rel − (1−λ)·max cosine to the already-picked` — the
    * de-dup step a RAG pipeline runs so its context window isn't five
    * near-identical passages. Relevance is the integer-derived
    * `(pool+1−rank)/pool` (the BM25 ORDER is gate-proven; reusing the
    * float score would put ln() parity back on the hook), diversity is
    * the d06 rounded cosine over the document embeddings.
    *
    * Scale shape: the pool is `queries × MmrPool` rows (BM25 prunes
    * the corpus first — only probed postings with embeddings are
    * ranked), so each of the MmrK−1 greedy rounds is a join between
    * two bounded relations; corpus cost is t19's posting probe plus
    * one embeddings equi-join, both broadcast-pruned. The loop is
    * K-bounded, independent of corpus size.
    */
  def mmrTopK(spark: SparkSession, dir: String): DataFrame = {
    import graft.expr.VectorFunctions.cosineSimilarity
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val wPool = Window.partitionBy("word").orderBy(col("score").desc, col("doc_id"))
    val (postings, tfCache) = scoredPostingsWithCache(spark, dir)
    val pool = postings
      .join(emb, Seq("doc_id"))
      .withColumn("prank", row_number().over(wPool))
      .filter(col("prank") <= MmrPool)
      .select(col("word"), col("doc_id"),
        ((lit(MmrPool + 1) - col("prank")).cast("double") / lit(MmrPool.toDouble)).as("rel"),
        col("embedding"))
      .localCheckpoint() // scanned by every greedy round
    tfCache.unpersist() // pool is materialized; the posting cache can go
    var selected = pool.filter(col("rel") === 1.0)
      .select(col("word"), col("doc_id"), col("embedding"), lit(1L).as("pick"))
      .localCheckpoint()
    (2 to MmrK).foreach { step =>
      val cand = pool.join(selected.select("word", "doc_id"), Seq("word", "doc_id"), "left_anti")
      val simmed = cand
        .join(selected.select(col("word"), col("embedding").as("se")), Seq("word"))
        .groupBy("word", "doc_id", "rel")
        .agg(max(round(cosineSimilarity(col("embedding"), col("se")), 6)).as("maxsim"))
      val wPick = Window.partitionBy("word").orderBy(
        (lit(MmrLambda) * col("rel") - lit(1 - MmrLambda) * col("maxsim")).desc, col("doc_id"))
      val pick = simmed.withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
        .select("word", "doc_id")
        .join(pool.select("word", "doc_id", "embedding"), Seq("word", "doc_id"))
        .select(col("word"), col("doc_id"), col("embedding"), lit(step.toLong).as("pick"))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected.select(col("word"), col("pick"), col("doc_id")).orderBy("word", "pick")
  }

  /** The greedy selection unrolled step-by-step (the d36 oracle
    * pattern): `all_k` carries everything picked through step k.
    */
  lazy val oracleMmrTopK: String = {
    val steps = (2 to MmrK).map { k =>
      s"""sel$k AS (
         |  SELECT word, doc_id FROM (
         |    SELECT c.word, c.doc_id,
         |           row_number() OVER (PARTITION BY c.word
         |             ORDER BY $MmrLambda::DOUBLE * c.rel
         |                      - ${1 - MmrLambda}::DOUBLE * c.maxsim DESC,
         |                    c.doc_id) AS rn
         |    FROM (
         |      SELECT p.word, p.doc_id, p.rel,
         |             max(round(list_cosine_similarity(p.embedding::DOUBLE[],
         |                                              a.embedding::DOUBLE[]), 6)) AS maxsim
         |      FROM pool p
         |      JOIN all${k - 1} a USING (word)
         |      WHERE NOT EXISTS (SELECT 1 FROM all${k - 1} x
         |                        WHERE x.word = p.word AND x.doc_id = p.doc_id)
         |      GROUP BY p.word, p.doc_id, p.rel) c)
         |  WHERE rn = 1),
         |all$k AS (
         |  SELECT word, doc_id, embedding, pick FROM all${k - 1}
         |  UNION ALL
         |  SELECT p.word, p.doc_id, p.embedding, $k AS pick
         |  FROM pool p JOIN sel$k USING (word, doc_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH $bm25CtesSql,
       |pool AS (
       |  SELECT word, doc_id, ($MmrPool + 1 - prank)::DOUBLE / $MmrPool AS rel, embedding
       |  FROM (SELECT s.word, s.doc_id, e.embedding,
       |               row_number() OVER (PARTITION BY s.word
       |                                  ORDER BY s.score DESC, s.doc_id) AS prank
       |        FROM scored s JOIN embeddings e ON e.vec_id = s.doc_id)
       |  WHERE prank <= $MmrPool),
       |all1 AS (
       |  SELECT word, doc_id, embedding, 1 AS pick FROM pool WHERE rel = 1.0::DOUBLE),
       |$steps
       |SELECT word, pick::BIGINT AS pick, doc_id
       |FROM all$MmrK
       |ORDER BY word, pick""".stripMargin
  }
}
