package graft.llm

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** t34 — TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
  * over the corpus-level word co-occurrence graph. Vertices are vocab
  * terms, an (undirected, unweighted) edge links every pair of terms
  * that appear ADJACENT anywhere in the corpus; the stationary mass
  * ranks terms by how centrally they sit in the corpus's phrase
  * structure — the unsupervised keyword signal a curation pass uses to
  * label domains and spot template vocabularies (a term with high
  * PageRank but low raw frequency is connective tissue; high frequency
  * but low rank is isolated boilerplate).
  *
  * Runs on [[Graph.pageRankOnPairs]] — the SAME integer fixed-point
  * recurrence d36 runs on the near-dup graph ([[Graph.PrScale]] units,
  * truncating divisions, [[Graph.PrIters]] rounds), so the DuckDB
  * oracle unrolls the identical rounds ([[Graph.prRoundsSql]]) and
  * hash-matches bit-for-bit.
  *
  * Scale shape (100 TB): the heavy part is the corpus pass — one
  * zip_with over each doc's token array, exploded to adjacency pairs,
  * then a distinct that folds corpus-mass down to O(vocab²)-bounded
  * edges (in practice Zipf-sparse: far smaller). The power iteration
  * then runs entirely on that compact graph, never touching the corpus
  * again; per round it is one equi-join + keyed sum on |edges| rows.
  * Only the top-[[TopK]] report leaves the cluster.
  */
object TextRank {

  val TopK = 20

  /** Distinct canonical (u < v) adjacent-term pairs over the corpus. */
  private[llm] def cooccurEdges(spark: SparkSession, dir: String): DataFrame = {
    val tok = TextStats.tokens(col("text"))
    Tables.documents(spark, dir)
      .select(explode(zip_with(
        slice(tok, lit(1), greatest(size(tok) - 1, lit(0))),
        slice(tok, lit(2), greatest(size(tok) - 1, lit(0))),
        (a, b) => struct(least(a, b).as("u"), greatest(a, b).as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  def keywords(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("pr").desc, col("id"))
    // ONE corpus pass: the edge list is vocab²-bounded and feeds the
    // vertex derivation + every iteration round — eager-checkpoint it
    // so the loop machinery never re-runs the explode+distinct
    val edges = cooccurEdges(spark, dir).localCheckpoint()
    Graph.pageRankOnPairs(edges)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("id").as("word"), col("deg"), col("pr"), col("rank"))
      .orderBy("rank")
  }

  /** Same graph, same unrolled integer recurrence, in SQL. */
  lazy val oracleKeywords: String = {
    val toks = TextStats.toksSql
    s"""WITH d AS (SELECT $toks AS t FROM documents),
       |bi AS (
       |  SELECT unnest([t[i] || ' ' || t[i + 1] FOR i IN range(1, len(t))]) AS b
       |  FROM d),
       |e0 AS (
       |  SELECT DISTINCT
       |    least(split_part(b, ' ', 1), split_part(b, ' ', 2)) AS u,
       |    greatest(split_part(b, ' ', 1), split_part(b, ' ', 2)) AS v
       |  FROM bi
       |  WHERE split_part(b, ' ', 1) <> split_part(b, ' ', 2)),
       |edges AS MATERIALIZED (
       |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       |deg AS MATERIALIZED (SELECT u AS id, count(*) AS deg FROM edges GROUP BY 1),
       |nodes AS (SELECT id FROM deg),
       |meta AS (
       |  SELECT count(*) AS n,
       |         ((${Graph.PrScale} * 15) // 100) // count(*) AS tele
       |  FROM nodes),
       |it0 AS (SELECT id, ${Graph.PrScale} // (SELECT n FROM meta) AS r FROM nodes),
       |${Graph.prRoundsSql}
       |SELECT p.id AS word, d.deg, p.r AS pr,
       |  CAST(row_number() OVER (ORDER BY p.r DESC, p.id) AS INT) AS rank
       |FROM it${Graph.PrIters} p JOIN deg d ON d.id = p.id
       |QUALIFY rank <= $TopK
       |ORDER BY rank""".stripMargin
  }
}
