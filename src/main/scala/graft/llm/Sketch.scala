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

  /** (d, bucket) struct per depth row for a word column. */
  private def cellKeys(word: Column): Column =
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
}
