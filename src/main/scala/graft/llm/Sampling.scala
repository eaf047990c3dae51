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
}
