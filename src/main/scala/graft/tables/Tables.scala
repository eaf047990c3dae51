package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Explicit schemas + loaders for the driver testdata tables
  * (TESTDATA.md / FIXTURES.md §B) and the reference's domain tables
  * (FIXTURES.md §A).
  *
  * Design stance (SURVEY.md §1.2): schema-on-read is always *declared*,
  * never inferred — mirroring the reference's explicit dtype maps
  * (reference `0_insert_conso_an_ville_in_bq.py:43-47`). For Parquet the
  * footer schema is authoritative; we still centralize loaders so every
  * query reads through one audited path and column pruning/pushdown can
  * be asserted in one place.
  */
object Tables {

  // -- driver testdata (TPC-H-ish star schema) ------------------------------

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")

  /** `events.ts` has shipped in two physical layouts across driver
    * testdata generations: INT64 TIMESTAMP(NANOS) — which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]) unless read as raw
    * Long via `spark.sql.legacy.parquet.nanosAsLong` — and plain
    * timestamp[us] without timezone, which Spark reads as
    * TIMESTAMP_NTZ. Don't assume either: normalize whatever the footer
    * declares to Spark's native microsecond TimestampType, so every
    * downstream op sees one canonical type. The session timezone is
    * pinned to UTC (Bench/Verify/tests), so the NTZ→LTZ cast preserves
    * the wall-clock instant and DuckDB oracles see the same value at
    * ≥ microsecond granularity (all our uses are ≥ second).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(read(spark, dir, "events"))
  }

  /** Canonicalize a raw events relation's `ts` to microsecond
    * TimestampType, dispatching on the physical type the reader saw:
    * raw nanos Long → truncate to µs; TIMESTAMP_NTZ → reinterpret in
    * the (UTC) session zone; TimestampType → already canonical.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _                => df
  }

  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  // -- reference domain schemas (FIXTURES.md §A), used by golden tests ------

  /** conso_an_ville — reference `README.md:73`. */
  val consoAnVilleSchema: StructType = StructType(Seq(
    StructField("nom_commune", StringType),
    StructField("code_commune", StringType),
    StructField("conso_moyenne_mwh", DoubleType),
    StructField("annee", IntegerType)))

  /** conso_jour_region — reference `README.md:74`. */
  val consoJourRegionSchema: StructType = StructType(Seq(
    StructField("code_insee_region", StringType),
    StructField("libelle_region", StringType),
    StructField("date", DateType),
    StructField("conso_mwh", DoubleType)))

  /** Price request — reference `api.py:107`. */
  val priceRequestSchema: StructType = StructType(Seq(
    StructField("libelle_region", StringType),
    StructField("nom_commune", StringType),
    StructField("code_commune", StringType),
    StructField("nb_personne", IntegerType),
    StructField("nb_m2", IntegerType)))
}

/** Case classes for typed Dataset paths (§2.9 Aggregator / flatMapGroups). */
case class ConsoAnVille(nom_commune: String, code_commune: String,
                        conso_moyenne_mwh: Option[Double], annee: Int)
case class ConsoJourRegion(code_insee_region: String, libelle_region: String,
                           date: java.sql.Date, conso_mwh: Double)
case class PriceRequest(libelle_region: String, nom_commune: String,
                        code_commune: String, nb_personne: Int, nb_m2: Int)
