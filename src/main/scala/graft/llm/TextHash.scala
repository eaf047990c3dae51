package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Portable deterministic hashing shared by the dedup/fingerprint
  * operators AND their DuckDB oracles.
  *
  * `xxhash64`/`hash` are Spark-specific, so cross-engine-checkable
  * operators hash via md5 instead: the first 14 hex digits (56 bits,
  * always non-negative in a signed 64-bit) of `md5(seed || ":" || s)`,
  * parsed as an integer. Identical bytes → identical hash in Spark
  * (`conv`), DuckDB (`('0x'||substr(md5(..),1,14))::BIGINT`) and JVM
  * Scala ([[TextHash.jvmHash]] for plan constants).
  *
  * The production-scale variant of every operator would swap this for
  * `xxhash64` (one fused codegen'd hash vs md5's allocation) — the md5
  * spine is the *verifiability* path; the operators' shapes (shingle →
  * min-agg → band-join) are unchanged by the hash choice.
  */
object TextHash {

  val HashHexDigits = 14

  /** Spark: 56-bit portable hash of a string column, via the native
    * [[graft.expr.Md5Prefix56]] expression (identical value to the
    * composed `conv(substring(md5(..)..))` form, ~no string overhead).
    */
  def phash(c: Column, seed: Int): Column =
    graft.expr.HashFunctions.md5Prefix56(concat(lit(s"$seed:"), c))

  /** DuckDB SQL fragment computing the same hash of expression `e`. */
  def phashSql(e: String, seed: Int): String =
    s"('0x' || substr(md5('$seed:' || $e), 1, $HashHexDigits))::BIGINT"

  /** Cheap xorshift-style re-hash deriving seed-variant hashes from one
    * base hash — so k-seed MinHash pays ONE md5 per shingle instead of
    * k. Pure xor/shift/mask keeps every intermediate < 2^56: DuckDB
    * BIGINT overflow is an error (not a wrap), so no multiplies.
    */
  def mix(base: Column, seed: Int): Column = {
    val k = lit(mixKey(seed))
    val v0 = base.bitwiseXOR(k)
    val v1 = v0.bitwiseXOR(shiftright(v0, 29))
    val v2 = v1.bitwiseXOR(shiftleft(v1.bitwiseAND(lit((1L << 42) - 1)), 13))
    v2.bitwiseXOR(shiftright(v2, 17))
  }

  /** DuckDB SQL fragment computing [[mix]] of expression `e`. */
  def mixSql(e: String, seed: Int): String = {
    val k = mixKey(seed)
    val v0 = s"xor($e, $k)"
    val v1 = s"xor($v0, ($v0) >> 29)"
    val v2 = s"xor($v1, (($v1) & ${(1L << 42) - 1}) << 13)"
    s"xor($v2, ($v2) >> 17)"
  }

  private[graft] def mixKey(seed: Int): Long = jvmHash(s"mix$seed", 1)

  /** JVM: same hash, for deriving deterministic plan constants
    * (e.g. LSH hyperplanes) without any runtime RNG.
    */
  def jvmHash(s: String, seed: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$s".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, HashHexDigits), 16)
  }

  /** Spark: distinct character 8-gram shingles of a text column,
    * exploded — `sequence` + `transform` + `array_distinct`, all
    * codegen'd builtins (no UDF).
    */
  val ShingleLen = 8
  def shingles(text: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - lit(ShingleLen - 1), lit(1))),
      i => text.substr(i, lit(ShingleLen))))

  /** Spark: the distinct HASHES of a text column's 8-gram shingles,
    * via the native [[graft.expr.ShingleHashes56]] expression — one
    * codegen'd Java loop per row. Value-identical (asserted in
    * HashParitySpec) to the composed
    * `array_distinct(transform(sequence(...), i => md5_prefix56(seed:
    * || substr(text, i, 8))))` form, which Spark evaluates through
    * non-codegen higher-order functions with three intermediate arrays
    * per row. Dedup is post-hash, keeping first occurrences; the SQL
    * builders below dedup in the same order so collision handling
    * matches exactly.
    */
  def hashedShingles(text: Column, seed: Int): Column =
    graft.expr.HashFunctions.shingleHashes56(text, seed, ShingleLen)

  /** The composed-builtins spelling of [[hashedShingles]] — kept as the
    * parity oracle for the native expression (HashParitySpec).
    */
  def hashedShinglesComposed(text: Column, seed: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - lit(ShingleLen - 1), lit(1))),
      i => graft.expr.HashFunctions.md5Prefix56(concat(lit(s"$seed:"), text.substr(i, lit(ShingleLen))))))

  /** Mix keys for k-seed MinHash, exposed for [[graft.expr.MinHash56]]. */
  def minhashKeys(numSeeds: Int): Array[Long] =
    (0 until numSeeds).map(mixKey).toArray

  /** DuckDB SQL fragment: the same distinct-shingle list of `e`
    * (dedup happens via SELECT DISTINCT at the caller).
    */
  def shinglesSql(e: String): String =
    s"list_transform(range(1, greatest(length($e) - ${ShingleLen - 1}, 1) + 1), " +
      s"i -> substr($e, i::INT, $ShingleLen))"

  /** DuckDB SQL fragment matching [[hashedShingles]] (dedup at caller
    * via SELECT DISTINCT — post-hash, like array_distinct above).
    */
  def hashedShinglesSql(e: String, seed: Int): String =
    s"list_transform(${shinglesSql(e)}, g -> ${phashSql("g", seed)})"
}
