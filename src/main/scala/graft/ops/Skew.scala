package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / the 100 TB checklist):
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting is the fallback when one build-side key dominates so hard
  * that even split partitions overwhelm a task.
  */
object Skew {

  /** Salted equi-join: the large (skewed) side spreads each hot key
    * over `salts` shuffle partitions via a deterministic per-row salt;
    * the small side replicates each key `salts` times. Result is
    * row-identical to `large.join(small, key)` — only the shuffle
    * distribution changes.
    *
    * The salt derives from `saltSource` (any column, ideally unique per
    * row) — deterministic, so retries/speculative tasks stay stable.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
