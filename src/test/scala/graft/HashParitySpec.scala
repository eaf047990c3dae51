package graft

import graft.llm.{Dedup, TextHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native hash expressions must be bit-identical to the composed
  * builtin forms they replace — the composed forms are what the DuckDB
  * oracles mirror, so parity here is what keeps the fast path
  * oracle-checkable.
  */
class HashParitySpec extends AnyFunSuite {
  import SparkTestBase.{Sf, spark}

  test("native shingle_hashes56 equals composed array_distinct(transform(md5_prefix56))") {
    val mismatches = Dedup.corpus(spark, Sf)
      .select(
        TextHash.hashedShingles(col("text"), 0).as("fast"),
        TextHash.hashedShinglesComposed(col("text"), 0).as("slow"))
      .filter(not(col("fast") === col("slow")))
      .count()
    assert(mismatches == 0)
  }

  test("native minhash56 equals 16 composed array_min(transform(mix)) columns") {
    val hs = Dedup.corpus(spark, Sf)
      .select(TextHash.hashedShingles(col("text"), 0).as("hs"))
    val fast = graft.expr.HashFunctions.minHash56(col("hs"), TextHash.minhashKeys(16))
    val slow = array((0 until 16).map(s =>
      array_min(transform(col("hs"), x => TextHash.mix(x, s)))): _*)
    val mismatches = hs.select(fast.as("fast"), slow.as("slow"))
      .filter(not(col("fast") === col("slow")))
      .count()
    assert(mismatches == 0)
  }

  test("short texts (below shingle length) still produce one shingle hash") {
    import spark.implicits._
    val rows = Seq("ab", "abcdefgh", "abcdefghi").toDF("text")
      .select(size(TextHash.hashedShingles(col("text"), 0)).as("n"),
              size(TextHash.hashedShinglesComposed(col("text"), 0)).as("m"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1) && r.getInt(0) >= 1))
  }

  test("native simhash56 equals the composed explode + 56-sum aggregate") {
    val docs = Dedup.corpus(spark, Sf)
    val fast = docs.select(col("doc_id"),
      graft.expr.HashFunctions.simHash56(col("text"), 99).as("simhash"))
      .filter(col("simhash").isNotNull)
    val slow = Dedup.simhashComposed(docs)
    assert(fast.count() == slow.count())
    assert(fast.except(slow).count() == 0 && slow.except(fast).count() == 0)
  }

  test("simhash56 of token-less text is null, matching the group-by drop") {
    import spark.implicits._
    val rows = Seq("", "!!! ???", "ONE two", "ümlaut-frei").toDF("text")
      .select(graft.expr.HashFunctions.simHash56(col("text"), 99).as("s"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(!rows(2).isNullAt(0) && !rows(3).isNullAt(0))
  }

  test("multibyte texts shingle on CHAR boundaries, matching the composed form") {
    import spark.implicits._
    val texts = Seq("", "é", "éléctricité consommée à Orléans",
      "日本語のテキストです、長めにしてみます", "mix of ascii and éàü chars répétés")
    val mismatches = texts.toDF("text")
      .select(
        TextHash.hashedShingles(col("text"), 0).as("fast"),
        TextHash.hashedShinglesComposed(col("text"), 0).as("slow"))
      .filter(not(col("fast") === col("slow")))
      .count()
    assert(mismatches == 0)
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted dedup'd arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(5L), Seq(5L)))
    val mism = rows.toDF("a", "b")
      .select(
        graft.expr.VectorFunctions.sortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mism == 0)
  }
}
