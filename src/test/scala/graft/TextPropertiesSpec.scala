package graft

import graft.llm.{Bpe, TextHash}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized driver-side oracles for the text operators whose Spark
  * expressions encode nontrivial string semantics:
  *
  *  - the BPE merge applier (t11) claims Spark's literal `replace` has
  *    JVM `String.replace` semantics (leftmost, non-overlapping) and
  *    that the two-pass application catches delimiter-sharing repeats;
  *  - d25's "a twin is exactly contained" claim rests on every shingle
  *    window of a ≥8-char prefix being a window of the full string.
  *
  * Both are checked here against plain-Scala reference implementations
  * on seeded random inputs — the fixture can't cover these spaces.
  */
class TextPropertiesSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def sample[A](gen: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, gen)(Gen.Parameters.default, Seed(seed)).get

  test("t11: the Spark merge applier matches a plain-Scala BPE reference on random words") {
    import spark.implicits._
    val wordGen = Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
    val symGen = Gen.chooseNum(1, 2).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
    val mergesGen = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, for { a <- symGen; b <- symGen } yield Bpe.Merge(a, b)))

    def refEncode(w: String, merges: Seq[Bpe.Merge]): String = {
      val init = w.flatMap(c => s"|$c") + "|"
      merges.foldLeft(init) { (s, m) =>
        val pat = s"|${m.a}|${m.b}|"
        val rep = s"|${m.a}${m.b}|"
        s.replace(pat, rep).replace(pat, rep)
      }
    }

    val cases = sample(Gen.zip(Gen.listOfN(40, wordGen), mergesGen), 25, 7L)
    cases.foreach { case (words, merges) =>
      val got = words.toDF("w")
        .select(Bpe.encodeWord(col("w"), merges).as("e"))
        .as[String].collect()
      val want = words.map(refEncode(_, merges))
      assert(got.toSeq == want, s"merges=$merges words=$words")
    }
  }

  test("t11: adjacent repeats sharing a delimiter all merge (the two-pass claim)") {
    import spark.implicits._
    // "ababab..." is the adversarial shape: |a|b|a|b|a|b| has overlapping
    // |a|b| occurrences; one pass leaves every second occurrence unmerged
    val m = Seq(Bpe.Merge("a", "b"))
    (1 to 6).foreach { k =>
      val w = "ab" * k
      val got = Seq(w).toDF("w").select(Bpe.encodeWord(col("w"), m)).as[String].head()
      assert(got == "|" + "ab|" * k, s"k=$k got $got")
    }
  }

  test("d25: every shingle of a >=8-char prefix is a shingle of the full string") {
    import spark.implicits._
    val gen = for {
      len <- Gen.chooseNum(8, 60)
      s <- Gen.stringOfN(len, Gen.oneOf(Gen.alphaLowerChar, Gen.const(' ')))
      plen <- Gen.chooseNum(8, len)
    } yield (s, s.take(plen))
    val cases = sample(gen, 400, 11L)
    val leaked = cases.toDF("full", "prefix")
      .select(size(array_except(
        TextHash.hashedShingles(col("prefix"), 0),
        TextHash.hashedShingles(col("full"), 0))).as("extra"))
      .filter(col("extra") > 0).count()
    assert(leaked == 0L, "a prefix shingle escaped the full string's shingle set")
  }

  test("d25: a sub-8-char prefix is NOT guaranteed contained (the boundary the spec relies on)") {
    import spark.implicits._
    // documents the boundary: a 5-char prefix of a 10-char string has ONE
    // 5-char shingle, which is not among the full string's 8-char windows
    val extra = Seq(("abcdefghij", "abcde")).toDF("full", "prefix")
      .select(size(array_except(
        TextHash.hashedShingles(col("prefix"), 0),
        TextHash.hashedShingles(col("full"), 0))).as("extra"))
      .head().getInt(0)
    assert(extra == 1)
  }
}
