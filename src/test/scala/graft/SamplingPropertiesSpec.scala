package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized driver-side oracle for the d44/s18 distributed prefix
  * sum ([[graft.llm.Sampling.prefixShards]]). The fixture's doc_ids
  * are dense and contiguous; this space is not — sparse ids leave
  * id-range buckets EMPTY, gap distributions skew per-bucket mass,
  * and a base offset shifts every shard boundary. Each case is
  * checked against the obvious sequential fold.
  */
class SamplingPropertiesSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import graft.llm.Sampling

  private def sample[A](gen: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, gen)(Gen.Parameters.default, Seed(seed)).get

  test("prefixShards equals the sequential fold on sparse random id spaces, any base") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.chooseNum(1, 120)
      // sparse, gappy, possibly huge ids — stresses empty buckets
      ids <- Gen.listOfN(n, Gen.chooseNum(0L, 3000000L)).map(_.distinct)
      toks <- Gen.listOfN(ids.length, Gen.chooseNum(0L, 9000L))
      base <- Gen.oneOf(0L, 1L, 123456789L)
    } yield (ids.zip(toks), base)
    sample(caseGen, 12, seed = 20260815L).foreach { case (docs, base) =>
      val df = docs.toDF("doc_id", "n_tokens")
      val got = Sampling.prefixShards(df, base).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      var acc = base
      val want = docs.sortBy(_._1).map { case (id, t) =>
        acc += t
        (id, t, acc, (acc - t) / Sampling.ShardTokens)
      }
      assert(got.toSeq == want, s"diverged on n=${docs.length} base=$base")
    }
  }

  test("prefixShards on an empty slice returns an empty, correctly-shaped result") {
    import spark.implicits._
    val out = Sampling.prefixShards(
      Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens"), 42L)
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "cum_tokens", "shard"))
    assert(out.count() == 0)
  }
}
