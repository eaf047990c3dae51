package graft

import graft.ops.Pricing
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class PricingPropertiesSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def priceOf(m2: Int, p: Int, alpha: Double, m: Double): Double = {
    import spark.implicits._
    Seq((m2, p)).toDF("nb_m2", "nb_personne")
      .select(Pricing.monthlyPrice(lit(alpha), lit(m),
        Pricing.consoFoyer(col("nb_m2"), col("nb_personne"))).as("price"))
      .head().getDouble(0)
  }

  // Column-level pure-function checks run driver-side against the same
  // expressions (cheap); one DataFrame round-trip pins the plan path.
  test("price via the Column expressions matches the scalar formula (sampled)") {
    val cases = Seq((50, 2, 1.1, 0.012), (100, 4, 1.0, 0.05), (20, 1, 1.3, 0.001))
    cases.foreach { case (m2, p, a, m) =>
      val x = 110.0 * m2 + 1000.0 * p + 1100.0
      val expected = BigDecimal((Pricing.Tariff + a * m) * x / 12.0 + Pricing.MonthlyFee)
        .setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      assert(priceOf(m2, p, a, m) == expected, s"case ($m2,$p,$a,$m)")
    }
  }

  test("price is monotone in m2, persons, alpha and M") {
    val gen = for {
      m2 <- Gen.choose(10, 500)
      p <- Gen.choose(1, 10)
      a <- Gen.choose(100, 130).map(_ / 100.0)
      m <- Gen.choose(1, 50).map(_ / 1000.0)
    } yield (m2, p, a, m)
    // scalar re-implementation (same closed formula) for speed
    def scalarPrice(m2: Int, p: Int, a: Double, m: Double): Double =
      (Pricing.Tariff + a * m) * (110.0 * m2 + 1000.0 * p + 1100.0) / 12.0 + Pricing.MonthlyFee
    val samples = Gen.listOfN(500, gen)(Gen.Parameters.default, Seed(42L)).get
    samples.foreach { case (m2, p, a, m) =>
      assert(scalarPrice(m2 + 10, p, a, m) >= scalarPrice(m2, p, a, m))
      assert(scalarPrice(m2, math.min(p + 1, 10), a, m) >= scalarPrice(m2, p, a, m))
      assert(scalarPrice(m2, p, math.min(a + 0.05, 1.3), m) >= scalarPrice(m2, p, a, m))
      assert(scalarPrice(m2, p, a, math.min(m + 0.005, 0.05)) >= scalarPrice(m2, p, a, m))
    }
  }

  test("modulation clamp: M never exceeds 0.05") {
    import spark.implicits._
    val ms = Seq(0.0, 100.0, 4000.0, 20000.0, 1e9).toDF("c")
      .select(Pricing.modulation(col("c")).as("m")).collect().map(_.getDouble(0))
    assert(ms.forall(m => m >= 0.0 && m <= 0.05))
  }
}
