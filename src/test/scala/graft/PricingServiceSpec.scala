package graft

import graft.ops.{PriceRequest, Pricing, PricingService}
import org.scalatest.funsuite.AnyFunSuite

/** The serving-path contract: a single-request quote from the collected
  * dimension state must equal the q13 batch price bit-for-bit, and the
  * per-call path must not touch Spark at all.
  */
class PricingServiceSpec extends AnyFunSuite {
  import SparkTestBase.{Sf, spark}

  test("served single-request prices equal the q13 batch prices for every customer") {
    val svc = PricingService.build(spark, Sf)
    val batch = Pricing.priceBatch(spark, Sf).collect()
    assert(batch.length == 150)
    batch.foreach { r =>
      val req = PriceRequest(r.getString(1), r.getInt(2), r.getInt(3))
      assert(svc.price(req) == r.getDouble(6),
        s"custkey ${r.getLong(0)}: served ${svc.price(req)} != batch ${r.getDouble(6)}")
    }
  }

  test("warm request path runs driver-side: no Spark jobs per call") {
    val svc = PricingService.build(spark, Sf)
    val tracker = spark.sparkContext.statusTracker
    val jobsBefore = tracker.getJobIdsForGroup(null).length
    val quotes = (1 to 10000).map(i => svc.price(PriceRequest("EUROPE", i % 4 + 1, 20 + i % 180)))
    assert(quotes.forall(_ > 0))
    assert(tracker.getJobIdsForGroup(null).length == jobsBefore,
      "pricing a request must not launch a Spark job")
    // unknown region falls back to alpha = 1.0, like the batch path
    assert(svc.price(PriceRequest("ATLANTIS", 2, 50)) > 0)
  }
}
