package graft

import graft.streaming.StreamAsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamAsOfSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}

  test("s20 equals the batch as-of join row-for-row (Kappa equivalence)") {
    val streamed = StreamAsOf.asOfEnrich(spark, Sf).collect()
    val batch = graft.ops.AsOfJoin.purchaseAsOfClick(spark, Sf).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b, s"\n$s\n$b") }
  }

  test("s20 state actually crosses micro-batches: some match spans weeks") {
    val rows = StreamAsOf.asOfEnrich(spark, Sf)
      .filter(col("ref_event_id").isNotNull)
      .select(col("ts"), col("staleness_us"))
      .collect()
    assert(rows.nonEmpty)
    // a staleness larger than 7 days can only come from a click whose
    // micro-batch (week slice) preceded the purchase's
    assert(rows.exists(_.getLong(1) > 7L * 24 * 3600 * 1000000),
      "no purchase was enriched from an earlier week's click — " +
        "cross-batch state untested by this fixture")
  }
}
