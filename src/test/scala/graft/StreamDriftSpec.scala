package graft

import graft.streaming.StreamDrift
import org.scalatest.funsuite.AnyFunSuite

class StreamDriftSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}

  test("s21 drift grid is complete and its ppm accounting closes") {
    val rows = StreamDrift.driftReport(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val weeks = rows.map(_._1).distinct
    val buckets = rows.map(_._2).distinct
    // every (week, reference-bucket) cell present exactly once
    assert(rows.length == weeks.length * buckets.length)
    rows.groupBy(_._1).foreach { case (w, cells) =>
      // truncating div: shares sum to 1e6 minus at most one ulp per bucket
      val share = cells.map(_._4).sum
      assert(share <= StreamDrift.Ppm && share > StreamDrift.Ppm - cells.length,
        s"week $w batch shares sum to $share")
      // the published L1 equals the sum of the per-bucket deltas
      assert(cells.forall(_._7 == cells.map(_._6).sum), s"week $w L1 mismatch")
    }
    // uniform fixture: weekly slices stay within a loose drift band,
    // but drift is non-zero (weeks are finite samples)
    assert(rows.exists(_._6 > 0))
    assert(rows.map(_._7).max < 300000, "implausible drift on a uniform fixture")
  }
}
