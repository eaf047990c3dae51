package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded two-pass exact percentile must agree bit-for-bit with
  * Spark's buffering `percentile` aggregate — on adversarial shapes,
  * not just the gate tables: negatives, zeros, heavy ties (whole
  * groups inside one grid bucket), single-element groups, and values
  * spanning magnitudes.
  */
class PercentilesSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private val Ps = Seq(("p10", 0.1), ("p50", 0.5), ("p75", 0.75), ("p99", 0.99))

  private def check(data: Seq[(String, Double)], clue: String): Unit = {
    val df = data.toDF("g", "v")
    val got = ops.Percentiles
      .boundedPercentiles(df, "g", "v", Ps)
      .orderBy("g").collect()
      .map(r => (r.getString(0), Ps.indices.map(i => r.getDouble(1 + i))))
    val want = df.groupBy("g")
      .agg(expr("percentile(v, array(0.1D, 0.5D, 0.75D, 0.99D))").as("ps"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), Ps.indices.map(i => r.getSeq[Double](1)(i))))
    assert(got.length == want.length, clue)
    got.zip(want).foreach { case ((g1, a), (g2, b)) =>
      assert(g1 == g2, clue)
      a.zip(b).foreach { case (x, y) =>
        // bit-identical, not approximately equal: the helper replays the
        // built-in's interpolation on the same doubles
        assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y),
          s"$clue group=$g1 got=$a want=$b")
      }
    }
  }

  test("matches the built-in on mixed-sign, multi-magnitude data") {
    val rnd = new scala.util.Random(7)
    val data = for {
      g <- Seq("a", "b", "c"); i <- 1 to 500
    } yield (g, (rnd.nextDouble() - 0.4) * math.pow(10, rnd.nextInt(6)))
    check(data, "mixed-sign")
  }

  test("matches on heavy ties — most of a group in one grid bucket") {
    val data = Seq.fill(400)(("t", 64.25)) ++ Seq(("t", 64.5), ("t", -64.25), ("t", 0.0)) ++
      Seq.fill(300)(("u", 0.0)) ++ Seq(("u", 1e-8))
    check(data, "ties")
  }

  test("matches on single-element and two-element groups") {
    check(Seq(("s", 42.0), ("d", 1.0), ("d", 2.0)), "tiny groups")
  }

  test("extraAggs see the unfiltered group and ride through") {
    val df = Seq(("g1", 1.0, 10L), ("g1", 3.0, 11L), ("g2", 5.0, 12L)).toDF("g", "v", "k")
    val out = ops.Percentiles
      .boundedPercentiles(df, "g", "v", Seq(("p50", 0.5)),
        extraAggs = Seq(count(lit(1)).as("n"), countDistinct("k").as("nk")))
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("g1", 2.0, 2L, 2L), ("g2", 5.0, 1L, 1L)))
  }

  test("q60 med/mad match a built-in-percentile replay; flag counts consistent") {
    val got = ops.CoreOps.madOutliers(spark, SparkTestBase.Sf).collect()
    assert(got.nonEmpty)
    // replay with the buffering built-in: med per type, then mad, then flags
    val ev = graft.tables.Tables.events(spark, SparkTestBase.Sf)
      .select(col("event_type"), col("value").cast("double").as("value"))
    val med = ev.groupBy("event_type").agg(expr("percentile(value, 0.5D)").as("med"))
    val dev = ev.join(med, Seq("event_type")).withColumn("ad", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type").agg(expr("percentile(ad, 0.5D)").as("mad"))
    val want = dev.join(mad, Seq("event_type"))
      .groupBy("event_type")
      .agg(min("med").as("med"), min("mad").as("mad"),
        count(when(col("ad") > lit(ops.CoreOps.RobustZCut) * col("mad"), lit(1))).as("n_outliers"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(java.lang.Double.doubleToLongBits(g.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(w.getDouble(1)), s"med ${g.getString(0)}")
      assert(java.lang.Double.doubleToLongBits(g.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(w.getDouble(2)), s"mad ${g.getString(0)}")
      assert(g.getLong(3) == w.getLong(3), s"n_outliers ${g.getString(0)}")
      assert(g.getLong(4) == w.getLong(4), s"n ${g.getString(0)}")
      // the cut actually separates: outliers exist but are a minority
      assert(g.getLong(3) < g.getLong(4))
    }
  }

  test("q64 equi-depth: all buckets present and depths near-equal per group") {
    import org.apache.spark.sql.functions.col
    val rows = ops.CoreOps.equidepthHist(spark, SparkTestBase.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val nByType = graft.tables.Tables.events(spark, SparkTestBase.Sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (t, bs) =>
      val buckets = bs.map(_._2).sorted.toSeq
      assert(buckets == (0L until ops.CoreOps.DepthBuckets), s"$t buckets $buckets")
      assert(bs.map(_._3).sum == nByType(t))
      // equi-DEPTH on a continuous column: every bucket within 25% of n/10
      val target = nByType(t).toDouble / ops.CoreOps.DepthBuckets
      bs.foreach { case (_, b, n, lo, hi) =>
        assert(math.abs(n - target) <= 0.25 * target, s"$t bucket $b depth $n vs $target")
        assert(lo <= hi)
      }
      // buckets tile the range in order
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4, s"$t overlap at bucket ${b._2}")
        case _ =>
      }
    }
  }
}
