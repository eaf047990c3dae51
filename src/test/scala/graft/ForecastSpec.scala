package graft

import graft.ops.Forecast
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ForecastSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}

  private lazy val closed = Forecast.closedForm(spark, Sf).collect()
    .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap

  test("closed-form, Aggregator and flatMapGroups fits agree") {
    val agg = Forecast.aggregatorFit(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val fmgRows = Forecast.flatMapGroupsFit(spark, Sf).collect()
    assert(fmgRows.nonEmpty)
    fmgRows.foreach { r =>
      val predClosed = closed((r.event_type, r.k))
      // closed form rounds coefficients to 6dp for oracle parity; allow that slack
      assert(math.abs(predClosed - r.pred.get) < 1e-2,
        s"${r.event_type} k=${r.k}: closed=$predClosed fmg=${r.pred.get}")
      val (s, i) = agg(r.event_type)
      val predAgg = i + s * r.forecast_day
      assert(math.abs(predAgg - predClosed) < 1e-2,
        s"${r.event_type} k=${r.k}: agg=$predAgg closed=$predClosed")
    }
  }

  test("degenerate group (zero x-variance) yields null prediction") {
    import spark.implicits._
    val one = Seq(("solo", 10L, 5.0), ("solo", 10L, 7.0)).toDF("event_type", "x", "y")
    // closed-form guard: sxx == 0 → null slope
    val fit = one.groupBy("event_type")
      .agg(avg("x").as("xbar"), avg("y").as("ybar"))
      .join(one, "event_type")
      .groupBy("event_type")
      .agg(sum((col("x") - col("xbar")) * (col("x") - col("xbar"))).as("sxx"))
      .select(when(col("sxx") > 0, lit(1)).as("ok")).head()
    assert(fit.isNullAt(0))
  }
}
