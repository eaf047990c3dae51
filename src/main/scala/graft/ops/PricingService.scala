package graft.ops

import org.apache.spark.sql.SparkSession

/** A single-request price quote (the reference's `/price` JSON body,
  * reference `api.py:104-108`, minus the commune fields the testdata
  * realization folds into `region`).
  */
final case class PriceRequest(region: String, nbPersonne: Int, nbM2: Int)

/** Low-latency single-request serving — the analog of the reference's
  * Flask `/price` endpoint (reference `api.py:95-132`, SLO < 6 s/request
  * per `tests/test_api.py:60-84`), restructured for an engine:
  *
  * The reference runs TWO warehouse queries per request. Here the same
  * two aggregates — [[Pricing.regionAlpha]] (one row per region) and
  * [[Pricing.modulationScalar]] (one row, period) — run ONCE at service
  * construction, and each request is then priced in pure driver-side
  * arithmetic: no Spark job, no plan, microseconds per call.
  *
  * This stays true at 100 TB because the collected state is O(regions),
  * not O(facts): the terabytes of events behind M were reduced by the
  * one-time distributed aggregate, and a state refresh is just
  * `PricingService.build` again (e.g. on a schedule after each daily
  * ingest).
  *
  * Arithmetic parity: the formula repeats [[Pricing.monthlyPrice]]'s
  * double operations in the same order, and the final rounding uses
  * `java.math.BigDecimal.valueOf(_).setScale(2, HALF_EVEN)` — the same
  * shortest-representation decimal round Spark's `bround` applies to
  * doubles — so a served price equals the q13 batch price bit-for-bit
  * (asserted for every customer in PricingServiceSpec).
  */
final class PricingService private[ops] (
    val alphaByRegion: Map[String, Double],
    val m: Double,
    params: PricingParams) extends Serializable {

  def price(req: PriceRequest): Double = {
    val alpha = alphaByRegion.getOrElse(req.region, 1.0)
    val x = 110.0 * req.nbM2 + 800.0 * req.nbPersonne + 200.0 * req.nbPersonne + 1100.0
    val raw = (params.tariff + alpha * m) * x / 12.0 + params.monthlyFee
    java.math.BigDecimal.valueOf(raw)
      .setScale(2, java.math.RoundingMode.HALF_EVEN).doubleValue()
  }
}

object PricingService {

  /** Run the two dimension aggregates (two Spark jobs, the q13
    * sub-plans) and collect their tiny results into a serving handle.
    */
  def build(spark: SparkSession, dir: String,
            params: PricingParams = PricingParams(Pricing.Tariff, Pricing.MonthlyFee, 1.0, 1.3)): PricingService = {
    val m = Pricing.modulationScalar(spark, dir).collect()(0).getDouble(0)
    val alpha = Pricing.regionAlpha(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    new PricingService(alpha, m, params)
  }
}
