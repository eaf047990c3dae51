package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Greatest, Least, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: flatten nested Least/Greatest chains with literal
  * bounds — `least(a, least(b, x))` → `least(min(a,b), x)` (dually for
  * greatest). Clamp pipelines (SURVEY.md §2.8 F5) stack per-stage
  * bounds (tariff clamp ∘ regulatory clamp); after constant-folding
  * this collapses them into one comparison per row.
  *
  * Kept deliberately narrow (double literals only) — correctness before
  * generality; Catalyst's own ConstantFolding doesn't flatten across
  * the nested-function boundary.
  */
object FlattenClampBounds extends Rule[LogicalPlan] {
  private def tighten(e: Expression): Expression = e match {
    // NaN guard: Spark's Least/Greatest order NaN greatest, but
    // math.min(NaN, b) = NaN — folding a NaN bound would change results
    case Least(Seq(Literal(a: java.lang.Double, DoubleType),
                   Least(Seq(Literal(b: java.lang.Double, DoubleType), inner))))
        if !a.isNaN && !b.isNaN =>
      Least(Seq(Literal(math.min(a, b), DoubleType), tighten(inner)))
    case Greatest(Seq(Literal(a: java.lang.Double, DoubleType),
                      Greatest(Seq(Literal(b: java.lang.Double, DoubleType), inner))))
        if !a.isNaN && !b.isNaN =>
      Greatest(Seq(Literal(math.max(a, b), DoubleType), tighten(inner)))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case l @ Least(Seq(Literal(_, DoubleType), Least(_))) => tighten(l)
      case g @ Greatest(Seq(Literal(_, DoubleType), Greatest(_))) => tighten(g)
    }
}

/** Session extensions wiring for the graft engine: the optimizer rule
  * above plus `cosine_similarity` as a SQL-callable function.
  *
  * Use either `SparkSession.builder().withExtensions(new GraftExtensions)`
  * / `spark.sql.extensions=graft.expr.GraftExtensions`, or
  * [[GraftFunctions.register]] on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FlattenClampBounds)
    e.injectFunction(GraftFunctions.cosineSimilarityDescriptor)
  }
}

object GraftFunctions {
  val cosineSimilarityDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "cosine_similarity expects 2 arguments")
      CosineSimilarity(args.head, args(1))
    })

  /** Register `cosine_similarity` for SQL use on a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.ColumnBridge.registerFunction(
      spark, "cosine_similarity",
      args => { require(args.length == 2); CosineSimilarity(args.head, args(1)) })
}
