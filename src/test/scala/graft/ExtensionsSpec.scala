package graft

import graft.expr.{FlattenClampBounds, GraftFunctions}
import org.apache.spark.sql.catalyst.expressions.{Greatest, Least}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}
  import spark.implicits._

  test("FlattenClampBounds collapses stacked literal clamps") {
    val df = Seq(1.0, 4.0, 9.0).toDF("x")
      .select(least(lit(5.0), least(lit(3.0), greatest(lit(2.0), greatest(lit(1.0), col("x"))))).as("c"))
    val before = df.queryExecution.analyzed
    def countNested(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): (Int, Int) = {
      var least = 0; var greatest = 0
      p.transformAllExpressions {
        case l: Least => least += 1; l
        case g: Greatest => greatest += 1; g
      }
      (least, greatest)
    }
    assert(countNested(before) == ((2, 2)))
    val after = FlattenClampBounds(before)
    assert(countNested(after) == ((1, 1)))
    // and semantics are preserved: bounds tightened to [2, 3]
    val vals = df.as[Double].collect().sorted
    assert(vals.toSeq == Seq(2.0, 3.0, 3.0))
  }

  test("FlattenClampBounds leaves NaN literal bounds untouched") {
    // Spark orders NaN greatest in Least/Greatest; math.min(NaN, b) is
    // NaN — folding would change the result, so the rule must skip
    val df = Seq(1.0, 4.0).toDF("x")
      .select(least(lit(Double.NaN), least(lit(3.0), col("x"))).as("c"))
    val before = df.queryExecution.analyzed
    val after = FlattenClampBounds(before)
    // plan unchanged (still two nested Least) …
    var leastCount = 0
    after.transformAllExpressions { case l: Least => leastCount += 1; l }
    assert(leastCount == 2)
    // … and evaluation matches Spark's NaN-is-greatest semantics
    assert(df.as[Double].collect().sorted.toSeq == Seq(1.0, 3.0))
  }

  test("token extraction works on aliased/derived input columns") {
    // regression for the F8 wart: tokens() must be a pure expression
    // tree, not spliced SQL text that only works for a column named
    // `text`
    val df = Seq("The quick brown fox", "le chat est la").toDF("body")
      .select(concat(col("body"), lit(" !")).as("derived"))
      .select(size(graft.llm.TextStats.tokens(col("derived"))).as("n"))
    assert(df.as[Int].collect().sorted.toSeq == Seq(4, 4))
  }

  test("cosine_similarity is SQL-callable after registration") {
    GraftFunctions.register(spark)
    graft.tables.Tables.embeddings(spark, Sf).createOrReplaceTempView("emb_v")
    val n = spark.sql(
      """SELECT a.vec_id, cosine_similarity(a.embedding, b.embedding) AS s
        |FROM emb_v a JOIN emb_v b ON b.vec_id = a.vec_id
        |WHERE a.vec_id < 10""".stripMargin)
      .collect()
    assert(n.length == 10)
    n.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }
}
