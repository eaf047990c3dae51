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
