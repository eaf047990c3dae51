package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reusable CC operator beyond the fixture's tiny components: the
  * 200-node chain has diameter 199, so plain neighbor-min propagation
  * would need ~200 rounds and trip the operator's 25-round cap —
  * convergence here proves the pointer-jumping shortcut delivers its
  * O(log diameter) bound, not just correctness on twins.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  test("long chain converges within the round cap and labels to the min") {
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponents(chain)
    assert(labels.count() == 200)
    assert(labels.filter(col("component") =!= 0L).isEmpty)
  }

  test("star and disjoint components get per-component min labels") {
    val star = (1L to 50L).map(i => (0L, i))
    val chain2 = (1000L until 1010L).map(i => (i, i + 1))
    val labels = Dedup.connectedComponents((star ++ chain2).toDF("a", "b"))
    assert(labels.filter(col("vertex") <= 50L && col("component") =!= 0L).isEmpty)
    assert(labels.filter(col("vertex") >= 1000L && col("component") =!= 1000L).isEmpty)
    assert(labels.count() == 51 + 11)
  }
}
