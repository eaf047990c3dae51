package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d32 incremental connected components: the contracted-graph fold-in
  * must equal a from-scratch run — including the cross-component MERGE
  * case, which the text fixture cannot produce (two unrelated texts
  * can't both clear Jaccard 0.5 against one bridge doc), so it is
  * pinned here on synthetic graphs.
  */
class IncrementalCcSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a batch vertex bridging two prior components merges them to the min label") {
    val prior = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L), (50L, 50L)).toDF("vertex", "label")
    val newV = Seq(100L).toDF("vertex")
    val edges = Seq((100L, 2L), (100L, 11L)).toDF("u", "v")
    val got = labelsOf(Dedup.incrementalComponents(prior, newV, edges))
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 50L -> 50L, 100L -> 1L))
  }

  test("batch-only components and isolated new vertices label themselves") {
    val prior = Seq((1L, 1L)).toDF("vertex", "label")
    val newV = Seq(200L, 201L, 300L).toDF("vertex")
    val edges = Seq((201L, 200L)).toDF("u", "v")
    val got = labelsOf(Dedup.incrementalComponents(prior, newV, edges))
    assert(got == Map(1L -> 1L, 200L -> 200L, 201L -> 200L, 300L -> 300L))
  }

  test("incremental fold-in equals from-scratch components on a random graph") {
    val rnd = new scala.util.Random(42)
    val corpusEdges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (u, v) => u != v }
    val batchEdges = Seq.fill(30)(
      (40L + rnd.nextInt(20), rnd.nextInt(60).toLong)) // new↔new and new↔old
      .filter { case (u, v) => u != v }
    val corpusV = (0L until 40L)
    val batchV = (40L until 60L)

    val ccCorpus = Dedup.connectedComponents(corpusEdges.toDF("u", "v"))
    val prior = corpusV.toDF("vertex")
      .join(ccCorpus, Seq("vertex"), "left")
      .select(col("vertex"), coalesce(col("component"), col("vertex")).as("label"))
    val got = labelsOf(
      Dedup.incrementalComponents(prior, batchV.toDF("vertex"), batchEdges.toDF("u", "v")))

    val ccAll = Dedup.connectedComponents((corpusEdges ++ batchEdges).toDF("u", "v"))
    val want = labelsOf((corpusV ++ batchV).toDF("vertex")
      .join(ccAll, Seq("vertex"), "left")
      .select(col("vertex"), coalesce(col("component"), col("vertex")).as("label")))
    assert(got == want)
  }

  test("d32 fixture: full cover, copies attach to their source's cluster, novels are new") {
    val out = Dedup.incrementalCc(spark, Sf).collect()
    val byId = out.map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val corpusIds = byId.keys.filter(_ < Dedup.G2CopyIdOffset)
    val batchIds = byId.keys.filter(_ >= Dedup.G2CopyIdOffset)
    assert(batchIds.nonEmpty && corpusIds.nonEmpty)
    assert(out.length == byId.size, "one row per doc")
    corpusIds.foreach(id => assert(byId(id)._2 == "corpus"))
    batchIds.foreach(id => assert(byId(id)._2 == "batch"))
    // an exact copy of doc d lands in d's cluster: label ≤ d
    batchIds.filter(id => id >= Dedup.G2CopyIdOffset && id < Dedup.G2ChainIdOffset)
      .foreach { id =>
        val src = id - Dedup.G2CopyIdOffset
        assert(byId(id)._1 <= src, s"copy of $src labeled ${byId(id)._1}")
      }
    // labels are component minima: every label is a member labeling itself
    out.map(_.getLong(1)).distinct.foreach { l =>
      assert(byId(l)._1 == l, s"label $l is not self-labeled")
    }
  }
}
