package graft

import graft.ops.RestExtract
import graft.ops.RestExtract.{FixtureServer, RestQuery}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RestExtractSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}

  test("where grammar: AND of equality terms and OR-groups") {
    val row = Map[String, Any]("k" -> 2L, "seg" -> "BUILDING", "name" -> "x")
    assert(RestExtract.evalWhere("(k=1 OR k=2) AND seg='BUILDING'", row))
    assert(!RestExtract.evalWhere("(k=1 OR k=3) AND seg='BUILDING'", row))
    assert(!RestExtract.evalWhere("(k=1 OR k=2) AND seg='AUTO'", row))
    assert(RestExtract.evalWhere("", row))
    assert(RestExtract.evalWhere("name='x'", row))
  }

  test("select/where/limit are pushed as request params and honored server-side") {
    val rows = (0 until 40).map(i => Map[String, Any](
      "id" -> i.toLong, "seg" -> (if (i % 2 == 0) "A" else "B"), "v" -> (i * 1.5)))
    val server = new FixtureServer(rows)
    val port = server.start()
    try {
      val q = RestQuery(select = Seq("id", "v"), where = "seg='A'", limit = -1)
      val (stage, uris) = RestExtract.stageFetch(s"http://127.0.0.1:$port/exports/json", q)
      // the pushdown is IN THE REQUEST: projected columns, predicate, page cap
      assert(uris.head.contains("select=id%2C+v"))
      assert(uris.head.contains("where=seg%3D%27A%27"))
      assert(uris.head.contains(s"limit=${RestExtract.PageSize}"))
      assert(server.requests.nonEmpty)
      // the server filtered AND projected: 20 of 40 rows, no `seg` field
      val staged = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$stage/page_0.json"))
      assert(staged.count(_ == '{') === 20)
      assert(!staged.contains("seg"))
    } finally server.stop()
  }

  test("pagination stages one file per page and stops at the short page") {
    val rows = (0 until 1200).map(i => Map[String, Any]("id" -> i.toLong))
    val server = new FixtureServer(rows)
    val port = server.start()
    try {
      val q = RestQuery(select = Seq("id"), where = "", limit = -1)
      val (stage, uris) = RestExtract.stageFetch(s"http://127.0.0.1:$port/exports/json", q)
      // 1200 rows / 512 per page = pages of 512, 512, 176
      val pages = new java.io.File(stage).listFiles().map(_.getName).sorted
      assert(pages.toSeq === Seq("page_0.json", "page_1.json", "page_2.json"))
      assert(uris.length === 3)
      assert(uris(1).contains("offset=512") && uris(2).contains("offset=1024"))
      val total = spark.read
        .schema("id LONG").option("multiLine", "true").json(s"$stage/*.json").count()
      assert(total === 1200)
    } finally server.stop()
  }

  test("q36: staged REST extract equals the direct parquet computation") {
    val viaRest = RestExtract.restStage(spark, Sf)
    val direct = graft.tables.Tables.customer(spark, Sf)
      .filter(col("c_nationkey").isin(1, 2, 3) && col("c_mktsegment") === "BUILDING")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("c_nationkey")
    assert(viaRest.collect().toSeq === direct.collect().toSeq)
  }
}
