package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** s23 — the D6 failure-alert leg: the listener must capture exactly
  * one failed termination (with the cause token surviving the
  * exception wrapping) and one clean recovery, and the retried ingest
  * must process every document exactly once.
  */
class StreamAlertSpec extends AnyFunSuite {
  import SparkTestBase.{Sf, spark}

  test("s23: one alert with the parsed cause, one recovery, every doc processed once") {
    val out = graft.streaming.StreamAlert.failureAlert(spark, Sf).collect()
    val byKind = out.groupBy(_.getString(0))
    assert(byKind("alert").map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq((graft.streaming.StreamAlert.CauseToken, 1L)),
      "expected exactly one alert row carrying the cause token")
    assert(byKind("recovered").map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("ok", 1L)))
    val processed = byKind("processed").map(_.getLong(2)).sum
    val nDocs = graft.tables.Tables.documents(spark, Sf).count()
    assert(processed == nDocs,
      s"retry must process every doc exactly once: $processed != $nDocs")
    // per-lang split matches the corpus (no row lost or double-written
    // across the failed run, the checkpoint resume, and the re-read)
    val langs = graft.tables.Tables.documents(spark, Sf)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("processed").map(r => r.getString(1) -> r.getLong(2)).toMap == langs)
  }
}
