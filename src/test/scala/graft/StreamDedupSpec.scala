package graft

import org.scalatest.funsuite.AnyFunSuite

class StreamDedupSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}

  test("duplicated delivery is collapsed to exactly-once counts") {
    val deduped = graft.streaming.StreamDedup.dedupedDailyCounts(spark, Sf)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    val expected = graft.tables.Tables.events(spark, Sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.col("ts")).as("d"))
      .count()
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    assert(deduped == expected) // WRITE_APPEND semantics would double every count
  }
}
