package graft

import org.apache.spark.sql.types.TimestampType

/** Schema-drift canary: the driver regenerates /root/testdata between
  * rounds, and a physical-type change in events.ts once broke 76 queries
  * and 33 tests with one opaque analysis error each. This spec fails
  * FIRST and by NAME when the testdata schema drifts, so a future
  * regeneration is one obvious red test instead of a wall of confusing
  * ones. See sources/Tables.scala (`events`) for the normalization.
  */
class SchemaCanarySpec extends SparkSpec {

  test("canary: events.ts normalizes to TimestampType for the CURRENT testdata") {
    val ev = sources.Tables.events(spark, SfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts decoded as ${ev.schema("ts").dataType} — testdata schema drifted; update Tables.events")
  }

  test("canary: an events query analyzes and returns rows") {
    val ev = sources.Tables.events(spark, SfDir)
    import org.apache.spark.sql.functions._
    val n = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count("*").as("n")).count()
    assert(n > 0, "events hourly rollup returned no rows")
  }

  test("canary: all base tables load with stable column sets") {
    import sources.Tables._
    assert(events(spark, SfDir).columns.toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(documents(spark, SfDir).columns.contains("doc_id"))
    assert(embeddings(spark, SfDir).columns.contains("vec_id"))
    assert(lineitem(spark, SfDir).columns.contains("l_orderkey"))
  }
}
