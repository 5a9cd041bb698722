package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dims, Medallion}
import graft.sources.Tables

/** Property tests over the medallion stages on sf0.001, reusing the
  * reference's own operational invariants (SURVEY.md §5): no duplicate
  * keys post-dedup, rollup sums equal raw sums, latest.ts == max(ts)
  * per key, orphans ∪ mapped == silver.
  */
class MedallionSpec extends SparkSpec {

  lazy val events = Tables.events(spark, SfDir)
  lazy val silver = Medallion.silver(events).cache()
  lazy val gold = Medallion.gold(silver,
    Dims.metricMappings(spark), Dims.deviceHistory(spark)).cache()

  test("silver is twice the events (two metrics per event), no shuffles") {
    silver.count() shouldBe events.count() * 2
    // the unpivot must stay map-side: no Exchange in the plan
    silver.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("gold value split: numeric metrics to value_double, rest to string") {
    val bad = gold.filter(
      (col("agg_type").isin("SUM", "AVG") && col("value_double").isNull) ||
      (!col("agg_type").isin("SUM", "AVG") && col("value_string").isNull &&
        col("value_double").isNotNull)).count()
    bad shouldBe 0L
  }

  test("temporal join resolves each row to exactly one validity interval") {
    // mapped users resolve to exactly one remote per silver row
    val mapped = silver.filter(
      regexp_extract(col("serialnumber"), "SN(\\d+)", 1).cast("long")
        < Dims.MappedUsers)
    gold.count() shouldBe mapped.count()
    // interval split honored: rows before the split go to R<u>a, after to R<u>b
    gold.filter(col("unix_timestamp") < Dims.IntervalSplit &&
      !col("remote_id").endsWith("a")).count() shouldBe 0L
    gold.filter(col("unix_timestamp") >= Dims.IntervalSplit &&
      !col("remote_id").endsWith("b")).count() shouldBe 0L
  }

  test("orphans + mapped partition silver exactly") {
    val orphans = Medallion.orphans(silver, Dims.deviceHistory(spark))
    orphans.count() + gold.count() shouldBe silver.count()
    // every orphan serial is an unmapped user by construction
    orphans.filter(
      regexp_extract(col("serialnumber"), "SN(\\d+)", 1).cast("long")
        < Dims.MappedUsers).count() shouldBe 0L
  }

  test("hour rollup sums reconcile with gold (reference invariant DLA)") {
    val rolled = Medallion.hourRollup(gold)
      .agg(sum("sum_value")).head.getDouble(0)
    val direct = gold
      .filter(col("agg_type").isin("SUM", "AVG") && col("value_double") =!= 0)
      .agg(sum("value_double").cast("double")).head.getDouble(0)
    rolled shouldBe direct +- 1e-6
  }

  test("rollup granularities nest: month n == day n == hour n totals") {
    val h = Medallion.hourRollup(gold).agg(sum("n")).head.getLong(0)
    val d = Medallion.dayRollup(gold).agg(sum("n")).head.getLong(0)
    val m = Medallion.monthRollup(gold).agg(sum("n")).head.getLong(0)
    h shouldBe d
    d shouldBe m
  }

  test("cascade grains equal the independent per-grain rollups") {
    val cascade = Medallion.rollupCascade(gold).cache()
    try {
      val independents = Seq(
        "hour" -> Medallion.hourRollup(gold),
        "day" -> Medallion.dayRollup(gold),
        "month" -> Medallion.monthRollup(gold))
      for ((grain, direct) <- independents) {
        val fromCascade = cascade.filter(col("grain") === grain).drop("grain")
        fromCascade.count() shouldBe direct.count()
        // reaggregated-from-partials must be EXACTLY the direct scan
        // (decimal partials make merge order irrelevant)
        fromCascade.exceptAll(direct).count() shouldBe 0L
        direct.exceptAll(fromCascade).count() shouldBe 0L
      }
    } finally cascade.unpersist()
  }

  test("latest picks max timestamp per 4-key") {
    val latest = Medallion.latest(gold)
    val maxTs = gold.groupBy("remote_id", "metric_id", "provider_id",
      "category_id").agg(max("unix_timestamp").as("mx"))
    latest.count() shouldBe maxTs.count()
    latest.join(maxTs, Seq("remote_id", "metric_id", "provider_id",
      "category_id")).filter(col("unix_timestamp") =!= col("mx"))
      .count() shouldBe 0L
  }

  test("gold plan broadcasts both dims (no shuffle join, no BNLJ on serial)") {
    val plan = gold.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("dim repair drops exactly the dup-active serials, idempotently") {
    val corrupt = Dims.deviceHistoryWithDups(spark)
    val repaired = Dims.repairDupActive(corrupt)
    // 14 serials (every 10th of 140) were double-written; each loses
    // all 3 of its rows (a-interval + b-interval + dup): 294 -> 252
    corrupt.count() shouldBe 294L
    repaired.count() shouldBe 252L
    repaired.filter(col("removed_on").isNull)
      .groupBy("serial", "remote_id").count()
      .filter(col("count") > 1).count() shouldBe 0L
    // idempotent: a second repair pass is the identity (the overwrite
    // gate in the reference flow — equal frames means skip the write)
    val again = Dims.repairDupActive(repaired)
    again.except(repaired).union(repaired.except(again))
      .count() shouldBe 0L
  }
}
