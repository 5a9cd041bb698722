package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHittersAgg.heavyHitters

/** Misra–Gries heavy hitters: the MG guarantees (dominant items always
  * surface, counts underestimate by at most N/(capacity+1)) must hold
  * through Spark's partial/final merge path, and the aggregation must
  * run map-side partials like any built-in agg.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 5000 "hot", 300 "warm", and 200 singletons: N = 5500 + 200
  private lazy val skewed = (
    Seq.fill(5000)("hot") ++ Seq.fill(300)("warm") ++
      (1 to 200).map(i => s"cold$i")
  ).toDF("item").repartition(4) // force a real partial/final merge

  test("guaranteed heavy items surface with near-true lower-bound counts") {
    val out = skewed.agg(heavyHitters($"item", 16).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.count").as[(String, Long)].collect()
    val m = out.toMap
    val n = 5700.0
    // frequency > N/17 = 335 -> "hot" is guaranteed present and top
    out.head._1 shouldBe "hot"
    m("hot").toDouble should be >= (5000 - n / 17)
    m("hot") should be <= 5000L
    // "warm" (300 < 335) is not guaranteed, but any reported count is
    // a lower bound on the true one
    m.get("warm").foreach(_ should be <= 300L)
    out.length should be <= 16
  }

  test("heavy hitters aggregation runs a map-side partial") {
    val df = skewed.agg(heavyHitters($"item", 8).as("hh"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should include("ObjectHashAggregate")
    plan should include("partial_heavy_hitters")
  }

  test("grouped + SQL-registered heavy_hitters works") {
    GraftExtensions.register(spark)
    graft.sources.Tables.events(spark, SfDir)
      .createOrReplaceTempView("hh_events")
    val out = spark.sql(
      """SELECT event_type, heavy_hitters(CAST(user_id AS STRING), 8) AS hh
        |FROM hh_events GROUP BY event_type""".stripMargin)
    out.count() shouldBe 5
    out.select(org.apache.spark.sql.functions.size($"hh")).as[Int]
      .collect().foreach(_ should be <= 8)
  }

  test("non-string input is rejected at analysis time, not execution") {
    val nums = Seq(1L, 2L, 2L).toDF("v")
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      nums.agg(heavyHitters($"v", 4)).collect()
  }
}
