package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

/** TopKAgg: the bounded top-k aggregate must agree exactly with the
  * window row_number formulation, run its partial map-side, and be
  * callable from SQL via the extension registry.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = {
    // deterministic pseudo-random fixture: 5 keys x 200 rows
    val rnd = new scala.util.Random(42)
    (1 to 1000).map { i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toDouble, i.toLong)
    }.toDF("key", "v", "id")
  }

  private def windowTop3 = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id"))
    rows.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("key", "rk", "v", "id")
  }

  private def aggTop3 =
    rows.groupBy("key")
      .agg(TopKAgg.topK(struct(col("v"), (-col("id")).as("ni")), 3).as("top"))
      .select(col("key"), posexplode(col("top")))
      .select(col("key"), (col("pos") + 1).cast("int").as("rk"),
        col("col.v").as("v"), (-col("col.ni")).as("id"))

  test("topk agrees exactly with the window top-k, ties included") {
    val expected = windowTop3.as[(String, Int, Double, Long)].collect().toSet
    val got = aggTop3.as[(String, Int, Double, Long)].collect().toSet
    got shouldBe expected
  }

  test("topk aggregation runs a map-side partial") {
    val df = aggTop3
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should include("ObjectHashAggregate")
    plan should include("partial_topk")
  }

  test("k larger than the group returns the whole group, still sorted") {
    val small = Seq(("a", 2.0, 1L), ("a", 5.0, 2L)).toDF("key", "v", "id")
    val out = small.groupBy("key")
      .agg(TopKAgg.topK(struct(col("v"), (-col("id")).as("ni")), 9).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.v")).as[Double].collect()
    out.toSeq shouldBe Seq(5.0, 2.0)
  }

  test("topk is SQL-callable through the extension registry") {
    GraftExtensions.register(spark)
    rows.createOrReplaceTempView("topk_rows")
    val out = spark.sql(
      """SELECT key, topk(named_struct('v', v, 'ni', -id), 2) AS top
        |FROM topk_rows GROUP BY key""".stripMargin)
    out.count() shouldBe 5
    out.select(org.apache.spark.sql.functions.size(col("top")))
      .as[Int].collect().foreach(_ shouldBe 2)
  }

  test("non-struct input is rejected at analysis time, not execution") {
    val flat = Seq(("a", 1.0)).toDF("key", "v")
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      flat.groupBy("key").agg(TopKAgg.topK(col("v"), 2)).collect()
  }

  test("asc flags rank a string tiebreak ascending, matching the window") {
    import org.apache.spark.sql.expressions.Window
    // ties on the score force the string tiebreak to decide —
    // `ORDER BY v DESC, term ASC`, which negation cannot encode
    val terms = Seq(
      ("a", 2.0, "zeta"), ("a", 2.0, "alpha"), ("a", 2.0, "mid"),
      ("a", 1.0, "beta"), ("b", 3.0, "bb"), ("b", 3.0, "aa"))
      .toDF("key", "v", "term")
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("term"))
    val expected = terms
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .select("key", "rk", "v", "term")
      .as[(String, Int, Double, String)].collect().toSet
    val got = terms.groupBy("key")
      .agg(TopKAgg.topK(struct(col("v"), col("term")), 2,
        asc = Seq(false, true)).as("top"))
      .select(col("key"), posexplode(col("top")))
      .select(col("key"), (col("pos") + 1).cast("int").as("rk"),
        col("col.v").as("v"), col("col.term").as("term"))
      .as[(String, Int, Double, String)].collect().toSet
    got shouldBe expected
  }

  test("asc-flag heaps merge correctly across partials under ties") {
    // many tied scores spread over many input partitions: the
    // partial/final merge must keep the lexicographically SMALLEST
    // terms, not whichever partial arrived first
    val n = 500
    val df = (1 to n).map(i => ("k", 1.0, f"t$i%04d")).toDF("key", "v", "term")
      .repartition(13)
    val got = df.groupBy("key")
      .agg(TopKAgg.topK(struct(col("v"), col("term")), 3,
        asc = Seq(false, true)).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.term")).as[String].collect().toSeq
    got shouldBe Seq("t0001", "t0002", "t0003")
  }

  test("mismatched asc arity is rejected at analysis time") {
    val df = Seq(("a", 1.0, 2L)).toDF("key", "v", "id")
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      df.groupBy("key")
        .agg(TopKAgg.topK(struct(col("v"), col("id")), 2,
          asc = Seq(true)).as("top"))
        .collect()
  }
}
