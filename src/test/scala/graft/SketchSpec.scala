package graft

import org.apache.spark.sql.functions._

/** Sketch-layer checks: HyperLogLog++ cardinality and quantile
  * summaries. These are the approximate aggregates a 100 TB profile
  * pass leans on (exact distinct/percentile would shuffle every value);
  * correctness here means bounded error vs the exact answer, not
  * equality, so they are spec-tested rather than oracle-hashed.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.documents(spark, SfDir)
  private lazy val events = graft.sources.Tables.events(spark, SfDir)

  test("approx_count_distinct tracks exact distinct within rsd bounds") {
    val terms = docs.select(explode(graft.text.TextFns.words($"text"))
      .as("term"))
    val exact = terms.distinct().count().toDouble
    // rsd 2%: HLL++ error is probabilistic; 5x rsd is a safe test bound
    val approx = terms.agg(approx_count_distinct($"term", 0.02))
      .as[Long].collect()(0).toDouble
    math.abs(approx - exact) / exact should be < 0.10
  }

  test("grouped approx_count_distinct is map-side partial (one shuffle)") {
    val df = events.groupBy($"event_type")
      .agg(approx_count_distinct($"user_id").as("users"))
    df.collect()
    // final AQE plan only (toString appends the initial plan too)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // partial + final HashAggregate around a single exchange: the
    // sketch merges associatively, so no second shuffle is needed
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    plan should include("partial_approx_count_distinct")
    val exact = events.select($"event_type", $"user_id").distinct()
      .groupBy($"event_type").agg(count(lit(1)).as("exact"))
    df.join(exact, "event_type")
      .filter(abs($"users" - $"exact") / $"exact" > 0.15)
      .count() shouldBe 0
  }

  test("approxQuantile brackets the exact median within relativeError") {
    val values = events.select($"value")
    val Array(q50) = values.stat.approxQuantile("value", Array(0.5), 0.01)
    val n = values.count()
    val below = values.filter($"value" <= q50).count().toDouble / n
    // a 1%-error median must split the data near 50/50
    below should (be >= 0.47 and be <= 0.53)
  }

  test("portable HLL estimates distinct users within ~3 standard errors") {
    import graft.functions.Hll
    val est = Hll.distinctEstimate(events, Seq("event_type"), $"user_id")
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    // m=256 -> sigma ~= 6.5%; every group must land within ~3 sigma
    est.join(exact, "event_type")
      .filter(abs($"hll_est" - $"n_exact") / $"n_exact" > 0.20)
      .count() shouldBe 0
  }

  test("portable HLL sketches merge by bucket-wise max") {
    import graft.functions.Hll
    val a = events.filter($"event_id" % 2 === 0)
    val b = events.filter($"event_id" % 2 =!= 0)
    val merged = Hll.estimate(
      Hll.merge(Hll.sketch(a, Seq("event_type"), $"user_id"),
        Hll.sketch(b, Seq("event_type"), $"user_id"),
        Seq("event_type")),
      Seq("event_type"))
    val whole = Hll.distinctEstimate(events, Seq("event_type"), $"user_id")
    // merging partial sketches must reproduce the whole-corpus sketch
    // exactly (max is associative), not just approximately
    merged.collect().toSet shouldBe whole.collect().toSet
  }

  test("HLL rejects key columns that collide with its working columns") {
    import graft.functions.Hll
    val df = events.withColumnRenamed("event_type", "bucket")
    val e = the[IllegalArgumentException] thrownBy
      Hll.sketch(df, Seq("bucket"), $"user_id")
    e.getMessage should include("bucket")
    e.getMessage should include("rename")
  }

  test("histogram sketches merge to the direct sketch; estimates bracket") {
    import graft.functions.Hist
    val a = events.filter($"event_id" % 2 === 0)
    val b = events.filter($"event_id" % 2 =!= 0)
    val merged = Hist.merge(
      Hist.sketch(a, Seq("event_type"), $"value"),
      Hist.sketch(b, Seq("event_type"), $"value"), Seq("event_type"))
    val direct = Hist.sketch(events, Seq("event_type"), $"value")
    // count-sum is associative: merged partials == one-pass sketch
    merged.collect().toSet shouldBe direct.collect().toSet
    // the estimate lands in the bucket of the discrete rank-ceil(pn/100)
    // order statistic, so it sits within one bucket width (2^-2) of it
    // (the INTERPOLATED percentile can legitimately sit further away
    // when adjacent order stats straddle sparse buckets)
    val est = Hist.quantiles(direct, Seq("event_type"), Seq(50, 90))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val byType = events.select($"event_type", $"value")
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (t, vs) => t -> vs.map(_._2).sorted }
    for ((t, vs) <- byType; p <- Seq(50, 90)) {
      val v = vs(math.ceil(p * vs.length / 100.0).toInt - 1)
      est((t, p)) shouldBe v +- 0.25
    }
  }

  test("Hist rejects key columns that collide with its working columns") {
    import graft.functions.Hist
    val df = events.withColumnRenamed("event_type", "cum")
    val e = the[IllegalArgumentException] thrownBy
      Hist.sketch(df, Seq("cum"), $"value")
    e.getMessage should include("cum")
    e.getMessage should include("rename")
  }

  test("CMS estimates upper-bound exact counts; merge equals direct") {
    import graft.functions.Cms
    val a = events.filter($"event_id" % 2 === 0)
    val b = events.filter($"event_id" % 2 =!= 0)
    val merged = Cms.merge(
      Cms.sketch(a, Seq("event_type"), $"user_id"),
      Cms.sketch(b, Seq("event_type"), $"user_id"), Seq("event_type"))
    val direct = Cms.sketch(events, Seq("event_type"), $"user_id")
    // cell-sum is associative: merged partials == one-pass sketch
    merged.collect().toSet shouldBe direct.collect().toSet
    // CM guarantee: est >= exact for EVERY user, never an undercount
    val cells = direct.groupBy("j", "bucket").agg(sum("c").as("c"))
    val exact = events.groupBy("user_id").agg(count(lit(1)).as("exact"))
    Cms.estimate(cells, exact, $"user_id")
      .filter($"est" < $"exact").count() shouldBe 0
  }

  test("CMS is exact when width far exceeds the distinct-value count") {
    import graft.functions.Cms
    // 20 distinct values into 2^16 buckets x 4 rows: a collision across
    // all 4 rows is ~impossible, so min-over-rows recovers exact counts
    val df = spark.range(200).select(($"id" % 20).as("v"))
    val cells = Cms.sketch(df, Seq.empty, $"v", d = 4, w = 1 << 16)
    val items = df.groupBy($"v").agg(count(lit(1)).as("exact"))
    Cms.estimate(cells, items, $"v", d = 4, w = 1 << 16)
      .filter($"est" =!= $"exact").count() shouldBe 0
  }

  test("CMS rejects item/key columns that collide with working columns") {
    import graft.functions.Cms
    val df = events.withColumnRenamed("event_type", "bucket")
    val e = the[IllegalArgumentException] thrownBy
      Cms.sketch(df, Seq("bucket"), $"user_id")
    e.getMessage should include("bucket")
    e.getMessage should include("rename")
  }
}
