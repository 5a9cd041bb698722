package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: a hot join key must be split at runtime into
  * multiple tasks (the complement of the salting strategy in
  * `functions/Salt` — salting fixes skewed AGGREGATION keys ahead of
  * time, AQE fixes skewed JOIN partitions at runtime from actual map
  * output sizes).
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~100x the median partition's bytes
      val left = spark.range(0, 120000).select(
        when($"id" % 120 === 0, concat(lit("cold"), $"id" % 1200))
          .otherwise(lit("hot")).as("k"),
        md5($"id".cast("string")).as("payload"))
      val right = spark.range(0, 1200).select(
        concat(lit("cold"), $"id").as("k"))
        .union(Seq("hot").toDF("k"))
      val joined = left.join(right, "k")
      // execute THIS frame (count() would finalize a different plan)
      joined.collect().length shouldBe 120000
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      plan should include("skew=true")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
