package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeRank

/** RangeRank: the distributed replacement for a no-partition
  * `row_number` window. Pins (a) exact equivalence with the window it
  * replaces, (b) the plan shape — range-partitioned exchange, never
  * `Exchange SinglePartition` — for the operator and for the
  * t08_corpus_shuffle query built on it.
  */
class RangeRankSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$SfDir/documents.parquet")

  test("global rank equals the row_number window it replaces") {
    import org.apache.spark.sql.expressions.Window
    val keyed = docs.select($"doc_id", md5($"doc_id".cast("string")).as("h"))
    val viaWindow = keyed
      .withColumn("r", row_number().over(Window.orderBy($"h", $"doc_id"))
        .cast("long"))
      .select("doc_id", "r")
    val viaRank = RangeRank.withGlobalRank(
        keyed, Seq($"h", $"doc_id"), "r")
      .select("doc_id", "r")
    viaRank.collect().sortBy(_.getLong(0)) shouldBe
      viaWindow.collect().sortBy(_.getLong(0))
  }

  test("ranks are a contiguous 1..N permutation across partition bounds") {
    val n = docs.count()
    val ranks = RangeRank.withGlobalRank(docs, Seq($"doc_id"), "r",
        numPartitions = 7) // deliberately != shuffle.partitions
      .select("r").as[Long].collect().sorted
    ranks shouldBe (1L to n).toArray
  }

  test("the sorted substrate plans a range exchange, never SinglePartition") {
    val plan = RangeRank.rangeSorted(docs, Seq($"doc_id"), 8)
      .queryExecution.executedPlan.toString
    plan.toLowerCase should include ("rangepartitioning")
    plan should not include "SinglePartition"
  }

  test("t08_corpus_shuffle plans no window and no single-partition exchange") {
    val df = SparkEntry.queries("t08_corpus_shuffle")(spark, SfDir)
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "SinglePartition"
    df.count() shouldBe docs.count()
  }

  test("rank + prefix sum equal the windows they replace, and the " +
      "returned total is the column sum") {
    import org.apache.spark.sql.expressions.Window
    // coalesce: withRankAndPrefixSum requires a NON-NULLABLE value
    // column (getLong would NPE mid-job on a null)
    val keyed = docs.select($"doc_id",
      md5($"doc_id".cast("string")).as("h"),
      coalesce(pmod($"doc_id", lit(37L)) + 1L, lit(0L)).as("v"))
    val w = Window.orderBy($"h", $"doc_id")
    val viaWindow = keyed
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("c", sum($"v").over(w.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select("doc_id", "r", "c")
    val (ranked, total) = RangeRank.withRankAndPrefixSum(
      keyed, Seq($"h", $"doc_id"), "v", "r", "c",
      numPartitions = 7) // deliberately != shuffle.partitions
    ranked.select("doc_id", "r", "c").collect().sortBy(_.getLong(0)) shouldBe
      viaWindow.collect().sortBy(_.getLong(0))
    total shouldBe keyed.agg(sum("v")).head.getLong(0)
  }

  test("a nullable value column is rejected at construction, not mid-job") {
    val keyed = docs.select($"doc_id",
      md5($"doc_id".cast("string")).as("h"),
      (pmod($"doc_id", lit(37L)) + 1L).as("v")) // nullable
    val e = intercept[IllegalArgumentException] {
      RangeRank.withRankAndPrefixSum(keyed, Seq($"h"), "v", "r", "c")
    }
    e.getMessage should include("nullable")
  }

  test("t36_vocab_coverage plans no window/SinglePartition and crossings " +
      "bracket the thresholds") {
    val df = SparkEntry.queries("t36_vocab_coverage")(spark, SfDir)
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "SinglePartition"
    val rows = df.collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(50L, 90L, 99L)
    val total = rows.head.getLong(4)
    rows.foreach { r =>
      val (pct, cum) = (r.getLong(0), r.getLong(3))
      cum * 100 should be >= pct * total
      // rank at a crossing is monotone in pct by construction
    }
    rows.map(_.getLong(1)).toSeq shouldBe
      rows.map(_.getLong(1)).toSeq.sorted
  }

  test("t27 epoch-shard manifest: contiguous shards, no window, budgets add up") {
    val df = SparkEntry.queries("t27_epoch_shards")(spark, SfDir)
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "SinglePartition"
    val rows = df.collect()
    val n = docs.count()
    // shards are contiguous position ranges of exactly 64 docs (last
    // shard takes the remainder) and cover every doc exactly once
    rows.map(_.getLong(0)).toSeq shouldBe (0L until (n + 63) / 64)
    rows.map(_.getLong(1)).sum shouldBe n
    rows.foreach { r =>
      r.getLong(3) shouldBe r.getLong(0) * 64 + 1 // pos_lo
      r.getLong(4) - r.getLong(3) + 1 shouldBe r.getLong(1) // span = n_docs
    }
  }
}
