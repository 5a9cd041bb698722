package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Hll
import graft.sources.Topic

/** Streaming mergeable-sketch state (st22) — the pattern that makes
  * distinct-counting feasible on an UNBOUNDED stream at 100 TB: an
  * exact streaming `count(DISTINCT user)` needs state proportional to
  * the number of distinct users ever seen; a per-batch HLL sketch
  * ([[Hll]] — the engine-portable, bit-deterministic one q44/q47
  * already verify) keeps per-batch state at ≤ |groups|·256 rows
  * FOREVER, and bucket-wise `max` is associative and commutative, so
  * the accumulated "distinct users so far" after every arrival wave is
  * a pure MERGE of the stored per-batch sketches — no raw-event
  * re-scan, no order sensitivity, replay-idempotent by construction.
  *
  * Per micro-batch: ONE map-side projection (hash → bucket/rank) + a
  * partial-aggregated `max(rank)` per (event_type, bucket), written
  * overwrite-idempotent to `sketch/batch=<id>`. The report derives,
  * for every batch b, the estimate over the bucket-wise max of
  * batches ≤ b — frames of |batches| × |types| × 256 rows,
  * broadcast-sized forever. Batches are event_id-mod-nSlices arrival
  * waves with mtime-forced order, so plain SQL replays both the
  * membership and (because merge == direct on any prefix — the q47
  * associativity argument) the whole report: the oracle computes each
  * prefix's estimate DIRECTLY from the raw events without ever seeing
  * the stored partials, proving the streaming merge path cross-engine.
  */
object StreamSketch {

  /** Publish `events` as `nSlices` arrival waves (slice k = event_id
    * mod nSlices), one file each, mtime-ordered — the membership rule
    * the oracle replays. */
  def publishSliced(events: DataFrame, topicDir: String,
      nSlices: Int): Unit =
    Topic.publishOrderedSlices(topicDir, nSlices) { (k, append) =>
      Topic.publishEvents(
        events.filter(
          pmod(col("event_id"), lit(nSlices.toLong)) === k.toLong),
        topicDir, nFiles = 1, append = append)
    }

  /** One micro-batch's work: the batch's per-(event_type, bucket) max
    * rank — ≤ |types|·256 rows at ANY batch size — written
    * idempotently to its own subdirectory. */
  def processBatch(batch: DataFrame, batchId: Long, root: String): Unit =
    Hll.sketch(batch, Seq("event_type"), col("user_id"))
      .write.mode("overwrite").parquet(s"$root/sketch/batch=$batchId")

  /** The as-of report from the accumulated sketch store: for every
    * batch b, the HLL distinct-user estimate per event_type over
    * everything that arrived in batches ≤ b (bucket-wise max merge,
    * then the q44 estimator tail). */
  def report(spark: SparkSession, root: String): DataFrame = {
    val sk = spark.read.parquet(s"$root/sketch")
      .select(col("batch").cast("long").as("sk_batch"),
        col("event_type"), col("bucket"), col("rank"))
    // aliases: `asof` derives from `sk`, so a bare column reference in
    // the self-join condition would be ambiguous lineage
    val asof = sk.select(col("sk_batch").as("batch")).distinct().alias("a")
    val merged = asof
      .join(sk.alias("s"), col("s.sk_batch") <= col("a.batch"))
      .groupBy(col("batch"), col("event_type"), col("bucket"))
      .agg(max("rank").as("rank"))
    Hll.estimate(merged, Seq("batch", "event_type"))
      .orderBy("batch", "event_type")
  }

  /** Publish, stream, sketch per batch, return the as-of report — the
    * registered st22 entry. */
  def run(spark: SparkSession, events: DataFrame, root: String,
      nSlices: Int = 4): DataFrame = {
    Files.createDirectories(Paths.get(root))
    publishSliced(events, s"$root/topic", nSlices)
    val src = Topic.decodeEvents(
      Topic.readStream(spark, s"$root/topic", maxFilesPerTrigger = 1))
    val q = src.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root)
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    report(spark, root)
  }

  /** The same as-of report computed without the stream (batch =
    * event_id mod nSlices, direct estimate per prefix — no stored
    * partials at all): merge == direct because bucket-wise max is
    * associative, so this IS the spec's invariance reference. */
  def batchReference(events: DataFrame, nSlices: Int = 4): DataFrame = {
    val sliced = events.select(
      pmod(col("event_id"), lit(nSlices.toLong)).as("slice"),
      col("event_type"), col("user_id"))
    val asof = sliced.select(col("slice").as("batch")).distinct().alias("a")
    val prefixed = asof.join(sliced.alias("s"),
      col("s.slice") <= col("a.batch"))
    Hll.distinctEstimate(prefixed, Seq("batch", "event_type"),
        col("user_id"))
      .orderBy("batch", "event_type")
  }
}
