package graft.streaming


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Topic

/** Drift → QUARANTINE routing (st21) — st20's DATA-plane twin: st20
  * acts on the MODEL (refit on the clean pool when a batch's drift
  * fires); this acts on the DATA — a firing batch's documents are
  * routed to a quarantine store at INGEST time instead of landing in
  * the curated corpus, the production rule that suspect data must
  * never be visible to downstream consumers, not even transiently
  * (filtering at read time would leave a window where a training job
  * launched mid-ingest picks the poisoned batch up).
  *
  * Per micro-batch:
  *  1. write the batch's histogram over [[StreamRefit.axis]] (st18's
  *     token-length log-buckets) to the accumulated `hist/batch=<id>`
  *     store — overwrite-idempotent, ≤ ~12 cells;
  *  2. decide THIS batch's firing from the accumulated store
  *     ([[StreamRefit.decisionFor]]: exact integer cross-multiplied
  *     threshold test in BigInt against strictly-earlier batches —
  *     later batches' histograms, present during a replay, never
  *     enter batch b's prev-side sums) and record it in the
  *     append-only `dec/` store;
  *  3. write the batch's documents to
  *     `routed/route=<corpus|quarantine>/batch=<id>` — the route is a
  *     deterministic function of the accumulated store, so a
  *     crash/replay recomputes the identical decision and overwrites
  *     the identical directory (a replay can never flip a route and
  *     leave the old directory stale — spec-pinned).
  *
  * The oracle replays the PINNED firing pattern (at sf0.01 the
  * doc_id-mod-4 slicing fires exactly at batch 2 — the same st18
  * ratios st20's oracle pins: 112000 / 176000 / 48000 ppm vs the
  * 150000 threshold); a divergent Spark-side decision routes a whole
  * batch differently and goes hash-red on every one of its rows.
  *
  * Scale shape: per batch one ≤ ~12-cell histogram agg, ONE bounded
  * own-decision collect (strictly-earlier histogram cells only — no
  * per-arrival re-derivation of every stored batch), and one
  * partitioned append of the batch itself — O(batch), never a re-scan
  * of the accumulated corpus. The routed store is partitioned by
  * (route, batch), so downstream consumers prune to `route=corpus`
  * at the parquet-scan level: the quarantine never costs them a read.
  */
object StreamQuarantine {

  /** One micro-batch: histogram → decision → routed write. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      thresholdPpm: Long = StreamRefit.ThresholdPpm): Unit = {
    // same lineage rule as StreamRefit: a restart with a different
    // threshold would re-decide old batches differently and leave a
    // batch's docs present under BOTH route directories
    val spark = batch.sparkSession
    StreamRefit.enforceThresholdLineage(spark, root, thresholdPpm)
    // two actions consume the raw micro-batch (histogram scoring, the
    // routed write); cache it for the batch's scope so the topic file
    // is decoded once, not per action (guide §1.2)
    val b = batch.persist()
    try {
      StreamDrift.processBatch(b, batchId, root, StreamRefit.axis,
        cumulative = true)
      // the route needs ONLY this batch's decision — one bounded
      // decisionFor collect against strictly-earlier histograms, stored
      // append-only so audits/replays read instead of re-deriving (an
      // empty micro-batch has no histogram rows and its drift-test limit
      // is clean: drift_num = 0 — see StreamRefit)
      val fired = StreamRefit.ownDecision(spark, root, batchId, thresholdPpm)
      routeBatch(b, batchId, root, fired)
    } finally b.unpersist()
  }

  /** The DATA-plane action alone, given an already-derived decision —
    * the piece a COMPOSING caller (st24's [[StreamLineage]]) invokes
    * after performing the shared store/decide step once, so the
    * composed actor family never writes hist/cumhist or derives the
    * decision twice per micro-batch. */
  private[streaming] def routeBatch(batch: DataFrame, batchId: Long,
      root: String, fired: Boolean): Unit = {
    val route = if (fired) "quarantine" else "corpus"
    batch.select(col("doc_id"), col("text"), col("lang"))
      .write.mode("overwrite")
      .parquet(s"$root/routed/route=$route/batch=$batchId")
  }

  /** The routed corpus view: every ingested document with the batch it
    * arrived in and the route its batch's drift decision assigned. */
  def routed(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/routed")
      .select(col("doc_id"), col("batch").cast("long").as("batch"),
        col("route").cast("string").as("route"))
      .orderBy("doc_id")

  /** Publish, stream, route-on-drift, return the routed table — the
    * registered st21 entry. */
  def run(spark: SparkSession, docs: DataFrame, root: String,
      nSlices: Int = 4,
      thresholdPpm: Long = StreamRefit.ThresholdPpm): DataFrame = {
    StreamRefit.hfs(spark, root)
      .mkdirs(new org.apache.hadoop.fs.Path(root))
    StreamDrift.publishSliced(docs, s"$root/topic", nSlices)
    val src = Topic.decodeDocuments(
      Topic.readStream(spark, s"$root/topic", maxFilesPerTrigger = 1))
    val q = src.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, thresholdPpm)
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    routed(spark, root)
  }

  /** The same routed table computed without the stream (batch = doc_id
    * mod nSlices, decisions folded in batch order) — the spec's
    * invariance reference. Only the ≤ nSlices-row decision table is
    * collected; the routing itself is a map-side CASE over the corpus
    * (the audited-bounded driver-action class). */
  def batchReference(docs: DataFrame, nSlices: Int = 4,
      thresholdPpm: Long = StreamRefit.ThresholdPpm): DataFrame = {
    val fired = StreamDrift
      .batchReference(docs, nSlices, StreamRefit.axis)
      .collect() // bounded: one row per batch
      .map { r =>
        r.getLong(0) -> (BigInt(r.getLong(3)) * 1000000 >
          BigInt(thresholdPpm) * BigInt(r.getLong(1)) * BigInt(r.getLong(2)))
      }.toMap
    val route = fired.foldLeft(lit("corpus")) { case (acc, (b, f)) =>
      if (f) when(col("batch") === b, lit("quarantine")).otherwise(acc)
      else acc
    }
    docs.select(col("doc_id"),
        pmod(col("doc_id"), lit(nSlices.toLong)).as("batch"))
      .withColumn("route", route)
      .orderBy("doc_id")
  }
}
