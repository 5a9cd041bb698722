package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Topic

/** Curation LINEAGE (st24) — the whole actor family composed against
  * ONE shared store-root, which is the point the individual operators
  * build toward: st21 routes the DATA, st20/st23 refit and GATE the
  * model, and because all three derive from the same stores (hist/
  * histogram cells, the append-only dec/ firing bytes, the threshold
  * lineage marker), running them together per micro-batch costs ONE
  * decision derivation, not three. The composition's output is the
  * record a production curation system keeps per document: which
  * batch it arrived in, which route its batch's drift decision
  * assigned (corpus vs quarantine), and which MODEL VERSION was
  * serving at its ingest — the provenance needed to answer "which
  * gate admitted this training document?" months later.
  *
  * Per micro-batch the SHARED store/decide step runs ONCE — lineage
  * marker check, docs store, histogram + cumhist checkpoint, own
  * firing decision — then the two plane actions consume the derived
  * decision directly: [[StreamQuarantine.routeBatch]] (the routed
  * write) and [[StreamPromote.gateBatch]] (champion/challenger
  * evaluation and promote-or-reject on firing batches). Composing at
  * this seam is what makes the composition CHEAPER than its parts run
  * back-to-back: hist/ and cumhist/ commit once per micro-batch, not
  * once per actor. Every step is a pure function of strictly-earlier
  * state plus the batch, so the composition inherits replay
  * idempotence from its parts — a replayed batch re-routes to the
  * identical directory and re-writes the identical candidate rows.
  *
  * SERVING version semantics: the docs of batch b were gated at
  * ingest by the latest version PUBLISHED STRICTLY BEFORE b — batch
  * 0's docs arrive before any model exists (serving_version 0, the
  * pre-bootstrap sentinel; its bootstrap candidate only serves from
  * batch 1 on), and a version published on firing batch b serves
  * from b+1, never retroactively.
  *
  * Scale shape: the union of the parts' shapes — the lineage frame
  * itself is the routed store joined to a ≤|batches|-entry
  * batch→serving map folded driver-side from the bounded candidate
  * store and applied as a literal CASE (zero extra shuffles beyond
  * the routed scan + presentation sort).
  */
object StreamLineage {

  /** One micro-batch: the shared store/decide step ONCE, then route
    * the data and gate the model off the same derived decision. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      thresholdPpm: Long = StreamRefit.ThresholdPpm): Unit = {
    val spark = batch.sparkSession
    StreamRefit.enforceThresholdLineage(spark, root, thresholdPpm)
    // three actions consume the raw micro-batch (docs store, histogram
    // scoring, routed write); cache it for the batch's scope so the
    // topic file is decoded once, not per action (guide §1.2)
    val b = batch.persist()
    try {
      b.select(col("doc_id"), col("text"), col("lang"))
        .write.mode("overwrite").parquet(s"$root/docs/batch=$batchId")
      StreamDrift.processBatch(b, batchId, root, StreamRefit.axis,
        cumulative = true)
      val fired = StreamRefit.ownDecision(spark, root, batchId,
        thresholdPpm)
      StreamQuarantine.routeBatch(b, batchId, root, fired)
      StreamPromote.gateBatch(spark, batchId, root, thresholdPpm, fired)
    } finally b.unpersist()
  }

  /** The per-document lineage: (doc_id, batch, route,
    * serving_version) — serving_version 0 for batch 0 (no model
    * existed at its ingest). */
  def lineage(spark: SparkSession, root: String): DataFrame = {
    // the serving map comes from the pub/ byte trail (one FS listing +
    // |candidates| tiny reads — never a parquet scan of the 64-rows-
    // per-candidate store), cand-fold self-heal for pre-pub roots
    val cands = StreamPromote.publishedVersions(spark, root)
    val routed = StreamQuarantine.routed(spark, root)
    // serving at batch b = version published on the LATEST fired < b;
    // folded into one literal CASE over the bounded candidate list
    val serving = cands.foldLeft(lit(0L)) {
      case (acc, (fired, version)) =>
        when(col("batch") > fired, lit(version)).otherwise(acc)
    }
    routed.select(col("doc_id"), col("batch"), col("route"),
        serving.as("serving_version"))
      .orderBy("doc_id")
  }

  /** Publish, stream, route + gate per batch, return the lineage —
    * the registered st24 entry. */
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
    lineage(spark, root)
  }

  /** The same lineage computed without the stream: the st21 route
    * reference joined with the st23 fold's published versions — the
    * spec's invariance reference. */
  def batchReference(docs: DataFrame, nSlices: Int = 4,
      thresholdPpm: Long = StreamRefit.ThresholdPpm): DataFrame = {
    val routed = StreamQuarantine.batchReference(docs, nSlices,
      thresholdPpm)
    val published = StreamPromote
      .batchReference(docs, nSlices, thresholdPpm)
      .collect { case (fired, _, _, _, _, _, Some(v), "published") =>
        fired -> v
      }.distinct.sortBy(_._1)
    val serving = published.foldLeft(lit(0L)) {
      case (acc, (fired, version)) =>
        when(col("batch") > fired, lit(version)).otherwise(acc)
    }
    routed.select(col("doc_id"), col("batch"), col("route"),
        serving.as("serving_version"))
      .orderBy("doc_id")
  }
}
