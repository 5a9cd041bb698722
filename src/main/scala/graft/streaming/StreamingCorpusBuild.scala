package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

import graft.sources.Topic
import graft.text.{Dedup, TextFns}

/** Incremental corpus build: t28's batch topology (quality gate →
  * near-dup dedup → decontaminate → leakage-safe split → deterministic
  * shuffle shards → per-shard packing) under micro-batch arrival — the
  * production shape, where documents stream in and the corpus release
  * is CUT from accumulated state instead of rebuilt from raw text.
  *
  * Per-batch (arrival-time, O(delta + delta×index)) work — each
  * document's TEXT is scanned exactly once, in the batch it arrives:
  *   1. quality gate (per-doc, order-free);
  *   2. MinHash signatures + incremental LSH pairs vs the accumulated
  *      signature index ([[Dedup.incrementalLshPairsManaged]] —
  *      [[IngestDedup]]'s machinery: delta buckets broadcast, no
  *      index–index pairs, every pair discovered exactly once);
  *   3. token counts + hashed shingles appended to per-batch stores;
  *   4. incremental decontamination deltas: a training document's
  *      eval-overlap count grows as EITHER side arrives — new train
  *      shingles join the accumulated eval-shingle set (this batch
  *      included), and first-appearance eval shingles join the
  *      accumulated train-shingle store — so the per-doc sum over all
  *      deltas equals the batch overlap count no matter how arrivals
  *      interleave (each (doc, shingle) hit is counted exactly once:
  *      at the LATER of the doc's and the shingle's arrival).
  *
  * Publish ([[publish]], the "cut a release" step) derives the shard
  * manifest from the accumulated COMPACT tables only — pairs, token
  * counts, overlap sums; never raw text: connected components → one
  * canonical per cluster → drop eval + contaminated → leakage-safe
  * cluster-keyed split → md5-ranked shuffle shards → pack manifest.
  * Clustering and global ranking are inherently corpus-global, so they
  * run at publish time; everything they consume accumulated
  * incrementally, and all state tables are append-only `batch=<id>`
  * subdirectories written in overwrite mode (crash/replay of a batch
  * rewrites identical content — [[IngestDedup]]'s idempotency
  * contract).
  *
  * Batching invariance (the st11 pattern, spec-pinned across
  * slicings): gate and token counts are per-doc; pair discovery is
  * invariant in the sub-cap regime; overlap deltas sum to the batch
  * count — so the published manifest equals [[batchReference]] (the
  * same topology computed in one shot) for ANY slicing of the stream.
  *
  * COMMIT STRUCTURE (why the ~6 writes per micro-batch do NOT share
  * one manifest commit): five of the six stores are read back WITHIN
  * the batch that writes them — `index` must exist before candidate
  * generation reads the stored signatures (the compute-once + crash
  * contract), `evalsh` before the d1/d2 delta joins (the
  * count-once-at-the-later-arrival contract), `trainsh` before d1 —
  * i.e. they are materialization barriers for exactly-once
  * accounting, not mere sinks; deferring them into a shared
  * end-of-batch commit would re-open the double-count window a crash
  * between compute and commit creates. The only foldable pair is
  * `meta` into `index` (one commit of ~7 per batch, and it would
  * thread n_tok through the oracle-mirrored signature aggregation
  * five gates pin). The per-batch commit count is therefore the
  * PRICED cost of the crash-isolation contract, not accidental
  * overhead — st16's bench wall-clock (~15 s, the registry's slowest)
  * is this machinery, measured flat on the cores axis and sub-linear
  * on the data axis (PROBES stream_scale_probe).
  */
object StreamingCorpusBuild {

  private val sigSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("sig", ArrayType(StringType))))

  private val isEval = col("doc_id") % 97 === 0

  /** Publish `docs` as a topic, stream it through the per-batch build,
    * then cut the release: returns the shard manifest
    * (shard, n_docs, n_tokens, n_packs, pos_lo, pos_hi). `shardSize`
    * None (the default) derives a scale-safe size from the train
    * count at publish time — see [[publish]]. */
  def run(spark: SparkSession, docs: DataFrame, root: String,
      nFiles: Int = 4, maxFilesPerTrigger: Int = 1,
      shardSize: Option[Int] = None): DataFrame = {
    Topic.publishDocuments(docs, s"$root/topic", nFiles = nFiles)
    val src = Topic.decodeDocuments(
      Topic.readStream(spark, s"$root/topic", maxFilesPerTrigger))
    val q = src.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root)
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    publish(spark, root, shardSize)
  }

  /** One micro-batch's arrival-time work, idempotent in `batchId`:
    * every read of accumulated state takes `batch < batchId` only, and
    * every write overwrites this batch's own subdirectory. */
  def processBatch(batch: DataFrame, batchId: Long, root: String): Unit = {
    val sp = batch.sparkSession
    // accumulated-state existence goes through the Hadoop FileSystem
    // API — a java.nio probe answers for the LOCAL fs only, and on an
    // HDFS/S3 store-root it would read "absent" every batch, silently
    // resetting the signature index and both shingle stores
    val fs = StreamRefit.hfs(sp, root)
    def prev(dir: String): Option[DataFrame] =
      if (fs.exists(new org.apache.hadoop.fs.Path(root, dir)))
        Some(sp.read.parquet(s"$root/$dir").filter(col("batch") < batchId))
      else None
    // NOT respread: measured 3–5 s SLOWER with Spread.across(batch)
    // here — the per-batch stores written straight off this cache
    // (meta, trainsh) would go from 1 file to shuffle-partitions
    // files each, and the added exchange latency compounds across the
    // ~50 bounded jobs a batch already runs. The one genuinely heavy
    // consumer (the signature aggregation) is respread inside
    // Dedup.shingles instead.
    val scored = batch.select(col("doc_id"), col("text"), isEval.as("ev"),
        (TextFns.qualityScore(col("text")) >= 0.5).as("gated"))
      .persist()
    try {
      val gated = scored.filter(col("gated")).select("doc_id", "text")
      // gated-doc roster + token counts (the publish step's only
      // per-doc metadata; eval docs participate in clusters, so they
      // stay on the roster until the publish-time eval filter)
      gated.select(col("doc_id"),
          TextFns.bpeTokenCount(col("text")).as("n_tok"))
        .write.mode("overwrite").parquet(s"$root/meta/batch=$batchId")
      // incremental LSH vs the accumulated GATED signature index.
      // Signatures are computed ONCE: written to the index first, then
      // the stored rows feed candidate generation (the raw-docs form
      // would re-shingle + re-aggregate the same text twice per batch);
      // the `index` frame reads strictly-earlier batches, so a crash
      // between the two writes retries into identical overwrites.
      val index = prev("index").map(_.select("id", "sig")).getOrElse(
        sp.createDataFrame(new java.util.ArrayList[Row](), sigSchema))
      Dedup.minhashSignatures(gated, "doc_id", "text", 12, 3)
        .write.mode("overwrite").parquet(s"$root/index/batch=$batchId")
      val deltaSigs = sp.read.parquet(s"$root/index/batch=$batchId")
        .select("id", "sig")
      val (pairs, release) =
        Dedup.incrementalLshPairsFromSigsManaged(index, deltaSigs)
      try pairs.select("a", "b")
        .write.mode("overwrite").parquet(s"$root/pairs/batch=$batchId")
      finally release()
      // hashed-shingle stores: train side per doc, eval side as the
      // FIRST-APPEARANCE distinct set (so the accumulated eval store
      // is distinct by construction — no per-batch global distinct)
      val sh = scored.filter(col("gated") || col("ev"))
        .select(col("doc_id"), col("ev"),
          explode(graft.functions.ShingleHashes(
            TextFns.words(col("text")), 3)).as("sh"))
      sh.filter(!col("ev")).select("doc_id", "sh")
        .write.mode("overwrite").parquet(s"$root/trainsh/batch=$batchId")
      val newEvalAll = sh.filter(col("ev")).select("sh").distinct()
      val newEval = prev("evalsh") match {
        case Some(p) => newEvalAll.join(broadcast(p.select("sh")),
          Seq("sh"), "left_anti")
        case None => newEvalAll
      }
      newEval.write.mode("overwrite").parquet(s"$root/evalsh/batch=$batchId")
      // decontam deltas: (a) this batch's train shingles vs the eval
      // set up to AND INCLUDING this batch, (b) earlier train shingles
      // vs this batch's first-appearance eval shingles — each
      // (doc, shingle) overlap is counted at the later arrival, once.
      val newEvalStored = sp.read
        .parquet(s"$root/evalsh/batch=$batchId").select("sh")
      val evalAll = prev("evalsh").map(_.select("sh"))
        .fold(newEvalStored)(_.unionByName(newEvalStored))
      val newTrain = sp.read.parquet(s"$root/trainsh/batch=$batchId")
        .select("doc_id", "sh")
      // the eval-shingle set is bounded by the held-out corpus (small
      // and fixed while train grows unboundedly) — broadcast it so the
      // train-side shingle table never shuffles on `sh`
      val d1 = newTrain.join(broadcast(evalAll), "sh")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared_delta"))
      val d2 = prev("trainsh") match {
        case Some(p) => p.select("doc_id", "sh")
          .join(broadcast(newEvalStored), "sh")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared_delta"))
        case None => d1.limit(0)
      }
      d1.unionByName(d2)
        .write.mode("overwrite").parquet(s"$root/shared/batch=$batchId")
    } finally scored.unpersist()
  }

  /** Cut the corpus release from accumulated state: the shard manifest
    * a training run consumes. Touches only the compact derived tables
    * (pairs, meta, overlap sums) — never document text. `shardSize`
    * None (the default) derives a scale-safe size from the train count
    * ([[graft.queries.TextQueries.derivedShardSize]]: shard count
    * capped at 10^5 — 64-doc shards at web scale are a
    * filesystem-metadata bug); the oracled st16/st25 entries pass
    * Some(64), the t28 testdata shape their DuckDB SQL pins. */
  def publish(spark: SparkSession, root: String,
      shardSize: Option[Int] = None): DataFrame = {
    val meta = spark.read.parquet(s"$root/meta").select("doc_id", "n_tok")
    val pairs = spark.read.parquet(s"$root/pairs").select("a", "b")
    val labels = graft.operators.ConnectedComponents.run(pairs)
      .withColumnRenamed("node", "doc_id")
    val kept = meta.join(labels, Seq("doc_id"), "left")
      .filter(col("label").isNull || col("doc_id") === col("label"))
    // contamination: accumulated overlap sums vs per-doc shingle counts
    val nSh = spark.read.parquet(s"$root/trainsh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val contam =
      if (StreamRefit.hfs(spark, root)
          .exists(new org.apache.hadoop.fs.Path(root, "shared")))
        spark.read.parquet(s"$root/shared")
          .groupBy("doc_id").agg(sum("n_shared_delta").as("n_shared"))
          .join(nSh, "doc_id")
          .filter(col("n_shared") * 1.0 / col("n_sh") >= 0.5)
          .select("doc_id")
      else nSh.select("doc_id").limit(0)
    val clean = kept.filter(!isEval)
      .join(contam, Seq("doc_id"), "left_anti")
    // leakage-safe split: the whole cluster shares one split key (t26)
    val train = clean
      .withColumn("split_key", coalesce(col("label"), col("doc_id")))
      .filter(TextFns.splitAssign(col("split_key")) === "train")
    manifestTail(train, shardSize)
  }

  /** The shared manifest tail — t28's steps 5–6 (deterministic
    * md5-ranked shuffle → fixed-size shards → 2048-token pack
    * manifest), delegated to the SAME helpers t28 and the batch front
    * door use ([[graft.queries.TextQueries.shardAssignments]] /
    * manifestOf — unit-pinned by TextFnsSpec), so the streamed and
    * batch arcs cannot drift.
    *
    * None → derived scale-safe size. The derivation needs the train
    * count BEFORE the manifest plan exists, so the derived path
    * persists the compact (doc_id, n_tok) train frame (the publish
    * subtree above it — CC labels, contam anti-join, split filter —
    * would otherwise run once for the count and again for the
    * manifest) and returns the manifest MATERIALIZED: its row count
    * is capped at 10^5 + 1 by the very derivation that sized it, so
    * localizing is bounded by construction, and it lets the cache be
    * released here instead of leaking to the caller. The pinned path
    * (the oracled st16/st25 entries) is untouched — same lazy plan as
    * ever. */
  private def manifestTail(train: DataFrame,
      shardSize: Option[Int]): DataFrame = {
    import graft.queries.TextQueries
    val compact = train.select("doc_id", "n_tok")
    shardSize match {
      case Some(s) =>
        TextQueries.manifestOf(TextQueries.shardAssignments(compact, s))
      case None =>
        val spark = train.sparkSession
        val t = compact.persist()
        try {
          val size = TextQueries.derivedShardSize(t.count())
          val m = TextQueries.manifestOf(
            TextQueries.shardAssignments(t, size))
          val rows = m.collect() // ≤ 10^5 + 1 rows — the size cap's bound
          spark.createDataFrame(
            java.util.Arrays.asList(rows: _*), m.schema)
        } finally t.unpersist()
    }
  }

  /** The SAME topology in one batch shot (quality gate → MinHash-LSH
    * pairs → clusters → keep → decontaminate → split → shards): the
    * reference the streamed build must equal under any slicing. Kept
    * next to the streaming code because the equality IS the operator's
    * contract; the spec asserts it across slicings. */
  def batchReference(docs: DataFrame,
      shardSize: Option[Int] = None): DataFrame = {
    val gated = docs
      .filter(TextFns.qualityScore(col("text")) >= 0.5)
      .select("doc_id", "text")
    val (pairs, release) = Dedup.minhashLshPairsManaged(gated)
    val labels =
      try graft.operators.ConnectedComponents.run(pairs)
        .withColumnRenamed("node", "doc_id")
      finally release()
    val kept = gated
      .select(col("doc_id"), TextFns.bpeTokenCount(col("text")).as("n_tok"))
      .join(labels, Seq("doc_id"), "left")
      .filter(col("label").isNull || col("doc_id") === col("label"))
    val contam = graft.text.Decontaminate.overlapStats(
        docs.filter(isEval).select("doc_id", "text")
          .unionByName(gated.filter(!isEval)),
        col("doc_id") % 97 === 0)
      .filter(col("n_shared") * 1.0 / col("n_sh") >= 0.5)
      .select(col("id").as("doc_id"))
    val clean = kept.filter(!isEval)
      .join(contam, Seq("doc_id"), "left_anti")
    val train = clean
      .withColumn("split_key", coalesce(col("label"), col("doc_id")))
      .filter(TextFns.splitAssign(col("split_key")) === "train")
    manifestTail(train, shardSize)
  }
}
