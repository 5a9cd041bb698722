package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: score every
  * training document by how much of it appears verbatim (at word
  * n-gram granularity) in a held-out eval/benchmark set, so
  * contaminated documents can be dropped before training.
  *
  * Mechanism: one fused [[graft.functions.ShingleHashes]] pass shingles
  * the whole corpus; the eval side collapses to a distinct shingle-hash
  * set; a training-shingle ∩ eval-set join counts, per training doc,
  * how many of its distinct shingles the eval set contains. Reported as
  * (n_sh, n_shared) so callers pick their own ratio/absolute threshold.
  *
  * Scale shape: shingling is map-side; the overlap is one hash join on
  * 8-byte keys (the eval side is usually orders of magnitude smaller —
  * AQE broadcasts it when it fits) and one partial-aggregated count by
  * doc. No shingle ARRAYS travel, only (id, hash) pairs. Documents with
  * fewer than n words have no shingles and are absent from the output —
  * they cannot be contaminated at this granularity.
  */
object Decontaminate {

  /** Per-training-document overlap stats against the eval subset.
    *
    * @param isEval predicate Column over `docs` rows marking the
    *               eval/benchmark side (those docs are excluded from
    *               the output)
    * @return (id, n_sh, n_shared): distinct-shingle count and how many
    *         of them occur anywhere in the eval set
    */
  def overlapStats(docs: DataFrame, isEval: Column, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): DataFrame = {
    // respread (guide §2.5 — single-row-group inputs would shingle the
    // whole corpus in one task)
    val sh = graft.functions.Spread.across(docs)
      .select(col(idCol).as("id"), isEval.as("is_eval"),
        explode(graft.functions.ShingleHashes(
          TextFns.words(col(textCol)), n)).as("sh"))
      .persist()
    val evalSh = sh.filter(col("is_eval")).select("sh").distinct()
    val train = sh.filter(!col("is_eval"))
    val shared = train.join(evalSh, "sh")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
    train.groupBy("id").agg(count(lit(1)).as("n_sh"))
      .join(shared, Seq("id"), "left")
      .select(col("id"), col("n_sh"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
  }

  /** Contamination ATTRIBUTION: for each training document sharing at
    * least one shingle with the eval set, WHICH eval document
    * contributed most — the "which benchmark leaked into my corpus"
    * report that turns [[overlapStats]]'s drop decision into an
    * actionable one (fix the crawl source, or retire the compromised
    * eval). Output per contaminated training doc: the top contributing
    * eval doc (ties broken to the smallest id), how many of the train
    * doc's shingles that eval doc covers, how many distinct eval docs
    * it collides with at all, and its total distinct shared-shingle
    * count.
    *
    * Scale shape: same 8-byte-key join as [[overlapStats]] but keyed to
    * (train, eval) pairs; the hit table is bounded by actual overlap
    * (tiny relative to the corpus), and both follow-up aggregations
    * read it from cache. Top-contributor selection is the argmax
    * `max(struct(count, -id))` aggregate — no window, no per-doc sort.
    */
  def attribution(docs: DataFrame, isEval: Column, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): DataFrame = {
    val sh = graft.functions.Spread.across(docs)
      .select(col(idCol).as("id"), isEval.as("is_eval"),
        explode(graft.functions.ShingleHashes(
          TextFns.words(col(textCol)), n)).as("sh"))
      .persist()
    val evalSh = sh.filter(col("is_eval"))
      .select(col("id").as("eval_id"), col("sh"))
    // the overlap hit table feeds two aggregations (per-pair counts +
    // per-doc distincts) — persist it, not the join recomputed
    val hits = sh.filter(!col("is_eval")).select(col("id"), col("sh"))
      .join(evalSh, "sh").persist()
    val contrib = hits.groupBy("id", "eval_id")
      .agg(count(lit(1)).as("n_with"))
    val top = contrib.groupBy("id")
      .agg(max(struct(col("n_with"), (-col("eval_id")).as("neg"))).as("m"))
      .select(col("id"), (-col("m.neg")).as("top_eval_id"),
        col("m.n_with").as("n_top_shared"))
    val tot = hits.groupBy("id")
      .agg(countDistinct("eval_id").as("n_evals"),
        countDistinct("sh").as("n_shared"))
    top.join(tot, "id")
      .select(col("id").as("doc_id"), col("top_eval_id"),
        col("n_top_shared"), col("n_evals"), col("n_shared"))
  }

  /** Bloom-filter variant of [[overlapStats]] — the 100 TB shape.
    *
    * [[overlapStats]] joins every training shingle against the eval
    * set; correct, but the corpus side still exchanges (id, hash)
    * pairs. Here the eval set is folded into a
    * [[graft.functions.BloomMightContain]] bit array ONCE (bounded
    * work: at most `mBits` distinct positions come back to the driver,
    * 128 KB at the 2^20 default ceiling) and the training scan becomes
    * a single map-side aggregation — no join, nothing but partial
    * counts travel. The price is a deterministic, engine-replayable
    * false-positive rate on `n_bloom` (see mBitsFor), which for
    * drop-if-contaminated gating errs on the safe side.
    *
    * @return (id, n_sh, n_bloom): distinct-shingle count and how many
    *         of them the filter reports as present in the eval set
    */
  def bloomOverlapStats(docs: DataFrame, isEval: Column, mBits: Int = 1 << 16,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3)
      : DataFrame = {
    import graft.functions.BloomMightContain
    val sh = graft.functions.Spread.across(docs)
      .select(col(idCol).as("id"), isEval.as("is_eval"),
        explode(graft.functions.ShingleHashes(
          TextFns.words(col(textCol)), n)).as("sh"))
      .persist()
    // <= mBits longs after distinct: bounded driver-side metadata,
    // same class as IVF's <= 16 centroids.
    val positions = sh.filter(col("is_eval"))
      .select(explode(BloomMightContain.probes(col("sh"), mBits)).as("pos"))
      .distinct().collect().map(_.getLong(0))
    val words = BloomMightContain.buildWords(positions, mBits)
    sh.filter(!col("is_eval"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(BloomMightContain(words, mBits, col("sh")), 1L)
          .otherwise(0L)).as("n_bloom"))
  }
}
