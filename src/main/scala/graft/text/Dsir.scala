package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.{HashedNgramProduct, PolyHash64}

/** DSIR-style importance resampling (Data Selection via Importance
  * Resampling — Xie et al. 2023, public knowledge): reweight a raw
  * document pool toward a TARGET domain's hashed n-gram distribution,
  * then resample with probability proportional to the importance
  * weight. The third knob of the corpus-curation family — the engine
  * can already GATE on quality ([[QualityClassifier]]) and BALANCE
  * topics (s15); this RESHAPES the mixture toward a domain.
  *
  * Per-bucket hashed-ngram "language models" for target and raw pool
  * are bag-of-features counts over [[Dim]] buckets with add-one
  * smoothing; the importance weight of a document is the product of
  * per-feature probability ratios
  *
  *   w(doc) = Π_f  p_target[h(f) mod D] / p_raw[h(f) mod D]
  *
  * over its ordered unigram-then-bigram features ([[HashedNgramProduct]]
  * — one native codegen expression, left-to-right IEEE multiplication,
  * bit-reproducible cross-engine). The resample keeps each document
  * with probability min(1, budget · w / Σw) through the deterministic
  * [[TextFns.keepPpm]] hash gate — zero RNG, identical keep set at any
  * partitioning.
  *
  * Everything is engine-replayable integer or IEEE arithmetic: bucket
  * counts are exact BIGINTs, each ratio is two exact int→double
  * conversions and two correctly-rounded divisions, the weight is an
  * ordered product, and the cross-corpus normalizer Σ min(w, 10^6)
  * sums DECIMAL(30,15) (order-independent — never raw doubles, the
  * t29 lesson).
  *
  * Scale shape: ONE linear feature-count scan builds both LMs (target
  * membership is a predicate, so the target count is a conditional
  * sum in the same partial agg) into ≤ [[Dim]] cells (the shuffle
  * moves D rows per task, not data), one bounded ≤ Dim-row driver
  * collect for the ratio table
  * (same audited-bounded class as the IVF ≤16-centroid collect), and
  * the ratio table then rides to executors as a plan reference object —
  * the scoring scan is a pure map with no join at any corpus size. The
  * weight-sum side is a 1-row broadcast, t29's zRow shape.
  */
object Dsir {

  /** Hashed LM bucket count. Real DSIR uses 10k; 64 keeps the oracle's
    * ratio CTE reviewable while exercising identical collision,
    * smoothing and fold arithmetic. */
  val Dim = 64

  /** Default resample budget (expected kept docs ≈ budget when weights
    * concentrate; the per-doc rate is capped at 1). */
  val Budget = 200.0

  /** Columns [[resample]] appends to its passthrough of the input —
    * guarded free at construction time. */
  val ReservedCols: Seq[String] = Seq("n_feat", "w", "rate_ppm")

  /** Ordered unigrams-then-bigrams feature list of a text column —
    * [[TextFns.ngramFeatures]] over [[TextFns.words]], the family-wide
    * feature definition. */
  def features(text: Column): Column =
    TextFns.ngramFeatures(TextFns.words(text))

  /** The per-bucket probability-ratio table, ordered by bucket: for
    * each of the Dim buckets,
    *
    *   ratio[b] = ((ct[b]+1) / (totT+Dim)) / ((cr[b]+1) / (totR+Dim))
    *
    * with exact BIGINT counts and IEEE divisions — bit-identical in
    * any engine replaying the same expression. Because the target is
    * a PREDICATE over the raw pool, both LMs count in ONE exploded
    * scan (raw count + conditional target count per bucket) instead
    * of two. Bounded driver action: collects exactly Dim rows. */
  def ratioTable(docs: DataFrame, isTarget: Column,
      textCol: String = "text"): IndexedSeq[Double] = {
    val spark = docs.sparkSession
    val counts = docs
      .select(explode(features(col(textCol))).as("f"), isTarget.as("t"))
      .groupBy(pmod(PolyHash64(col("f")), lit(Dim.toLong)).as("bucket"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("t"), 1L).otherwise(0L)).as("ct"))
    val grid = spark.range(Dim).select(col("id").as("bucket"))
    val rows = grid
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("cr", "ct"))
      .orderBy("bucket")
      .select("bucket", "cr", "ct")
      .collect() // bounded: exactly Dim rows
    val totR = rows.map(_.getLong(1)).sum
    val totT = rows.map(_.getLong(2)).sum
    rows.map { r =>
      ((r.getLong(2) + 1).toDouble / (totT + Dim).toDouble) /
        ((r.getLong(1) + 1).toDouble / (totR + Dim).toDouble)
    }.toIndexedSeq
  }

  /** Importance weight column over a text column given a ratio table. */
  def importanceWeight(text: Column, ratios: Seq[Double]): Column =
    HashedNgramProduct(TextFns.words(text), ratios)

  /** See [[graft.functions.SessionRelease]]: the unmanaged
    * [[resample]] keeps at most one cached weight frame alive per
    * session. */
  private val lastUnmanagedRelease = new graft.functions.SessionRelease

  /** The full resample: fit both hashed LMs, weight every document,
    * keep with probability min(1, budget·w/Σw) via the deterministic
    * ppm hash gate (salt "dsir" decorrelates from split/sampling
    * gates). Returns the kept rows of `docs` with `n_feat`, `w` and
    * `rate_ppm` appended (those names must be free in `docs`); `idCol`
    * must be stable across runs (it seeds the keep hash). NULL-text
    * rows are dropped up front — `least(NULL, cap)` null-skips to the
    * full cap in both engines, so an unfiltered null row would inflate
    * the Σw normalizer by 10^6 while never reaching the output. */
  def resample(docs: DataFrame, isTarget: Column,
      budget: Double = Budget, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val (out, release) = resampleManaged(docs, isTarget, budget, idCol,
      textCol)
    lastUnmanagedRelease.swap(docs.sparkSession, release)
    out
  }

  /** [[resample]] plus a release handle for the cached weight frame —
    * the scoring scan (2n−1 hashed features per doc) feeds BOTH the
    * Σw normalizer and the output leg, so it persists instead of
    * computing twice (the same shared-subtree contract the LSH and
    * topic-balance entry points carry). Release strictly AFTER
    * materializing the result; safe to call twice. */
  def resampleManaged(docs: DataFrame, isTarget: Column,
      budget: Double = Budget, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, () => Unit) = {
    // the appended columns are fixed names on a PASSTHROUGH of `docs`;
    // withColumn would silently REPLACE a caller column of the same
    // name, so the contract fails loudly at construction instead
    ReservedCols.foreach { c =>
      require(!docs.columns.contains(c),
        s"Dsir.resample: input already has a '$c' column — the output " +
          s"appends ${ReservedCols.mkString("/")}; rename it first")
    }
    // respread (guide §2.5): both the ratio-table fit scan and the
    // per-doc weight kernel below are per-word hash folds — the two
    // heaviest stages of t34, and both skew-bound on single-row-group
    // inputs without it
    val pool = graft.functions.Spread.across(
      docs.filter(col(textCol).isNotNull))
    val ratios = ratioTable(pool, isTarget, textCol)
    val weighted = pool
      .withColumn("n_feat",
        (size(TextFns.words(col(textCol))).cast("long") * 2 - 1)
          .cast("long"))
      .withColumn("w", importanceWeight(col(textCol), ratios))
      .persist()
    // order-independent normalizer: cap (an +Inf overflow would poison
    // the sum), then exact DECIMAL accumulation — never raw doubles
    val wSum = weighted
      .agg(sum(least(col("w"), lit(1000000.0)).cast(DecimalType(30, 15)))
        .as("twd"))
      .select(col("twd").cast("double").as("tw"))
    val out = weighted.crossJoin(broadcast(wSum))
      .withColumn("rate_ppm",
        floor(least(lit(1.0), lit(budget) * col("w") / col("tw"))
          * 1000000.0).cast("long"))
      .where(TextFns.keepPpm(col(idCol), lit("dsir"), col("rate_ppm")))
      .drop("tw")
    (out, () => { weighted.unpersist(); () })
  }
}
