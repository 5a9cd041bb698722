package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HashedNgramProduct, HashedNgramScore, PolyHash64}

/** LABEL-FREE language-model quality scoring — the CCNet/Gopher-class
  * perplexity filter (Wenzek et al. 2020, public knowledge), the
  * curation step most real pipelines run FIRST: fit a smoothed n-gram
  * LM on a CLEAN REFERENCE corpus (CCNet uses Wikipedia; the
  * engine takes any reference predicate — here provenance, a fact the
  * pipeline knows without annotating a single document), then bucket
  * every document into head / middle / tail by how likely its text is
  * under that reference model. Unlike the t31/t35 classifier gates
  * (which need a labeled signal) or t34's DSIR (which reshapes toward
  * a target), this ranks documents with NO labels at all.
  *
  * The LM is the family's hashed-ngram bucket model: add-one-smoothed
  * probabilities over [[Dim]] PolyHash64 buckets of the ordered
  * unigram+bigram features, fit in ONE linear scan of the reference
  * (≤ Dim-cell partial agg → bounded ≤ Dim-row driver collect — the
  * audited-bounded class: IVF centroids, Dsir ratio rows, perceptron
  * gradients).
  *
  * CCNet buckets on per-token PERPLEXITY — a geometric mean, normally
  * log/exp territory. Transcendentals are NOT bit-exact cross-engine
  * (the t34 lesson), so the bucket test is restated as a pure ordered
  * product: "geometric-mean likelihood ≥ θ·uniform" is EXACTLY
  *
  *   Π_f ( p[h(f)] · Dim / θ )  ≥  1.0
  *
  * — one [[HashedNgramProduct]] per threshold, the per-feature ratio
  * table riding as a plan reference object (never a join), multiplied
  * left-to-right so DuckDB's seedless `list_reduce` replays the double
  * bit-for-bit. A hostile long document underflowing the product to
  * +0.0 (tail) or overflowing to +Inf (head) is IEEE-specified in both
  * engines; no NaN can arise (every ratio is positive and finite, and
  * a 0.0 accumulator stays 0.0). Thresholds are exactly-representable
  * binary fractions ([[HeadGm]] = 5/4, [[TailGm]] = 19/16), so the
  * ratio-table arithmetic — two exact int→double conversions, a
  * correctly-rounded division, a multiply by Dim, a division by θ —
  * is bit-identical cross-engine.
  *
  * Alongside the bucket the scan emits `lm_mass` = Σ_f (c[h(f)]+1),
  * the document's total smoothed reference-count mass — an EXACT
  * BIGINT ([[HashedNgramScore]] sums integer-valued doubles, exact
  * below 2^53 — the t35 bound) that anchors the hash gate on integer
  * arithmetic, and `lm_score`, the capped head-ratio product (t34's
  * round(·,6) replay).
  *
  * Scale shape: the fit is one bounded scan of the REFERENCE (a small
  * fraction of the pool by construction); scoring is a pure map-side
  * projection over the pool — scan-bound at 100 TB, zero shuffles,
  * zero joins, zero windows (PlanSpec-pinned). The fit executes at
  * frame CONSTRUCTION (the SparkEntry eager-constructor contract).
  */
object LmQuality {

  /** Hashed LM bucket count (shared with [[Dsir.Dim]]'s rationale:
    * real CCNet LMs are word-level KenLM; 64 hashed buckets keep the
    * oracle's ratio CTE reviewable while exercising identical
    * collision, smoothing and fold arithmetic). */
  val Dim = 64

  /** Head cutoff: geometric-mean likelihood ≥ 5/4 × uniform. Exactly
    * representable (binary fraction), calibrated on the sf0.01 corpus
    * to a 183/211/106 head/middle/tail split. */
  val HeadGm = 1.25

  /** Tail cutoff: geometric-mean likelihood < 19/16 × uniform. */
  val TailGm = 1.1875

  /** Columns [[scored]] appends to its passthrough of the input —
    * guarded free at construction time (the Dsir contract). */
  val ReservedCols: Seq[String] = Seq("n_feat", "lm_mass", "lm_score",
    "lm_bucket")

  /** Ordered unigrams-then-bigrams feature list — the family-wide
    * feature definition every hashed-ngram oracle folds. */
  def features(text: Column): Column =
    TextFns.ngramFeatures(TextFns.words(text))

  /** Smoothed-LM bucket counts of the reference corpus: ONE explode →
    * ≤ [[Dim]]-cell agg → bounded ≤ Dim-row collect. Returns the raw
    * per-bucket counts (missing buckets 0) and their total. */
  def lmCounts(ref: DataFrame, textCol: String = "text")
      : (IndexedSeq[Long], Long) = {
    val rows = ref
      .select(explode(features(col(textCol))).as("f"))
      .groupBy(pmod(PolyHash64(col("f")), lit(Dim.toLong)).as("bucket"))
      .agg(count(lit(1)).as("c"))
      .collect() // bounded: <= Dim rows
    val m = rows.map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val cnt = IndexedSeq.tabulate(Dim)(b => m.getOrElse(b, 0L))
    (cnt, cnt.sum)
  }

  /** Per-bucket ratio table for a geometric-mean threshold θ:
    *   r[b] = ((c[b]+1) / (tot+Dim)) · Dim / θ
    * computed in EXACTLY this operation order — the oracle mirrors it
    * term for term, so the doubles match bit-for-bit. */
  def ratioTable(cnt: IndexedSeq[Long], tot: Long,
      theta: Double): IndexedSeq[Double] =
    cnt.map(c => (c + 1).toDouble / (tot + Dim).toDouble * Dim.toDouble
      / theta)

  /** The full scorer: fit the smoothed LM on `docs.filter(isRef)`
    * (NULL texts dropped first, both sides of the fit/score split),
    * then append to every non-NULL-text row of `docs`:
    *
    *  - `n_feat`  — 2·|words|−1, the feature count (exact BIGINT);
    *  - `lm_mass` — Σ_f (c_ref[h(f)]+1), exact BIGINT;
    *  - `lm_score`— round(min(Π_f r_head[h(f)], 10^12), 6);
    *  - `lm_bucket` — 'head' / 'middle' / 'tail' by the ordered
    *    product tests (head wins when both fire — the CASE order makes
    *    rounding-edge rows deterministic).
    */
  def scored(docs: DataFrame, isRef: Column,
      textCol: String = "text"): DataFrame = {
    ReservedCols.foreach { c =>
      require(!docs.columns.contains(c),
        s"LmQuality.scored: input already has a '$c' column — the " +
          s"output appends ${ReservedCols.mkString("/")}; rename it first")
    }
    val pool = docs.filter(col(textCol).isNotNull)
    val (cnt, tot) = lmCounts(pool.filter(isRef), textCol)
    // an empty reference corpus would silently degenerate to a uniform
    // LM (every ratio 1/θ — everything buckets 'tail'); that is never
    // what a caller meant, so fail loudly at construction
    require(tot > 0,
      "LmQuality.scored: the reference predicate selected no documents" +
        " (or only NULL texts) — the LM cannot be fit on an empty corpus")
    val rHead = ratioTable(cnt, tot, HeadGm)
    val rTail = ratioTable(cnt, tot, TailGm)
    val mass = cnt.map(c => (c + 1).toDouble)
    val ws = TextFns.words(col(textCol))
    val wHead = HashedNgramProduct(ws, rHead)
    val wTail = HashedNgramProduct(ws, rTail)
    pool
      .withColumn("n_feat",
        (size(ws).cast("long") * 2 - 1).cast("long"))
      .withColumn("lm_mass", HashedNgramScore(ws, mass).cast("long"))
      .withColumn("lm_score", round(least(wHead, lit(1.0e12)), 6))
      .withColumn("lm_bucket",
        when(wHead >= 1.0, lit("head"))
          .when(wTail >= 1.0, lit("middle"))
          .otherwise(lit("tail")))
  }
}
