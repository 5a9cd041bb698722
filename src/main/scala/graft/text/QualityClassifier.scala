package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HashedNgramScore, PolyHash64}

/** Trained quality-classifier gate — the industry-standard corpus
  * pipeline stage the rule gates (t11) and heuristic scores (t02, t24)
  * approximate: a LINEAR model over hashed unigram+bigram features
  * (fastText-style, Joulin et al. 2016) scoring every document
  * map-side, then gating on the score.
  *
  * The CHECKED-IN weight vector below is fixed and zero-RNG. Its
  * derivation stands in for a training run while keeping the exact
  * serving shape a trained model would have:
  *   - every bucket starts with deterministic small-noise mass
  *     `((PolyHash64("w:" + b) mod 401) - 200) / 1000` in [-0.2, 0.2]
  *     (what the long tail of hashed-feature weights looks like after
  *     training — dense, small, sign-mixed);
  *   - the buckets of curated PROSE markers ([[TextFns.Stopwords]] —
  *     natural text has stopwords, the same signal t02's stopword-rate
  *     credit uses) get +600/1000 added;
  *   - the buckets of curated BOILERPLATE markers (the "storage"
  *     machine-log vocabulary) get -300/1000 added.
  * Swap in fastText-exported weights of the same (dim,) shape for a
  * production model; nothing else changes. All weights are exact
  * integer thousandths, so the DuckDB oracle embeds them as decimal
  * literals that parse to bit-identical doubles.
  *
  * Scale shape: scoring is ONE native codegen expression over the
  * token array ([[HashedNgramScore]]) with the weight vector shipped
  * as a plan reference object — no weight-table join, no shuffle of
  * any kind; the gate plan is scan → project → filter, pinned
  * shuffle-free in PlanSpec.
  */
object QualityClassifier {

  /** Hashed feature space size. Real fastText quality models use 2^21;
    * 512 keeps the oracle's literal weight list reviewable while
    * exercising the identical collision arithmetic. */
  val Dim = 512

  /** Curated positive markers: natural-prose signal. */
  val ProseMarkers: Seq[String] = TextFns.Stopwords

  /** Curated negative markers: machine-log / boilerplate signal. */
  val BoilerplateMarkers: Seq[String] =
    Seq("table", "scan", "merge", "part", "batch", "row")

  /** Gate threshold on the mean-feature-weight score. Calibrated once
    * on the sf0.001 corpus to split it (neither empty nor total) and
    * FROZEN — a trained model ships its operating point the same way. */
  val Threshold = 0.02

  /** Weight vector in integer thousandths (the checked-in artifact).
    * Exposed as an immutable IndexedSeq so the checked-in values cannot
    * be mutated at runtime and drift from [[weightsSqlList]]'s frozen
    * SQL literals. */
  val WeightsMilli: IndexedSeq[Long] = {
    val w = Array.tabulate(Dim)(b => (PolyHash64.hash(s"w:$b") % 401L) - 200L)
    ProseMarkers.foreach { t => w((PolyHash64.hash(t) % Dim).toInt) += 600L }
    BoilerplateMarkers.foreach { t =>
      w((PolyHash64.hash(t) % Dim).toInt) -= 300L
    }
    w.toIndexedSeq
  }

  /** The serving weights: one correctly-rounded division per bucket, so
    * `k/1000.0` here and the SQL literal `0.00k` are the same double. */
  val Weights: IndexedSeq[Double] = WeightsMilli.map(_ / 1000.0)

  /** DuckDB literal for the weight list (exact decimal strings). */
  def weightsSqlList: String =
    WeightsMilli.map(m =>
      new java.math.BigDecimal(m).movePointLeft(3).toPlainString)
      .mkString("[", ", ", "]")

  /** Raw ordered feature-weight sum over the document's tokens. */
  def rawScore(text: Column): Column =
    HashedNgramScore(TextFns.words(text), Weights)

  /** Feature count: n unigrams + (n-1) bigrams. */
  def nFeatures(text: Column): Column =
    (size(TextFns.words(text)).cast("long") * 2 - 1).cast("long")

  /** Mean feature weight, rounded for cross-engine presentation. The
    * mean (not the sum) is the fastText serving normalization — long
    * documents don't outscore short ones by length alone. */
  def score(text: Column): Column =
    round(rawScore(text) / nFeatures(text).cast("double"), 6)

  /** The gate: keep documents the classifier scores above `threshold`.
    * Pure map-side scan — no shuffle at any corpus size. */
  def gate(docs: DataFrame, threshold: Double = Threshold,
      textCol: String = "text"): DataFrame =
    docs.filter(score(col(textCol)) > threshold)
}
