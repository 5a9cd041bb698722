package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HashedNgramScore, PolyHash64}

/** In-engine TRAINING of the hashed n-gram linear classifier — the
  * curation arc's last missing verb: t31/t33/d15/t34 all SERVE a
  * checked-in weight vector ([[QualityClassifier.WeightsMilli]]); a
  * real pipeline FITS those weights on labeled documents. This is the
  * fastText-style full-batch fit (Joulin et al. 2016; the same loop
  * DSIR's target model runs), made deterministic and cross-engine
  * replayable:
  *
  *  - features: per-document counts over [[Dim]] hashed
  *    unigram+bigram buckets ([[TextFns.ngramFeatures]] +
  *    [[graft.functions.PolyHash64]] — the exact fold every oracle
  *    already mirrors); Dim = 64, the Dsir trick: real models use
  *    2^21 buckets, 64 keeps the oracle's unrolled CTE chain
  *    reviewable while exercising identical collision arithmetic;
  *  - model: full-batch perceptron, `k` FIXED iterations. Weights
  *    start at zero and each iteration adds the summed gradient of
  *    the misclassified set: `w_b += Σ_miscls y·x_b`. With w₀ = 0 and
  *    a constant learning rate, the decision sequence is invariant to
  *    the rate, so the canonical weights are plain BIGINTs and EVERY
  *    quantity in the fit — features, gradients, weights, scores — is
  *    exact integer arithmetic: stronger than order-independent
  *    DECIMAL sums, because there is nothing to round at all. The
  *    oracle replays the k iterations as chained CTEs over the same
  *    PolyHash64 fold and integer sums, so the run is hash-exact by
  *    construction, not by luck;
  *  - output: the 64-row (bucket, weight) table after k iterations
  *    plus integer train-set accuracy counts — what a real fit
  *    publishes (swap these weights into the t31 serving path and the
  *    lifecycle closes).
  *
  * Scale shape, per iteration: ONE linear scan of the persisted
  * (y, tokens) pool — misclassification is the map-side
  * [[graft.functions.HashedNgramScore]] native codegen expression
  * with the current weights riding as a plan reference object (no
  * weight-table join) — then explode → ≤ [[Dim]]-cell partial agg
  * (the shuffle moves Dim rows per task, not data) → a bounded
  * ≤ Dim-row driver collect (the audited-bounded class: IVF
  * centroids, Dsir ratio rows). Zero windows, zero joins. k fixed
  * iterations = k corpus scans; the driver holds 64 longs between
  * them. Scores stay exact while |w|·n_feat < 2^53 — corpus feature
  * mass ~2^40 per bucket before that bound even approaches.
  */
object ClassifierTrain {

  /** Hashed feature space size (shared with [[Dsir.Dim]]'s rationale). */
  val Dim = 64

  /** Fixed full-batch iterations — a hyperparameter of the registered
    * fit, not a convergence loop: determinism requires the iteration
    * count be part of the model spec, exactly as the oracle unrolls. */
  val Iters = 3

  /** The persisted training frame: ±1 label and token array, NULL
    * texts dropped (no features, no gradient — and a NULL token array
    * would null-propagate the score). */
  def pool(docs: DataFrame, label: Column,
      textCol: String = "text"): DataFrame =
    // respread (guide §2.5): the pool feeds k gradient scans plus the
    // accuracy scan — all per-word hash-fold work that a
    // single-row-group input would run one-task per iteration
    graft.functions.Spread.across(docs.filter(col(textCol).isNotNull))
      .select(when(label, 1L).otherwise(-1L).as("y"),
        TextFns.words(col(textCol)).as("ws"))

  /** Perceptron margin score of a token array under integer weights:
    * [[HashedNgramScore]]'s ordered double sum is EXACT here because
    * every addend is an integer (see class doc for the 2^53 bound). */
  def score(ws: Column, w: IndexedSeq[Long]): Column =
    HashedNgramScore(ws, w.map(_.toDouble))

  /** One iteration's summed gradient over the misclassified set
    * (y·score ≤ 0 — zero margin counts as a miss, the perceptron
    * convention that also makes iteration 1 from w₀ = 0 a full-corpus
    * gradient): one scan, ≤ [[Dim]] output rows. Each bucket row also
    * carries the max per-doc feature count seen (`mx`) — because
    * iteration 1 misclassifies EVERYTHING, its mx is the pool-wide
    * maximum, which [[fitHistory]] uses to enforce the 2^53 margin
    * exactness bound with zero extra scans. Exposed for the plan
    * spec. */
  def gradientFrame(p: DataFrame, w: IndexedSeq[Long]): DataFrame =
    p.filter(col("y").cast("double") * score(col("ws"), w) <= 0.0)
      .select(col("y"),
        (size(col("ws")).cast("long") * 2 - 1).cast("long").as("nf"),
        explode(TextFns.ngramFeatures(col("ws"))).as("f"))
      .groupBy(pmod(PolyHash64(col("f")), lit(Dim.toLong)).as("bucket"))
      .agg(sum(col("y")).as("g"), max(col("nf")).as("mx"))

  /** Run the fit and return the weight vector AFTER EACH iteration —
    * the per-iteration snapshots fall out of the one loop for free
    * (element i = weights after iteration i+1), which is what the
    * learning-curve query rides: never fit k times to see k models.
    * Bounded driver state: iters × Dim longs. */
  def fitHistory(p: DataFrame,
      iters: Int = Iters): IndexedSeq[IndexedSeq[Long]] = {
    var w = IndexedSeq.fill(Dim)(0L)
    var maxNFeat = 1L
    val hist = IndexedSeq.newBuilder[IndexedSeq[Long]]
    for (_ <- 1 to iters) {
      val g = gradientFrame(p, w).collect() // bounded: <= Dim rows
      val gm = g.map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      if (g.nonEmpty)
        maxNFeat = math.max(maxNFeat, g.map(_.getLong(2)).max)
      w = IndexedSeq.tabulate(Dim)(b => w(b) + gm.getOrElse(b, 0L))
      // margin exactness guard (the 2^53 bound, enforced — not just
      // documented): HashedNgramScore accumulates integer-valued
      // DOUBLES, exact only while every partial sum stays below 2^53;
      // partials are bounded by max|w| · n_feat. maxNFeat is the pool
      // max (iteration 1 misclassifies everything). A violating corpus
      // fails LOUDLY here instead of going hash-red mysteriously —
      // the escape hatch is an all-Long dot kernel (LongDot).
      val maxAbsW = w.map(math.abs).max
      require(maxAbsW <= (1L << 53) / maxNFeat,
        s"ClassifierTrain: max|w| = $maxAbsW with max n_feat = " +
          s"$maxNFeat risks a 2^53-overflowing margin partial sum — " +
          "scores would silently desynchronize from the integer-exact " +
          "oracle; switch the scorer to a Long dot kernel")
      hist += w
    }
    hist.result()
  }

  /** Final weight vector — the artifact a serving path consumes. */
  def fitWeights(p: DataFrame, iters: Int = Iters): IndexedSeq[Long] =
    fitHistory(p, iters).last

  /** See [[graft.functions.SessionRelease]]: the unmanaged [[train]]
    * keeps at most one cached pool frame alive per session. */
  private val lastUnmanagedRelease = new graft.functions.SessionRelease

  /** The registered query output: (bucket, weight, n_correct, n_total)
    * — the trained table crossed with the 1-row train-accuracy
    * aggregate (t29's zRow broadcast shape). The pool persists because
    * it feeds k gradient scans plus the accuracy scan. */
  def trainManaged(docs: DataFrame, label: Column, iters: Int = Iters,
      textCol: String = "text"): (DataFrame, () => Unit) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = pool(docs, label, textCol).persist()
    val w = fitWeights(p, iters)
    val acc = p.agg(
      count(when(col("y").cast("double") * score(col("ws"), w) > 0.0,
        lit(1))).as("n_correct"),
      count(lit(1)).as("n_total"))
    val wdf = w.zipWithIndex
      .map { case (wt, b) => (b.toLong, wt) }.toDF("bucket", "weight")
    val out = wdf.crossJoin(broadcast(acc)).orderBy("bucket")
    (out, () => { p.unpersist(); () })
  }

  /** Unmanaged convenience over [[trainManaged]]. */
  def train(docs: DataFrame, label: Column, iters: Int = Iters,
      textCol: String = "text"): DataFrame = {
    val (out, release) = trainManaged(docs, label, iters, textCol)
    lastUnmanagedRelease.swap(docs.sparkSession, release)
    out
  }

  /** Columns [[trainedGate]] appends to its passthrough of the val
    * split — guarded free at construction (the Dsir contract). */
  val GateReservedCols: Seq[String] = Seq("margin", "pred")

  /** See [[graft.functions.SessionRelease]]. */
  private val gateUnmanagedRelease = new graft.functions.SessionRelease

  /** Fit → serve, OUT OF SAMPLE — the end-to-end lifecycle t31 only
    * serves: train on the [[TextFns.splitAssign]] TRAIN split, then
    * gate the VAL split with the trained weights. Returns the val
    * rows (NULL texts dropped) with the exact integer `margin`
    * (Σ w_b·x_b under the fitted BIGINT weights) and `pred` = 1 when
    * the margin is positive, appended. The serving scan is the same
    * map-side native-expression shape as t31 — trained weights ride
    * as a plan reference object, no weight-table join; the held-out
    * docs never influence the fit (the leakage-safety property t26
    * pins for splits, here for the model). */
  def trainedGateManaged(docs: DataFrame, label: Column,
      iters: Int = Iters, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, () => Unit) = {
    GateReservedCols.foreach { c =>
      require(!docs.columns.contains(c),
        s"ClassifierTrain.trainedGate: input already has a '$c' column " +
          s"— the output appends ${GateReservedCols.mkString("/")}")
    }
    val p = pool(docs.filter(TextFns.splitAssign(col(idCol)) === "train"),
      label, textCol).persist()
    val w = fitWeights(p, iters)
    val out = docs
      .filter(TextFns.splitAssign(col(idCol)) === "val" &&
        col(textCol).isNotNull)
      .withColumn("margin",
        score(TextFns.words(col(textCol)), w).cast("long"))
      .withColumn("pred", (col("margin") > 0).cast("long"))
    (out, () => { p.unpersist(); () })
  }

  /** Unmanaged convenience over [[trainedGateManaged]]. */
  def trainedGate(docs: DataFrame, label: Column, iters: Int = Iters,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (out, release) =
      trainedGateManaged(docs, label, iters, idCol, textCol)
    gateUnmanagedRelease.swap(docs.sparkSession, release)
    out
  }

  /** The learning curve — train AND held-out accuracy after EVERY
    * iteration, the evidence that picks k (is the fit still improving
    * out of sample, or only memorizing?): ONE fit on the train split
    * yields all k weight snapshots ([[fitHistory]]); then ONE
    * aggregate scan per split computes every iteration's correctness
    * count side by side (k scoring expressions in one projection —
    * never k passes), and the 2k-row curve is assembled from the two
    * bounded 1-row collects. Output: (iter, split, n_correct,
    * n_total), integer-exact. */
  def learningCurve(docs: DataFrame, label: Column, iters: Int = Iters,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = pool(docs.filter(TextFns.splitAssign(col(idCol)) === "train"),
      label, textCol).persist()
    val history = fitHistory(p, iters)
    val v = pool(docs.filter(TextFns.splitAssign(col(idCol)) === "val"),
      label, textCol)
    def counts(df: DataFrame): Array[Long] = {
      val aggs = count(lit(1)).as("n") +:
        history.zipWithIndex.map { case (w, i) =>
          count(when(col("y").cast("double") * score(col("ws"), w) > 0.0,
            lit(1))).as(s"c$i")
        }
      val r = df.agg(aggs.head, aggs.tail: _*).head() // bounded: 1 row
      Array.tabulate(history.size + 1)(r.getLong)
    }
    val (tc, vc) = (counts(p), counts(v))
    p.unpersist()
    val rows = (1 to iters).flatMap { i =>
      Seq((i.toLong, "train", tc(i), tc(0)),
        (i.toLong, "val", vc(i), vc(0)))
    }
    rows.toDF("iter", "split", "n_correct", "n_total")
      .orderBy("iter", "split")
  }
}
