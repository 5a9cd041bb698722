package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10x scale probe for the dedup/ANN family (recorded in BASELINE.md):
  * synthesizes a corpus of `copies` perturbed copies of the bench
  * tables under /tmp, runs the bucketed dedup + ANN queries on the 1x
  * and Nx corpora in the same JVM, and prints one JSON line with
  * per-query seconds, output rows and the `graft.lsh.*` hot-bucket
  * drop metrics — converting the "survives 100x" argument from
  * plan-reading to measurement.
  *
  * The copies are NEAR-DUPLICATES of the originals by construction
  * (suffixed text, slightly shifted vectors), which multiplies cluster
  * density as well as corpus size — deliberately the adversarial
  * direction for LSH/bucketing operators.
  *
  * Run: `SPARK_GRAFT_SCALE_COPIES=10 sbt "runMain graft.ScaleProbe"`.
  */
object ScaleProbe {

  /** The bucketed-candidate operators the probe exists to stress, plus
    * the labeled exact baselines (d05) for the all-pairs cost contrast. */
  private val Subset = Seq(
    "d02_ngram_jaccard", "d03_minhash_lsh", "d04_simhash",
    "d05_cosine_neardup", "d06_cosine_neardup_lsh", "d07_dedup_clusters",
    "d08_incremental_lsh", "d09_containment",
    "d10_minhash_calibration", // verify-join cost tracks candidate count
    "d12_substring_spans", // gram table is linear; hits track dup content
    "t19_bloom_decontam",
    "t24_lm_perplexity", // bigram join: big/pre count tables grow with corpus
    "t28_corpus_build", // the full gate->dedup->decontam->split->shard->pack composition
    "m05_media_neardup", // perceptual-hash banding over the media bytes
    "m06_media_keep", // m05 pairs -> CC -> canonical keep (CC under media load)
    "m07_media_split", // perceptual clusters share one split key
    "d14_soft_dedup", // per-row ppm gate vs broadcast rate table — the
    // mega-group claim: a saturated corpus multiplies every dup_count
    // by `copies` and the keep decision must stay rank-window-free
    "d15_quality_keep", // classifier-argmax keep: the saturated corpus
    // multiplies cluster membership, the adversarial direction for a
    // per-cluster selection that must stay a combiner, not a sort
    "s14_ivf_nprobe_sweep", // ONE shared index build + candidate pass
    // across the sweep — per-nprobe cost must never multiply the build
    "s15_topic_balance", // bounded corpus x 16 assignment + broadcast
    // rates: per-topic token mass grows with the corpus, the keep
    // stays per-row hash arithmetic
    "t31_classifier_gate", // scan-family: native-scorer map + filter —
    // the row pins the claim that the gate stays scan-bound
    "t33_score_calibration", // scan + 64-cell partial agg — same claim
    "t34_dsir_resample", // two 64-cell LM count scans + map-side weight
    // product + 1-row normalizer broadcast: every leg linear, and the
    // saturated corpus multiplies every bucket count by `copies`
    // without changing the ratio table's size
    "s16_embedding_outliers", // bounded x16 assignment + 16-row stats
    // broadcast: per-cluster moments are partial aggs, never a sort
    "s17_outlier_sweep", // the same cohesion pass x a 3-row factor
    // axis — swept thresholds must not multiply the instrument build
    "t35_classifier_train", // k fixed perceptron iterations = k linear
    // scans + <=64-cell aggs: time must track the corpus, never the
    // (fixed) iteration x bucket state
    "t36_vocab_coverage", // explode -> vocab agg -> range-partitioned
    // prefix sum: the saturated corpus multiplies token mass per term
    // but barely grows the vocab — the range shuffle moves the VOCAB
    // table, not the corpus
    "t37_trained_gate", // fit on the train split + map-side serve of
    // the val split: both legs linear scans, weights stay 64 longs
    "t38_learning_curve", // one fit + ONE aggregate scan per split
    // evaluating all k snapshots side by side — time must track the
    // corpus, never k x corpus
    "t39_lm_quality", // label-free LM filter: one bounded reference
    // fit scan + a pure map-side scoring projection — the row pins
    // the claim that scoring stays scan-bound while the saturated
    // corpus multiplies every LM bucket count by `copies`
    "t40_quality_ensemble", // all three quality gates fused into ONE
    // map-side scan — the row pins the claim that the composed tier
    // costs no more plan than the single gates it votes over
    "t41_tier_mixing", // tiers -> budget waterfall -> ppm gate: the
    // tier scan + one <= 4-row aggregate + one gated scan; rates ride
    // as literals, so time must track the corpus and never add a join
    "s02_ann_lsh", // sized planes + cap derive in-operator — the production row
    "s12_ann_lsh_fixed3", // labeled fixed-plane contrast (excluded above 10x)
    "s03_ann_ivf",
    "s11_ann_filtered", // labels repeat across copies -> hot-key direction
    // the streaming front doors: ingest-time LSH dedup and the
    // micro-batched IVF index MERGE — per-batch cost must stay
    // O(index + delta), never re-scan the accumulated corpus
    "st11_stream_ingest_dedup", "s06_stream_index_update")

  /** Copy k keeps ids disjoint by a fixed stride. */
  private val IdStride = 10000000L

  /** Probe scratch markers go through the Hadoop FileSystem API (the
    * streaming byte-store precedent, StreamRefit.hfs): a probe root
    * pointed at HDFS/S3/ABFS behaves exactly like the local /tmp
    * roots, instead of silently never finding its `_READY` marker. */
  private[graft] def readyExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_READY")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private[graft] def markReady(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_READY")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true).close()
  }

  /** Basename of a source dir for tagging scratch roots — pure path
    * string math, any FS scheme. */
  private[graft] def srcTag(src: String): String =
    new org.apache.hadoop.fs.Path(src).getName

  /** Shared with [[CoresProbe]]: the same 10x near-dup docs+embeddings
    * corpus, so data-scaling and compute-scaling verdicts are
    * comparable. Returns true when THIS call synthesized (fresh dir) —
    * probe mains record it as `synthesis_run` so the regression gate
    * can annotate a timing firing whose GC profile carried the
    * synthesis churn (the class that cost one adjudication per
    * fresh-tmp round through r14). */
  private[graft] def synthesize(spark: SparkSession, src: String, dir: String,
      copies: Int): Boolean = {
    if (ScaleProbe.readyExists(spark, dir)) return false
    val docs = sources.Tables.documents(spark, src)
    (0 until copies).map { k =>
      val suffix = s" variant $k"
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + lit(k * IdStride)).as("doc_id"),
        concat(col("text"), lit(suffix)).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(suffix.length.toLong)).as("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = sources.Tables.embeddings(spark, src)
    (0 until copies).map { k =>
      if (k == 0) emb
      else emb.select(
        (col("vec_id") + lit(k * IdStride)).as("vec_id"),
        transform(col("embedding"),
          x => (x * lit(1.0f + 0.01f * k) + lit(0.001f * k)).cast("float"))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    ScaleProbe.markReady(spark, dir)
    true
  }

  def main(args: Array[String]): Unit = {
    ProbeLog.hostStart()
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    // the synthesized-corpus dir encodes the SOURCE sf too: a stale
    // _READY dir from a different base would silently probe mixed
    // corpora (found when a 100x sf0.01 run reused the 10x sf0.1 dir)
    val srcTag = ScaleProbe.srcTag(src)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/tmp/graft-scale-$srcTag-$copies")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    // hot-bucket drop counters, summed per metric name across the run
    val drops = scala.collection.concurrent.TrieMap[String, Long]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft.lsh."))
              drops.put(name,
                drops.getOrElse(name, 0L) + row.getAs[Long]("dropped_rows"))
          }
        override def onFailure(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })

    val synthesized = synthesize(spark, src, dir, copies)

    // Bench-style untimed warm-up (JIT/codegen/footer costs)
    val wdocs = sources.Tables.documents(spark, src)
    wdocs.join(wdocs.select("doc_id"), "doc_id").agg(count(lit(1))).collect()

    // Beyond 10x the LABELED quadratic/degenerate contrast rows
    // (d05 all-pairs, d06 fixed-3-plane, s12 fixed-3-plane ANN) are
    // excluded: they exist to price the anti-pattern, and at 100x the
    // price is the point — every remaining row is claimed scale-safe
    // and must prove it. (s02_ann_lsh itself is now the SIZED
    // registration — planesFor + capFor derive inside lshTopK — so its
    // standing row IS the production config's verdict.)
    val subset =
      if (copies <= 10) Subset
      else Subset.filterNot(
        Set("d05_cosine_neardup", "d06_cosine_neardup_lsh",
          "s12_ann_lsh_fixed3"))

    def runSet(d: String): Seq[(String, Double, Long)] = subset.map { n =>
      System.err.println(s"[probe] $n @ $d")
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).count()
      (n, (System.nanoTime() - t0) / 1e9, rows)
    }

    val base = runSet(src)
    drops.clear() // report drop metrics for the scaled corpus only
    val scaled = runSet(dir)

    // The two hyperplane-LSH consumers again, with planesPerTable sized
    // to the corpus (Ann.planesFor): the fixed 3-plane default has only
    // 64 buckets total, so its bucket join degenerates toward all-pairs
    // as the corpus grows — sized planes restore bucket-local work.
    val emb = sources.Tables.embeddings(spark, dir)
    val planes = vector.Ann.planesFor(emb.count())
    // s11 contrast (LABELED CONTRAST BASELINE — do not ship at scale):
    // the row_number-window plan the bounded-heap TopKAgg replaced, on
    // the same scaled corpus — per label, the window sorts EVERY
    // candidate of a query in one partition; the heap ships <= k rows
    // per query per task. The delta is the measured cost of the
    // scale-killer pattern.
    def s11ViaWindow(d: String): Long = {
      import org.apache.spark.sql.expressions.Window
      val e = sources.Tables.embeddings(spark, d)
      def norm(df: org.apache.spark.sql.DataFrame, id: String, v: String) =
        df.select(col("vec_id").as(id), col("label"),
            col("embedding").as("e"))
          .withColumn("nrm", vector.VectorFns.norm(col("e")))
          .select(col(id), col("label"),
            vector.VectorFns.normalized(col("e"), col("nrm")).as(v))
      val w = Window.partitionBy("q").orderBy(col("cos").desc, col("b"))
      norm(e.filter(col("vec_id") % 25 === 0), "q", "qv")
        .join(norm(e, "b", "bv"), Seq("label"))
        .filter(col("q") =!= col("b"))
        .withColumn("cos", vector.VectorFns.dot(col("qv"), col("bv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .count()
    }
    // Occupancy-scaled hot-bucket cap to match the sized plane count:
    // the fixed 10k default let ~5000-member buckets (50x expected
    // occupancy on the duplicate-saturated 100x corpus) through, and
    // their candidate self-join spilled past the disk — the 100x run
    // that FOUND Buckets.capFor. At 10x the scaled cap equals the old
    // behavior (all buckets well under it), so the standing rows are
    // comparable.
    val sizedCap = functions.Buckets.capFor(emb.count(), planes)
    // constant-query-load corpus-scaling contrast: the registered s02's
    // query set is every 25th vector, so it grows WITH the corpus and
    // its time ratio folds query-count scaling into corpus scaling.
    // These rows pin the query load to the 1x corpus's sample on both
    // the 1x and Nx corpora, so the ratio isolates corpus growth:
    // sized planes hold per-query candidate work ~flat, while the
    // fixed-3 contrast's per-bucket occupancy — and so its per-query
    // candidates — grows linearly with the corpus.
    val baseEmb = sources.Tables.embeddings(spark, src)
    val baseQs = baseEmb.filter(col("vec_id") % 25 === 0)
    def fixedQSized(corpus: org.apache.spark.sql.DataFrame): Long =
      vector.Ann.lshTopK(baseQs, corpus, k = 3,
        targetBucketSize = 25).count()
    def fixedQFixed3(corpus: org.apache.spark.sql.DataFrame): Long =
      vector.Ann.lshTopK(baseQs, corpus, k = 3, planesPerTable = Some(3),
        maxBucketSize = Some(functions.Buckets.DefaultMaxBucketSize))
        .count()
    val sized = Seq(
      // planesFor/capFor are the in-operator DEFAULTS since round 9, so
      // the standing s02_ann_lsh subset row already measures the sized
      // ANN config; this row keeps the sized PAIRS path (d11's shape at
      // the probe's default target) measured alongside it
      "d06_sized" -> (() => text.Dedup.cosineNearDupPairsLsh(
        emb, planesPerTable = Some(planes),
        maxBucketSize = Some(sizedCap)).count()),
      "s02_fixedq_sized_1x" -> (() => fixedQSized(baseEmb)),
      s"s02_fixedq_sized_${copies}x" -> (() =>
        fixedQSized(sources.Tables.embeddings(spark, dir))),
      "s02_fixedq_fixed3_1x" -> (() => fixedQFixed3(baseEmb)),
      s"s02_fixedq_fixed3_${copies}x" -> (() =>
        fixedQFixed3(sources.Tables.embeddings(spark, dir))),
      "s11_window_contrast" -> (() => s11ViaWindow(dir))
    ).map { case (n, f) =>
      System.err.println(s"[probe] $n (sized/contrast)")
      val t0 = System.nanoTime()
      // a contrast row that CANNOT complete at this scale is itself
      // the verdict (sec records the time to failure, rows = -1) — it
      // must never erase the subset results that did complete
      val rows = try f() catch { case e: Throwable =>
        System.err.println(s"[probe] $n FAILED: ${e.getClass.getName}")
        -1L
      }
      (n, (System.nanoTime() - t0) / 1e9, rows)
    }

    import ProbeLog.js
    val dropJs = drops.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val metricName =
      if (copies == 10) "scale_probe" else s"scale_probe_${copies}x"
    val line = s"""{"metric":"$metricName","copies":$copies,""" +
      s""""synthesis_run":$synthesized,""" +
      s""""base":${js(base)},"scaled":${js(scaled)},""" +
      s""""ratios":${ProbeLog.ratios(base, scaled)},""" +
      s""""scaled_sized":${js(sized)},"planes_sized":$planes,""" +
      s""""sized_cap":$sizedCap,""" +
      s""""scaled_drops":$dropJs,"sf":"$src",${ProbeLog.hostJson()}}"""
    println(line)
    val regressions = ProbeLog.recordGated(metricName, line)
    spark.stop()
    if (regressions.nonEmpty) {
      regressions.foreach(r =>
        System.err.println(s"[probe] REGRESSION vs committed PROBES.json: $r"))
      sys.exit(1)
    }
  }
}

/** 10x scale probe for the EVENTS (medallion/analytics) family — the
  * dedup/ANN probe's sibling for the telemetry side of the engine.
  * Copies keep the SAME user population (ids offset only on event_id,
  * timestamps shifted by `copy` seconds), so per-key density grows
  * with the corpus: every per-user window (SCD2 change folding,
  * cohort distinct counts, funnel step joins) and every rollup group
  * sees 10x the rows — the adversarial direction for the window and
  * aggregation plans.
  *
  * Run: `SPARK_GRAFT_SCALE_COPIES=10 sbt "runMain graft.EventScaleProbe"`;
  * record in BASELINE.md §4.
  */
object EventScaleProbe {

  private val Subset = Seq(
    "p19_rollup_cascade", // one-scan cascade: groups grow, scan 10x
    "p20_scd2_dim",       // per-user change-fold window at 10x density
    "q52_funnel",         // step aggregates + key joins
    "q58_cube",           // grouping-set expansion
    "q60_cohort_retention", // distinct actives per (cohort, offset)
    "p06_latest")         // argmax latest-per-key

  private val IdStride = 100000000L

  /** Shared with [[StreamScaleProbe]]: same 10x per-key-density events
    * corpus, so batch and streaming verdicts are comparable. Returns
    * true when THIS call synthesized — see [[ScaleProbe.synthesize]]. */
  private[graft] def synthesize(spark: SparkSession, src: String, dir: String,
      copies: Int): Boolean = {
    if (ScaleProbe.readyExists(spark, dir)) return false
    val ev = sources.Tables.events(spark, src)
    (0 until copies).map { k =>
      if (k == 0) ev
      else ev.select(
        (col("event_id") + lit(k * IdStride)).as("event_id"),
        (col("ts") + expr(s"INTERVAL $k SECONDS")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    ScaleProbe.markReady(spark, dir)
    true
  }

  def main(args: Array[String]): Unit = {
    ProbeLog.hostStart()
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val dir = s"/tmp/graft-evscale-${ScaleProbe.srcTag(src)}-$copies"
    val synthesized = synthesize(spark, src, dir, copies)

    val wev = sources.Tables.events(spark, src)
    wev.join(wev.select("event_id"), "event_id").agg(count(lit(1))).collect()

    def runSet(d: String): Seq[(String, Double, Long)] = Subset.map { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).count()
      (n, (System.nanoTime() - t0) / 1e9, rows)
    }
    val base = runSet(src)
    val scaled = runSet(dir)

    import ProbeLog.js
    val metricName =
      if (copies == 10) "event_scale_probe" else s"event_scale_probe_${copies}x"
    val line = s"""{"metric":"$metricName","copies":$copies,""" +
      s""""synthesis_run":$synthesized,""" +
      s""""base":${js(base)},"scaled":${js(scaled)},""" +
      s""""ratios":${ProbeLog.ratios(base, scaled)},"sf":"$src",${ProbeLog.hostJson()}}"""
    println(line)
    val regressions = ProbeLog.recordGated(metricName, line)
    spark.stop()
    if (regressions.nonEmpty) {
      regressions.foreach(r =>
        System.err.println(s"[probe] REGRESSION vs committed PROBES.json: $r"))
      sys.exit(1)
    }
  }
}

/** Content-skew probe for the gram/shingle dedup shuffles (VERDICT r6
  * task 4): every document gets the SAME dominant token run prepended,
  * so one shingle appears in every doc and the d12 gram table repeats
  * a handful of k-gram hashes at every position of every doc — the
  * pathological key-concentration direction for `groupBy(sh)` /
  * `groupBy(h)` and the h-keyed hits join.
  *
  * The design claims under test: (a) d02/d09's rare filter (df <=
  * maxDF) REMOVES the dominant shingle before any pair join, and the
  * df count itself is a map-side partial agg (one row per doc per
  * shingle, combined per task); (b) d12's cross-doc filter is a
  * min/max partial agg with O(1) state per key, and the hits join's
  * small side (distinct cross-doc hashes) broadcasts under AQE, so hot
  * gram positions are never shuffled BY the hot key — the only wide op
  * keyed on content is absorbed before it fans out.
  *
  * Run: `SPARK_GRAFT_SCALE_COPIES=10 sbt "runMain graft.SkewProbe"`;
  * compare the per-query times against ScaleProbe's near-dup corpus at
  * the same row counts (BASELINE.md §4).
  */
object SkewProbe {

  private val Subset =
    Seq("d02_ngram_jaccard", "d09_containment", "d12_substring_spans")

  /** ~66 tokens / ~400 chars of one repeated token: longer than d12's
    * k=20 grams and d02's 3-word shingles by a wide margin. */
  private val DominantRun = Array.fill(66)("alpha").mkString(" ")

  private def synthesize(spark: SparkSession, src: String, dir: String,
      copies: Int): Boolean = {
    if (ScaleProbe.readyExists(spark, dir)) return false
    val docs = sources.Tables.documents(spark, src)
    (0 until copies).map { k =>
      val base = if (k == 0) docs else docs.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" variant $k")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      base.select(col("doc_id"),
        concat(lit(DominantRun + " "), col("text")).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(DominantRun.length + 1L)).as("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    ScaleProbe.markReady(spark, dir)
    true
  }

  def main(args: Array[String]): Unit = {
    ProbeLog.hostStart()
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val srcTag = ScaleProbe.srcTag(src)
    val dir1 = s"/tmp/graft-skew-$srcTag-1"
    val dirN = s"/tmp/graft-skew-$srcTag-$copies"
    val synthesized = synthesize(spark, src, dir1, 1) |
      synthesize(spark, src, dirN, copies)

    val wdocs = sources.Tables.documents(spark, src)
    wdocs.join(wdocs.select("doc_id"), "doc_id").agg(count(lit(1))).collect()

    def runSet(d: String): Seq[(String, Double, Long)] = Subset.map { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).count()
      (n, (System.nanoTime() - t0) / 1e9, rows)
    }
    // BM25 with a HOT query term: "alpha" is in every document, so the
    // hot query's candidate set is the whole corpus. The heap path
    // (t23's production plan) ships <= 5 rows per query per task; the
    // window contrast (LABELED CONTRAST BASELINE — do not ship at
    // scale) sorts every candidate of the hot query in ONE partition —
    // the measured price of the pattern t23 abandoned.
    val hotSearches = Seq(
      "hot_term" -> Seq("alpha", "table", "merge"),
      "query_shape" -> Seq("join", "filter", "window"))
    def bm25Heap(d: String): Long =
      text.Bm25.topDocs(sources.Tables.documents(spark, d),
        hotSearches, k = 5).count()
    def bm25Window(d: String): Long = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query")
        .orderBy(col("s").desc, col("doc_id"))
      text.Bm25.scores(sources.Tables.documents(spark, d), hotSearches)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .count()
    }
    val hot = Seq(
      "t23_hot_heap_1" -> (() => bm25Heap(dir1)),
      s"t23_hot_heap_$copies" -> (() => bm25Heap(dirN)),
      "t23_hot_window_contrast_1" -> (() => bm25Window(dir1)),
      s"t23_hot_window_contrast_$copies" -> (() => bm25Window(dirN))
    ).map { case (n, f) =>
      val t0 = System.nanoTime()
      val rows = f()
      (n, (System.nanoTime() - t0) / 1e9, rows)
    }

    val skew1 = runSet(dir1)
    val skewN = runSet(dirN)

    import ProbeLog.js
    val metricName =
      if (copies == 10) "skew_probe" else s"skew_probe_${copies}x"
    val line = s"""{"metric":"$metricName","copies":$copies,""" +
      s""""synthesis_run":$synthesized,""" +
      s""""skew1":${js(skew1)},"skew$copies":${js(skewN)},""" +
      s""""ratios":${ProbeLog.ratios(skew1, skewN)},""" +
      s""""bm25_hot":${js(hot)},"sf":"$src",${ProbeLog.hostJson()}}"""
    println(line)
    val regressions = ProbeLog.recordGated(metricName, line)
    spark.stop()
    if (regressions.nonEmpty) {
      regressions.foreach(r =>
        System.err.println(s"[probe] REGRESSION vs committed PROBES.json: $r"))
      sys.exit(1)
    }
  }
}

/** 10x scale probe for the STREAMING front doors that had plan-reading
  * verdicts but no measurement: st12 (update-mode hour partials +
  * keyed MERGE, coarser grains from the stored partials), st13
  * (stream-stream LEFT OUTER with watermark null-padding) and st14
  * (per-batch expectations split into clean/quarantine sinks). Runs
  * each end-to-end — topic publish, micro-batch cycles, sink reads —
  * on the 1x corpus and on [[EventScaleProbe]]'s 10x per-key-density
  * corpus (same user population, so join fan-out and agg group density
  * grow with the copies — the adversarial direction for join state and
  * partial-agg width).
  *
  * Reading the verdicts: st12/st14 carry per-row work only — flat-ish
  * time_ratio well under copies is the pass. st13's TRUE output grows
  * ~copies^2 per user (every view matches every in-window purchase on
  * both sides' copies), so its rows_ratio ~100 at 10x is join
  * SEMANTICS, not a plan defect; the pass criterion is time tracking
  * OUTPUT rows, not input rows.
  *
  * Run: `SPARK_GRAFT_SCALE_COPIES=10 sbt "runMain graft.StreamScaleProbe"`;
  * verdict rows land in PROBES.json + BASELINE.md §4.
  */
object StreamScaleProbe {

  private val Subset = Seq(
    "st12_stream_rollup_cascade",
    "st13_stream_left_outer",
    "st14_stream_expectations",
    // round-8 addition: streaming SCD2 — per-user change density grows
    // 10x, the adversarial direction for the per-batch O(delta) fold
    "st15_stream_scd2",
    // round-14: streaming mergeable-sketch state — per-batch cost is
    // one map + a <= |types|*256-cell partial agg no matter how many
    // events the batch carries; the row pins the claim that the as-of
    // report's cost never tracks the raw event count
    "st22_stream_hll")

  /** st16 consumes the DOCUMENTS corpus ([[ScaleProbe]]'s near-dup 10x
    * synthesis), not events: its scale couplings — the incremental
    * decontam joins against two GROWING shingle stores and the
    * corpus-global publish (CC + RangeRank) — are exactly what the
    * per-key-density events corpus cannot exercise. Through round 10
    * its scale claim was st11's row as a proxy; this gives the slowest
    * query in the engine its own measured, gated verdict. */
  private val DocSubset = Seq("st16_stream_corpus_build",
    // round-12: the drift monitor's per-batch cost is the t31 scoring
    // scan + a <=51-cell agg — the row pins it scan-bound per batch
    "st17_stream_drift",
    // round-13: the length-drift axis — cheaper per batch than st17
    // (token count vs classifier scoring), same commit-floor claim
    "st18_stream_len_drift",
    // round-14: the language axis (st19 — per-batch cost is the t03
    // keyword-profile projection + a ~4-cell agg) and the drift→refit
    // composition (st20 — per batch one histogram agg + a bounded
    // decisions collect; firing batches add k perceptron scans of the
    // accumulated CLEAN store, so its scale claim is that non-firing
    // batches stay at the st18 price)
    "st19_stream_lang_drift", "st20_stream_drift_refit",
    // st21 (data-plane act): per batch one ~12-cell histogram agg +
    // a bounded decisions collect + a partitioned append of the batch
    // itself — O(batch) forever, never a re-scan of the accumulated
    // corpus
    "st21_stream_quarantine",
    // round-15: the promotion gate (st23 — champion/challenger): per
    // firing batch ONE challenger fit + ONE combined two-model val
    // scan; non-firing batches pay the st18 histogram price only
    "st23_stream_promote",
    // st24 composes quarantine + promotion against one shared root —
    // one decision derivation per batch (dec/ read-through); the row
    // pins that the composition costs ~the sum of its parts, never a
    // re-derivation multiple
    "st24_stream_lineage",
    // round-17: the quarantine-protected corpus build (st21 routing +
    // st16 build at the st24 single-commit seam) — the row pins that
    // the composition stays at the st16 build price plus O(batch)
    // routing, with a fired batch costing LESS (the build skip)
    "st25_stream_curated_corpus")

  def main(args: Array[String]): Unit = {
    ProbeLog.hostStart()
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val srcTag = ScaleProbe.srcTag(src)
    val dir = s"/tmp/graft-evscale-$srcTag-$copies"
    val synthesizedEv = EventScaleProbe.synthesize(spark, src, dir, copies)
    val docDir = s"/tmp/graft-scale-$srcTag-$copies"
    val synthesized =
      ScaleProbe.synthesize(spark, src, docDir, copies) | synthesizedEv

    val wev = sources.Tables.events(spark, src)
    wev.join(wev.select("event_id"), "event_id").agg(count(lit(1))).collect()

    def runOne(n: String, d: String): (String, Double, Long) = {
      System.err.println(s"[probe] $n @ $d")
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).count()
      (n, (System.nanoTime() - t0) / 1e9, rows)
    }
    def runSet(evD: String, docD: String): Seq[(String, Double, Long)] =
      Subset.map(runOne(_, evD)) ++ DocSubset.map(runOne(_, docD))
    val base = runSet(src, src)
    val scaled = runSet(dir, docDir)

    // BATCHES-AXIS rows (round-15): the stream-LIFETIME scale claim —
    // per-batch derivation cost must be FLAT in the number of batches
    // already stored, which the r14 designs violated (per-arrival
    // re-derivation of all decisions; prefix self-join over all sketch
    // partials) and the dec/cum stores now fix. Same corpus split into
    // 4 vs 8 arrival waves: per_batch_ratio = (sec8/8)/(sec4/4) — a
    // flat-to-falling ratio (more, smaller batches are each cheaper)
    // is the pass; a ratio climbing toward 2 would expose per-batch
    // work growing with batches seen. Commit machinery (fixed cost x
    // 2x batches) pushes the TOTAL up; the per-batch metric is the
    // claim.
    def freshRoot(name: String): String = {
      val p = java.nio.file.Paths.get(s"/tmp/graft-stream-axis/$name")
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.delete(f))
      }
      java.nio.file.Files.createDirectories(p)
      p.toString
    }
    def timedSec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val axisEv = sources.Tables.events(spark, src)
    val axisDocs = sources.Tables.documents(spark, src)
    val batchesAxis = Seq(
      "st22" -> Seq(4, 8).map { n =>
        n -> timedSec(graft.streaming.StreamSketch.run(
          spark, axisEv, freshRoot(s"st22-$n"), nSlices = n).count())
      },
      // st21 not st20: quarantine carries the identical decision
      // machinery without the firing-count-dependent perceptron fits,
      // so the ratio isolates the per-batch decision cost
      "st21" -> Seq(4, 8).map { n =>
        n -> timedSec(graft.streaming.StreamQuarantine.run(
          spark, axisDocs, freshRoot(s"st21-$n"), nSlices = n).count())
      })
    val batchesJs = batchesAxis.map { case (q, rs) =>
      val m = rs.toMap
      val perBatchRatio = (m(8) / 8.0) / (m(4) / 4.0)
      s""""$q":{"sec4":${ProbeLog.fmt(m(4), 3)},""" +
        s""""sec8":${ProbeLog.fmt(m(8), 3)},""" +
        s""""per_batch_ratio":${ProbeLog.fmt(perBatchRatio, 2)}}"""
    }.mkString("{", ",", "}")

    import ProbeLog.js
    val metricName =
      if (copies == 10) "stream_scale_probe" else s"stream_scale_probe_${copies}x"
    val line = s"""{"metric":"$metricName","copies":$copies,""" +
      s""""synthesis_run":$synthesized,""" +
      s""""base":${js(base)},"scaled":${js(scaled)},""" +
      s""""ratios":${ProbeLog.ratios(base, scaled)},""" +
      s""""batches_axis":$batchesJs,"sf":"$src",${ProbeLog.hostJson()}}"""
    println(line)
    val regressions = ProbeLog.recordGated(metricName, line)
    spark.stop()
    if (regressions.nonEmpty) {
      regressions.foreach(r =>
        System.err.println(s"[probe] REGRESSION vs committed PROBES.json: $r"))
      sys.exit(1)
    }
  }
}

/** Zipf-duplication variant of the dedup scale probe (VERDICT r8 task
  * 5): the standing 100x corpus is duplicate-SATURATED — every doc sits
  * in a clique of `copies` — so st11/d04's ~10x time ratios there are
  * output-bound (pair output grew 8 813–108 497x) and say nothing about
  * per-row overhead. This corpus duplicates only ~1% of docs (doc_id %
  * 100 == 0 becomes a clique of `copies`); the other 99% of each copy
  * is caesar-shifted into genuinely DISTINCT content (different words,
  * different shingles/simhash bits, same length statistics) — the
  * realistic crawl profile. If the saturated ratio was output-tracking,
  * the Zipf time ratio must collapse toward flat-per-input; a ratio
  * that STAYS super-linear here would expose real per-row overhead.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01
  * SPARK_GRAFT_SCALE_COPIES=100 sbt "runMain graft.ZipfScaleProbe"`.
  */
object ZipfScaleProbe {

  private val Subset = Seq(
    "d03_minhash_lsh", "d04_simhash", "st11_stream_ingest_dedup",
    // the full corpus-build composition: on the SATURATED corpus
    // decontamination correctly zeroes the manifest (every survivor
    // shares shingles with held-out content), so only this realistic
    // profile can show the end-to-end pipeline producing real shards
    // at 100x
    "t28_corpus_build",
    // contamination attribution: the hit table is bounded by ACTUAL
    // train-eval overlap, and only the realistic-duplication profile
    // has a non-degenerate overlap at 100x — the row that proves the
    // argmax aggregate stays output-bound, not corpus-bound
    "t30_contamination_attribution",
    // round-13: the trainer on the realistic profile — caesar-shifted
    // copies multiply the VOCABULARY (every permuted alphabet mints
    // new hashed features), the adversarial direction for a fixed
    // 64-bucket feature space: gradients stay 64 cells, scans stay
    // linear, whatever the feature cardinality
    "t35_classifier_train",
    // round-14: the label-free LM on the same vocabulary-multiplying
    // axis — the reference fit folds 100x as many distinct features
    // into the same 64 smoothing buckets (collision saturation), and
    // the ratio table must stay a bounded 64-row collect regardless
    "t39_lm_quality",
    // the ensemble's three fused signals under the same profile
    "t40_quality_ensemble")

  private val IdStride = 10000000L

  /** Per-copy substitution alphabet: the 26 letters ordered by
    * md5("k:letter") — a deterministic permutation, DISTINCT for every
    * copy (a plain rotation would repeat every 25 copies and silently
    * clone each non-clique doc into exact-dup groups of copies/25 —
    * the round-9 review caught exactly that in the first Zipf run).
    * The identity permutation is remapped (it would alias copy 0). */
  private[graft] def permFor(k: Int): String = {
    val abc = "abcdefghijklmnopqrstuvwxyz"
    val md = java.security.MessageDigest.getInstance("MD5")
    val p = abc.sortBy { c =>
      md.digest(s"$k:$c".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.mkString
    if (p == abc) p.reverse else p
  }

  private[graft] def synthesize(spark: SparkSession, src: String, dir: String,
      copies: Int): Boolean = {
    if (ScaleProbe.readyExists(spark, dir)) return false
    val docs = sources.Tables.documents(spark, src)
    val abc = "abcdefghijklmnopqrstuvwxyz"
    val perms = (1 until copies).map(permFor)
    require(perms.distinct.size == perms.size,
      "ZipfScaleProbe: per-copy alphabets must be pairwise distinct")
    (0 until copies).map { k =>
      if (k == 0) docs
      else {
        // 1% clique members stay near-duplicates (suffixed); the rest
        // map through a per-copy-distinct substitution alphabet —
        // different words in EVERY copy, so no cross-copy
        // shingle/simhash collisions anywhere outside the cliques
        docs.select(
          (col("doc_id") + lit(k * IdStride)).as("doc_id"),
          when(col("doc_id") % 100 === 0,
            concat(col("text"), lit(s" variant $k")))
            .otherwise(translate(col("text"), abc, perms(k - 1))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    ScaleProbe.markReady(spark, dir)
    true
  }

  def main(args: Array[String]): Unit = {
    ProbeLog.hostStart()
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val srcTag = ScaleProbe.srcTag(src)
    val dir = s"/tmp/graft-zipf-$srcTag-$copies"
    val synthesized = synthesize(spark, src, dir, copies)

    val wdocs = sources.Tables.documents(spark, src)
    wdocs.join(wdocs.select("doc_id"), "doc_id").agg(count(lit(1))).collect()

    def runSet(d: String): Seq[(String, Double, Long)] = Subset.map { n =>
      System.err.println(s"[probe] $n @ $d")
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).count()
      (n, (System.nanoTime() - t0) / 1e9, rows)
    }
    val base = runSet(src)
    val scaled = runSet(dir)

    import ProbeLog.js
    val metricName =
      if (copies == 10) "scale_probe_zipf" else s"scale_probe_zipf_${copies}x"
    val line = s"""{"metric":"$metricName","copies":$copies,""" +
      s""""synthesis_run":$synthesized,""" +
      s""""base":${js(base)},"scaled":${js(scaled)},""" +
      s""""ratios":${ProbeLog.ratios(base, scaled)},"sf":"$src",${ProbeLog.hostJson()}}"""
    println(line)
    val regressions = ProbeLog.recordGated(metricName, line)
    spark.stop()
    if (regressions.nonEmpty) {
      regressions.foreach(r =>
        System.err.println(s"[probe] REGRESSION vs committed PROBES.json: $r"))
      sys.exit(1)
    }
  }
}

/** CPU strong-scaling probe — the missing evidence axis. Every other
  * probe scales the DATA and asks "does time stay flat per row?"; this
  * one holds the data fixed and scales the COMPUTE (local[lo] vs
  * local[hi] sessions in the same JVM, `spark.sql.shuffle.partitions`
  * matched to the core count), asking the 1000-executor question
  * directly: does wall-clock actually fall as cores are added, or is
  * there a hidden serialization point — a SinglePartition exchange, a
  * driver-side loop, a non-splittable stage — that parallelism cannot
  * buy back?
  *
  * Verdict columns: `time_ratio` = t_hi / t_lo (well under 1 is the
  * pass; ~1.0 means the query is NOT compute-scalable), plus a
  * `speedup` block with parallel efficiency vs the hi/lo core ratio.
  * Perfect efficiency is unreachable in one JVM (shared memory
  * bandwidth, one GC, constant-cost stages like small-file footer
  * reads), so the pass criterion is a CLEAR speedup on the heavy
  * queries, not the ideal hi/lo multiple; t08 (RangeRank — the op that
  * replaced a SinglePartition global-rank window) is in the subset
  * precisely because a serialization regression there would show as
  * time_ratio -> 1 long before a plan-shape spec catches it.
  *
  * The probe runs on [[ScaleProbe]]'s 10x document/embedding corpus
  * and [[EventScaleProbe]]'s 10x events corpus, NOT on the raw sf
  * tables: a first cut at plain sf0.1 (5 000 docs) measured ~1.0x
  * across the board because at that size wall-clock is fixed overhead
  * (plan analysis, codegen, footer reads, job scheduling) that 8 cores
  * already absorb — an honest null result, but the question is how the
  * COMPUTE scales, so the corpus must be big enough for compute to
  * dominate. The two streaming front doors (st12/st15) ARE in the
  * subset — their wall-clock is micro-batch commit machinery, which
  * is exactly the hidden-serialization suspect the axis exists to
  * measure (expected reading ~1.0: per-run state partitioning is
  * pinned, so only per-batch compute can scale). q51's pagerank is
  * still excluded from the CORES axis (3 fixed iterations at this sf
  * measure scheduling, not compute) but has its own DATA-scaling row
  * via [[PageRankScaleProbe]] — the gap is measured, not tribal.
  *
  * Run: `sbt "runMain graft.CoresProbe"` (defaults lo=8, hi=32 over
  * the 10x corpora synthesized from /root/testdata/sf0.1;
  * SPARK_GRAFT_CORES_LO/HI override). `SPARK_GRAFT_CORES_MODE=fed`
  * switches to the fed-corpus subsets (t28 on Zipf-100x, s02 on the
  * 100x embeddings, q60 on the 100x events) and records
  * `cores_probe_100x` — the measured answer to "does capacity come
  * from data growing into the parallelism?".
  */
/** Data-scaling probe for the one expensive query no synthetic corpus
  * covered: q51's PageRank reads the lineitem part–supplier graph,
  * absent from the docs/embeddings/events corpora, so through round 9
  * its scale behavior was argued ("per-round cost is one key join over
  * edges"), never measured. This probe synthesizes a `copies`x edge
  * multiset as key-offset DISJOINT copies of the base graph — rank
  * mass never flows between copies, so per-iteration cost scales with
  * |edges| while the round count stays the fixed 3 — and records the
  * gated `pagerank_scale_probe` row (expect a near-flat time_ratio;
  * super-linear growth would mean the per-round join or the
  * convergence machinery degrades with graph size).
  *
  * Run: `sbt "runMain graft.PageRankScaleProbe"` (defaults: 10 copies
  * of sf0.1's lineitem; SPARK_GRAFT_SF_DIR / SPARK_GRAFT_SCALE_COPIES
  * override).
  */
object PageRankScaleProbe {

  private val IdStride = 10000000L

  private def synthesize(spark: SparkSession, src: String, dir: String,
      copies: Int): Boolean = {
    if (ScaleProbe.readyExists(spark, dir)) return false
    // only the two graph columns: q51 prunes to them anyway, and the
    // probe corpus should not pay 14 unread lineitem columns of IO
    val li = sources.Tables.lineitem(spark, src)
      .select("l_partkey", "l_suppkey")
    (0 until copies).map { k =>
      li.select((col("l_partkey") + lit(k * IdStride)).as("l_partkey"),
        (col("l_suppkey") + lit(k * IdStride)).as("l_suppkey"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    ScaleProbe.markReady(spark, dir)
    true
  }

  def main(args: Array[String]): Unit = {
    ProbeLog.hostStart()
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val srcTag = ScaleProbe.srcTag(src)
    val dir = s"/tmp/graft-prscale-$srcTag-$copies"
    val synthesized = synthesize(spark, src, dir, copies)

    def run(d: String): (String, Double, Long) = {
      System.err.println(s"[probe] q51_pagerank @ $d")
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries("q51_pagerank")(spark, d).count()
      ("q51_pagerank", (System.nanoTime() - t0) / 1e9, rows)
    }
    run(src) // untimed warm-up: JIT + codegen
    val base = Seq(run(src))
    val scaled = Seq(run(dir))

    import ProbeLog.js
    val metricName =
      if (copies == 10) "pagerank_scale_probe"
      else s"pagerank_scale_probe_${copies}x"
    val line = s"""{"metric":"$metricName","copies":$copies,""" +
      s""""synthesis_run":$synthesized,""" +
      s""""base":${js(base)},"scaled":${js(scaled)},""" +
      s""""ratios":${ProbeLog.ratios(base, scaled)},"sf":"$src",${ProbeLog.hostJson()}}"""
    println(line)
    val regressions = ProbeLog.recordGated(metricName, line)
    spark.stop()
    if (regressions.nonEmpty) {
      regressions.foreach(r =>
        System.err.println(s"[probe] REGRESSION vs committed PROBES.json: $r"))
      sys.exit(1)
    }
  }
}

/** Chain-topology probe for ConnectedComponents — the driver-round
  * floor measurement. Every dedup probe corpus builds CLIQUE-shaped
  * duplicate groups (diameter 1–2), which never exercises the
  * O(diameter) risk of min-label propagation: a CHAIN of near-dups
  * (doc A ~ B ~ C ~ ..., the long-tail crawl topology where each
  * revision resembles only its neighbors) has diameter = n, and a
  * one-driver-action-per-round loop would pay n round-trips — at
  * round-10's measured 1–2 s per round, a 4096-link chain would be
  * HOURS. The pointer-jumping shortcut (ConnectedComponents round =
  * hop + jump) bounds rounds at O(log diameter); this probe measures
  * exactly that:
  *
  *  - operator leg: pure chain edge lists at 256 and 4096 nodes —
  *    rounds must grow by ~log2(16x) = 4, never 16x, and the probe
  *    HARD-FAILS if rounds exceed log2(n) + 6;
  *  - composition leg: d07 (near-dup pairs -> CC -> clusters) on a
  *    sliding-window chain corpus (doc i = tokens i..i+19, so only
  *    distance <= 2 neighbors clear the 0.8 Jaccard bar) at 500 and
  *    2000 docs — one giant path-shaped component of diameter ~n/2;
  *    without the jump this leg does not finish inside maxIter=50.
  *
  * Run: `sbt "runMain graft.CcChainProbe"`; gated row `cc_chain_probe`.
  */
object CcChainProbe {

  private[graft] def synthesizeChain(spark: SparkSession, dir: String,
      nDocs: Int): Unit = {
    if (ScaleProbe.readyExists(spark, dir)) return
    val text = concat_ws(" ",
      (0 until 20).map(j => concat(lit("tok"), col("id") + j)): _*)
    spark.range(nDocs)
      .select(col("id").as("doc_id"), text.as("text"),
        lit("en").as("lang"), lit("chain").as("source"),
        length(text).cast("long").as("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    ScaleProbe.markReady(spark, dir)
  }

  def main(args: Array[String]): Unit = {
    ProbeLog.hostStart()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    def ccChain(n: Long): (Double, Long, Int) = {
      System.err.println(s"[probe] cc_chain @ $n nodes")
      val edges = spark.range(n - 1)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val t0 = System.nanoTime()
      val (labels, rounds) =
        operators.ConnectedComponents.runWithRounds(edges)
      val rows = labels.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // correctness on the way: one component, labeled by its min id
      val lbl = labels.select("label").distinct().collect()
      require(lbl.length == 1 && lbl(0).getLong(0) == 0L,
        s"chain($n) mislabeled: ${lbl.take(3).mkString(",")}")
      (sec, rows, rounds)
    }
    def d07Chain(nDocs: Int): (Double, Long) = {
      System.err.println(s"[probe] d07_chain @ $nDocs docs")
      val dir = s"/tmp/graft-ccchain-$nDocs"
      synthesizeChain(spark, dir, nDocs)
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries("d07_dedup_clusters")(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // untimed warm-up (JIT + codegen) on a tiny chain
    ccChain(32)

    val (sB, rB, roundsB) = ccChain(256)
    val (sS, rS, roundsS) = ccChain(4096)
    val (dB, dRowsB) = d07Chain(500)
    val (dS, dRowsS) = d07Chain(2000)

    def logBound(n: Long): Int =
      (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 6
    val roundFailures = Seq(
      (roundsB > logBound(256)) ->
        s"cc_chain(256): $roundsB rounds > log bound ${logBound(256)}",
      (roundsS > logBound(4096)) ->
        s"cc_chain(4096): $roundsS rounds > log bound ${logBound(4096)}",
      (roundsS - roundsB > 6) ->
        s"rounds grew $roundsB -> $roundsS for a 16x chain (not log-like)"
    ).collect { case (true, msg) => msg }

    val base = Seq(("cc_chain", sB, rB), ("d07_chain", dB, dRowsB))
    val scaled = Seq(("cc_chain", sS, rS), ("d07_chain", dS, dRowsS))
    import ProbeLog.js
    val line = s"""{"metric":"cc_chain_probe",""" +
      s""""base":${js(base)},"scaled":${js(scaled)},""" +
      s""""ratios":${ProbeLog.ratios(base, scaled)},""" +
      s""""rounds":{"cc_chain_base":$roundsB,"cc_chain_scaled":$roundsS},""" +
      s""""sf":"synthetic-chain",${ProbeLog.hostJson()}}"""
    println(line)
    val regressions = ProbeLog.recordGated("cc_chain_probe", line) ++
      roundFailures
    spark.stop()
    if (regressions.nonEmpty) {
      regressions.foreach(r =>
        System.err.println(s"[probe] REGRESSION/ROUND-BOUND: $r"))
      sys.exit(1)
    }
  }
}

object CoresProbe {

  /** Compute-heavy batch queries over the 10x docs/embeddings corpus:
    * shingle/minhash hashing (d03), simhash bit votes (d04), k-gram
    * spans (d12), BM25 scoring + bounded heaps (t23), the full
    * corpus-build composition (t28), distributed global rank (t08),
    * sized-LSH ANN (s02). */
  private val DocSubset = Seq(
    "d03_minhash_lsh", "d04_simhash", "d12_substring_spans",
    "t23_bm25", "t28_corpus_build", "t08_corpus_shuffle", "s02_ann_lsh")

  /** Events-family queries over the 10x events corpus: the fused
    * rollup cascade (p19), the cohort-retention distinct counts (q60)
    * — the widest agg and the widest distinct in the family — plus the
    * two streaming front doors (st12 streamed rollup partials, st15
    * streamed SCD2): their wall-clock is dominated by micro-batch
    * commit machinery, the likeliest hidden serialization point in the
    * engine, so the cores axis must MEASURE it rather than exclude it.
    * (Their registrations pin 8 state partitions per run, so what
    * scales here is the per-batch compute and IO, not state width —
    * a ~1.0 ratio is the honest expected reading, and a regression
    * above it would flag commit work growing with cores.) */
  private val EventSubset = Seq("p19_rollup_cascade", "q60_cohort_retention",
    "st12_stream_rollup_cascade", "st15_stream_scd2")

  /** Fed-corpus mode (SPARK_GRAFT_CORES_MODE=fed): the round-9 probe
    * read t28/s02/q60 at <= 1.0x speedup on the 10x corpora and argued
    * "capacity comes from data growing into the parallelism" — this
    * mode CHECKS that claim instead of arguing it, by re-asking the
    * cores question on corpora big enough to feed 32 threads:
    * t28 on the Zipf-100x realistic-duplication corpus (500k docs,
    * the one profile where the full build produces real shards),
    * s02 on the 100x embedding corpus (50k vectors), q60 on the 100x
    * events corpus. Emits metric `cores_probe_100x`. */
  private val FedDocSubset = Seq("t28_corpus_build",
    // round-11: the incremental corpus build on the same fed corpus —
    // the batch topology (t28) and its micro-batch twin (st16) answer
    // the cores question side by side (expected reading: t28 scales
    // with compute, st16 sits nearer ~1.0 on commit machinery)
    "st16_stream_corpus_build",
    // round-12: d15 composes the two known cores-sensitive profiles —
    // CC driver rounds (pair graph) + the full-scan classifier scoring
    "d15_quality_keep",
    // round-13: the trainer — k full-corpus scoring scans with
    // <=64-cell aggs between bounded driver collects; on 500k docs the
    // scans dominate, so this is the row that shows whether the
    // iteration barrier (driver collect per iteration) caps speedup
    "t35_classifier_train")
  private val FedEmbSubset = Seq("s02_ann_lsh")
  private val FedEventSubset = Seq("q60_cohort_retention")

  private def session(cores: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    spark
  }

  def main(args: Array[String]): Unit = {
    ProbeLog.hostStart()
    val fed = sys.env.get("SPARK_GRAFT_CORES_MODE").contains("fed")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      if (fed) "/root/testdata/sf0.01" else "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES",
      if (fed) "100" else "10").toInt
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    val lo = sys.env.getOrElse("SPARK_GRAFT_CORES_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_CORES_HI", "32").toInt

    val srcTag = ScaleProbe.srcTag(src)
    val docDir = s"/tmp/graft-scale-$srcTag-$copies"
    val evDir = s"/tmp/graft-evscale-$srcTag-$copies"
    val zipfDir = s"/tmp/graft-zipf-$srcTag-$copies"
    val metric = if (fed) "cores_probe_100x" else "cores_probe"

    // each configuration gets its own session AND its own untimed
    // warm-up pass (JIT/codegen warms JVM-wide on the first config;
    // warming both keeps the comparison honest rather than gifting
    // the second config a hot code cache)
    var synthesized = false
    def measure(cores: Int): Seq[(String, Double, Long)] = {
      val spark = session(cores)
      try {
        val work =
          if (fed) {
            synthesized |= ZipfScaleProbe.synthesize(spark, src, zipfDir, copies)
            synthesized |= ScaleProbe.synthesize(spark, src, docDir, copies)
            synthesized |= EventScaleProbe.synthesize(spark, src, evDir, copies)
            FedDocSubset.map(_ -> zipfDir) ++
              FedEmbSubset.map(_ -> docDir) ++
              FedEventSubset.map(_ -> evDir)
          } else {
            synthesized |= ScaleProbe.synthesize(spark, src, docDir, copies)
            synthesized |= EventScaleProbe.synthesize(spark, src, evDir, copies)
            DocSubset.map(_ -> docDir) ++ EventSubset.map(_ -> evDir)
          }
        work.foreach { case (n, _) =>
          SparkEntry.queries(n)(spark, warm).count()
        }
        work.map { case (n, d) =>
          System.err.println(s"[probe] $n @ local[$cores]")
          val t0 = System.nanoTime()
          val rows = SparkEntry.queries(n)(spark, d).count()
          (n, (System.nanoTime() - t0) / 1e9, rows)
        }
      } finally spark.stop()
    }

    val loRun = measure(lo)
    val hiRun = measure(hi)

    val ideal = hi.toDouble / lo
    val loMap = loRun.map(r => r._1 -> r._2).toMap
    // ROOT-locale formatting (ProbeLog.fmt): the f"" interpolator is
    // locale-dependent and a comma-decimal host would corrupt the file
    val speedup = hiRun.map { case (n, t, _) =>
      val s = if (t > 0) loMap(n) / t else -1.0
      s""""$n":{"speedup":${ProbeLog.fmt(s, 2)},""" +
        s""""efficiency":${ProbeLog.fmt(s / ideal, 2)}}"""
    }.mkString("{", ",", "}")

    import ProbeLog.js
    val line = s"""{"metric":"$metric","cores_lo":$lo,"cores_hi":$hi,""" +
      s""""synthesis_run":$synthesized,""" +
      s""""lo":${js(loRun)},"hi":${js(hiRun)},""" +
      s""""ratios":${ProbeLog.ratios(loRun, hiRun)},""" +
      s""""speedup":$speedup,"sf":"$src",${ProbeLog.hostJson()}}"""
    println(line)
    val regressions = ProbeLog.recordGated(metric, line)
    if (regressions.nonEmpty) {
      regressions.foreach(r =>
        System.err.println(s"[probe] REGRESSION vs committed PROBES.json: $r"))
      sys.exit(1)
    }
  }
}
