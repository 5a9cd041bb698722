package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with two exact dups (1,2), one near-dup pair (3,4), and
    * unrelated docs. */
  lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The quick  brown fox jumps over the lazy dog "), // exact after norm
    (3L, "the quick brown fox jumps over the sleepy dog today"),
    (4L, "the quick brown fox jumps over the sleepy cat today"),
    (5L, "completely different content about spark query engines"),
    (6L, "yet another unrelated string of words entirely here")
  ).toDF("doc_id", "text")

  test("exact dedup groups normalize-equal docs") {
    val groups = Dedup.exactDupGroups(corpus).collect()
    groups.length shouldBe 1
    groups(0).getAs[Long]("n_members") shouldBe 2L
    groups(0).getAs[Long]("canonical_id") shouldBe 1L
  }

  test("decontamination counts shingle overlap with the eval subset") {
    // doc 100 is "eval"; doc 1 copies half of it, doc 2 is clean
    val docs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta unrelated tail words here"),
      (2L, "totally different training document content")
    ).toDF("doc_id", "text")
    val stats = graft.text.Decontaminate
      .overlapStats(docs, col("doc_id") === 100L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 1: 6 shingles, shares "alpha beta gamma"/"beta gamma delta"
    stats shouldBe Seq((1L, 6L, 2L), (2L, 3L, 0L))
  }

  test("attribution names the top contributing eval doc, ties to min id") {
    val docs = Seq(
      (10L, "a b c d"), // eval: shingles {abc, bcd}
      (20L, "a b c e"), // eval: shingles {abc, bce}
      (30L, "a b c x"), // train: {abc, bcx} — ties eval 10 and 20 at 1
      (40L, "b c d y"), // train: {bcd, cdy} — only eval 10
      (50L, "p q r s") // train, clean: absent from the report
    ).toDF("doc_id", "text")
    val rows = graft.text.Decontaminate
      .attribution(docs, col("doc_id") < 30L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    rows shouldBe Seq(
      (30L, 10L, 1L, 2L, 1L), // tie broken to the smaller eval id
      (40L, 10L, 1L, 1L, 1L))
  }

  test("bloom decontamination never undercounts the exact overlap") {
    import graft.functions.BloomMightContain
    val docs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta unrelated tail words here"),
      (2L, "totally different training document content")
    ).toDF("doc_id", "text")
    val isEval = col("doc_id") === 100L
    val exact = graft.text.Decontaminate.overlapStats(docs, isEval)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // sized filter: sparse -> here the bloom count equals the exact one
    val bloom = graft.text.Decontaminate
      .bloomOverlapStats(docs, isEval, mBits = 1 << 12)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    bloom.keySet shouldBe exact.keySet
    for ((id, (nSh, nBloom)) <- bloom) {
      nSh shouldBe exact(id)._1
      nBloom should be >= exact(id)._2 // no false negatives, ever
    }
    bloom(1L)._2 shouldBe 2L // at 2^12 bits / 4 keys, no false positives
    // a deliberately tiny filter saturates: everything "contained"
    val tiny = graft.text.Decontaminate
      .bloomOverlapStats(docs, isEval, mBits = 64)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    for ((id, n) <- tiny) n should be >= exact(id)._2
    // sizing helper: power of two, monotone in n, shrinks with looser fp
    val m1 = BloomMightContain.mBitsFor(1000L, 0.01)
    Integer.bitCount(m1) shouldBe 1
    BloomMightContain.mBitsFor(100000L, 0.01) should be > m1
    BloomMightContain.mBitsFor(1000L, 0.2) should be <= m1
    // every inserted key tests positive through the real bit array
    val keys = (1 to 50).map(i => graft.functions.PolyHash64.hash(s"key $i"))
    val m = 1 << 10
    val words = BloomMightContain.buildWords(
      keys.flatMap(h => (0 until BloomMightContain.K)
        .map(j => BloomMightContain.probe(h, j, m).toLong)).toArray, m)
    every(keys.map(BloomMightContain.test(words, m, _))) shouldBe true
  }

  test("ngram jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(corpus, minJaccard = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L)) // identical -> jaccard 1.0
    pairs should contain((3L, 4L))
    pairs.flatMap(p => Seq(p._1, p._2)) should not contain 5L
  }

  test("containment flags a near-subset pair that jaccard misses") {
    // doc 11's shingles are (almost) all inside doc 10, but doc 10 is
    // 4x larger: containment ~1 while jaccard ~ |A|/|B| stays low
    val quote = "the quick brown fox jumps over the lazy dog again"
    val big = quote + " " + (1 to 30).map(i => s"filler$i").mkString(" ")
    val docs = Seq((10L, big), (11L, quote),
      (12L, "entirely unrelated words about columnar storage engines"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, minContainment = 0.9)
      .as[(Long, Long, Double, Double)].collect()
    pairs.map(p => (p._1, p._2)).toSet shouldBe Set((10L, 11L))
    val (_, _, contBig, contSmall) = pairs(0)
    contSmall shouldBe 1.0 // every quote shingle lives in the big doc
    contBig should be < 0.25 // while the big doc is mostly NOT the quote
    // ...which is exactly the pair symmetric jaccard at 0.5 cannot see
    Dedup.ngramJaccardPairs(docs, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect() shouldBe empty
  }

  test("CDC chunks reassemble the text and survive a prefix edit") {
    import graft.functions.CdcChunks
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu") * 3
    def chunksOf(s: String): Seq[String] =
      Seq(s).toDF("t").select(CdcChunks(col("t"), 8, 64).as("c"))
        .as[Seq[String]].collect()(0)
    val base = chunksOf(text)
    base.mkString shouldBe text // lossless split
    base.length should be > 1 // mask 64 fires on a ~400-char text
    // content-defined property: an edit at the front shifts offsets but
    // chunks after the first post-edit boundary are unchanged
    val edited = chunksOf("zzz inserted words zzz " + text)
    base.intersect(edited).nonEmpty shouldBe true
    base.last shouldBe edited.last
    // degenerate inputs
    chunksOf("") shouldBe Seq.empty
    chunksOf("short") shouldBe Seq("short") // below the window width
  }

  test("incremental LSH equals the full run restricted to the delta") {
    // docs 4 and 5 arrive as the new batch; 1-3 and 6 are the index
    val isDelta = col("doc_id").isin(4L, 5L)
    val index = Dedup.minhashSignatures(
      corpus.filter(!isDelta), "doc_id", "text", 12, 3)
    val inc = Dedup.incrementalLshPairs(index, corpus.filter(isDelta),
        k = 12, bands = 4, minEst = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.minhashLshPairs(corpus, k = 12, bands = 4, minEst = 0.4)
      .as[(Long, Long, Double)].collect()
      .filter(p => Set(p._1, p._2).intersect(Set(4L, 5L)).nonEmpty).toSet
    inc shouldBe full
    inc.map(p => (p._1, p._2)) should contain((3L, 4L)) // the near-dup pair
  }

  test("minhash LSH surfaces high-jaccard candidates with sane estimates") {
    val pairs = Dedup.minhashLshPairs(corpus, k = 12, bands = 4, minEst = 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pairs.keySet should contain((1L, 2L))
    pairs((1L, 2L)) shouldBe 1.0 // identical docs agree on every hash
    // near-dups should estimate materially above unrelated docs
    pairs.get((3L, 4L)).foreach(_ should be > 0.4)
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val sims = corpus
      .select($"doc_id", Dedup.simhash($"text").as("s"))
      .select($"doc_id", $"s.sim_lo", $"s.sim_hi")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    sims(1L) shouldBe sims(2L) // identical after normalization
    def hamming(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    hamming(sims(3L), sims(4L)) should be < hamming(sims(3L), sims(5L))
  }

  test("row-local simhash agrees with the distributed simhashes table") {
    val local = corpus
      .select($"doc_id", Dedup.simhash($"text").as("s"))
      .select($"doc_id", $"s.sim_lo", $"s.sim_hi")
      .as[(Long, Long, Long)].collect().toSet
    val dist = Dedup.simhashes(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    dist shouldBe local
  }

  test("simhashPairs blocks and filters by hamming") {
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
  }

  test("simhash band-bucket cardinality grows with the corpus") {
    // the old 24-bit/8-bit-band scheme capped at 3*256 = 768 distinct
    // buckets no matter the corpus; 16-bit bands over 64 bits must give
    // (roughly) one bucket per distinct doc per band
    val docs = Tables.documents(spark, SfDir)
    val nDocs = docs.count()
    val sims = Dedup.simhashes(docs, "doc_id", "text")
    val distinctBuckets = sims.select(
      explode(array(
        concat(lit("0|"), col("sim_lo").bitwiseAND(65535L).cast("string")),
        concat(lit("1|"),
          shiftright(col("sim_lo"), 16).bitwiseAND(65535L).cast("string")),
        concat(lit("2|"), col("sim_hi").bitwiseAND(65535L).cast("string")),
        concat(lit("3|"),
          shiftright(col("sim_hi"), 16).bitwiseAND(65535L).cast("string"))))
        .as("band"))
      .select("band").distinct().count()
    distinctBuckets should be > 768L
    distinctBuckets should be >= nDocs
  }

  test("hot-bucket cap bounds a pathological single-bucket corpus") {
    // 40 identical docs -> every band is one bucket of size 40: without
    // a cap the candidate join yields 40*39/2 pairs; capped below 40 it
    // must yield none, and the legit corpus must be unaffected
    val degenerate = (1L to 40L).map(i => (i, "all documents identical"))
      .toDF("doc_id", "text")
    Dedup.simhashPairs(degenerate, maxHamming = 6).count() shouldBe 780L
    Dedup.simhashPairs(degenerate, maxHamming = 6, maxBucketSize = Some(39))
      .count() shouldBe 0L
    Dedup.minhashLshPairs(degenerate, k = 12, bands = 4, minEst = 0.5,
      maxBucketSize = Some(39)).count() shouldBe 0L
  }

  test("default caps derive from the corpus at every LSH entry point") {
    import graft.functions.Buckets
    // a synthetic mega-clique: 1200 identical docs is ABOVE the derived
    // floor cap (capFor(1200, 16) = 1000) — with the DEFAULT (None) cap
    // the clique bucket must be dropped (and surfaced), while an
    // explicit generous cap keeps all 1200*1199/2 pairs. This pins the
    // round-9 wiring: production entry points size their own cap; the
    // fixed constant survives only behind explicit Some(...).
    val clique = (1L to 1200L).map(i => (i, "identical clique text"))
      .toDF("doc_id", "text")
    Dedup.minhashLshPairs(clique, k = 12, bands = 4, minEst = 0.5)
      .count() shouldBe 0L
    Dedup.simhashPairs(clique, maxHamming = 6).count() shouldBe 0L
    Dedup.minhashLshPairs(clique, k = 12, bands = 4, minEst = 0.5,
      maxBucketSize = Some(Buckets.DefaultMaxBucketSize))
      .count() shouldBe (1200L * 1199 / 2)
    // incremental path: accumulated (index + delta) population drives
    // the derived cap, so the same clique split 50/50 is capped too
    val isDelta = col("doc_id") > 600L
    val idx = Dedup.minhashSignatures(
      clique.filter(!isDelta), "doc_id", "text", 12, 3)
    Dedup.incrementalLshPairs(idx, clique.filter(isDelta),
      k = 12, bands = 4, minEst = 0.5).count() shouldBe 0L
  }

  test("no LSH query drops bucket rows at oracle scale (sf0.01 parity guard)") {
    // the Spark side caps hot buckets; most DuckDB oracles don't model
    // the cap (s02's now does). Parity therefore requires zero drops
    // at the verify scale — assert it via the cap's own observation
    // metrics, so bigger or more-skewed future testdata fails HERE
    // with a pointer to the cause instead of as a bare hash mismatch.
    // Zero drops also bounds occupancy at the 1000 floor, which is the
    // sub-banding refine threshold at this scale, so d04/m05's
    // unrefined oracles stay byte-identical too.
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("d03_minhash_lsh", "d04_simhash",
        "d06_cosine_neardup_lsh", "d08_incremental_lsh",
        "d11_cosine_lsh_sized", "m05_media_neardup", "s02_ann_lsh")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val drops = df.queryExecution.observedMetrics.values
        .flatMap(r => scala.util.Try(r.getAs[Long]("dropped_rows")).toOption)
        .sum
      withClue(s"$name: ") { drops shouldBe 0L }
    }
  }

  test("managed LSH entry points release every cached frame they create") {
    // the unmanaged forms persist() intermediates that outlive the
    // query — fine for one-shot jobs, a leak in a long-lived session.
    // Each ...Managed form must (a) actually cache (the shared
    // subtrees feed 2-3 consumers) and (b) return the session cache to
    // empty on release.
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    val emb = Tables.embeddings(spark, SfDir)
    val runs: Seq[(String, () => (org.apache.spark.sql.DataFrame, () => Unit))] =
      Seq(
        ("minhash", () => Dedup.minhashLshPairsManaged(corpus)),
        ("simhash", () => Dedup.simhashPairsManaged(corpus)),
        ("cosineLsh", () => Dedup.cosineNearDupPairsLshManaged(emb)),
        ("annLsh", () => graft.vector.Ann.lshTopKManaged(
          emb.filter(col("vec_id") % 25 === 0), emb, 3)),
        ("perceptual", () => graft.multimodal.Multimodal
          .perceptualNearDupPairsManaged(
            graft.multimodal.Multimodal.mediaFromDocuments(
              Tables.documents(spark, SfDir)))))
    for ((name, run) <- runs) withClue(s"$name: ") {
      val (df, release) = run()
      df.count() // materialize: the persists fill
      cm.isEmpty shouldBe false
      release()
      cm.isEmpty shouldBe true
      release() // idempotent
      cm.isEmpty shouldBe true
    }
  }

  test("capFor scales the bucket cap with expected occupancy") {
    import graft.functions.Buckets
    // 50k corpus, 11 planes -> expected bucket ~24, 16x slack under
    // the 1000 floor
    Buckets.capFor(50000L, 11) shouldBe 1000
    // 1B corpus, 11 planes -> expected ~524k, cap = 16x expected
    Buckets.capFor(1L << 30, 11) shouldBe (16L * ((1L << 30) / 2048)).toInt
    // tiny corpus never drops below the floor
    Buckets.capFor(100L, 5) shouldBe 1000
    an[IllegalArgumentException] should be thrownBy Buckets.capFor(10L, 0)
  }

  test("minhash estimate tracks true jaccard on the real corpus") {
    val docs = Tables.documents(spark, SfDir)
    val truth = Dedup.ngramJaccardPairs(docs, minJaccard = 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val est = Dedup.minhashLshPairs(docs, k = 12, bands = 4, minEst = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // every true near-dup pair must be recalled by LSH
    truth.subsetOf(est) shouldBe true
  }

  test("minhash calibration's abs_err is the true estimator error") {
    val out = SparkEntry.queries("d10_minhash_calibration")(spark, SfDir)
      .collect()
    out.length should be > 0
    out.foreach { r =>
      val (est, jac, err) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      est should (be >= 0.0 and be <= 1.0)
      jac should (be >= 0.0 and be <= 1.0)
      // err uses the unrounded jaccard; the jac column rounds at 4
      err shouldBe (math.abs(est - jac) +- 6e-5)
    }
  }

  test("cosine near-dup returns ordered pairs above threshold") {
    val pairs = Dedup.cosineNearDupPairs(Tables.embeddings(spark, SfDir),
      minCos = 0.4).collect()
    pairs.length should be > 0
    pairs.foreach { r =>
      r.getLong(0) should be < r.getLong(1)
      r.getDouble(2) should be >= 0.4
    }
  }

  test("substring spans find the shared region and nothing in unique docs") {
    // docs 1 and 2 are identical after normalization (43 chars): the
    // whole text is one maximal span in each. docs 3 and 4 share the
    // 31-char prefix "the quick brown fox jumps over " + diverge, and
    // share the trailing " today"-ish region only below the 20-gram
    // floor. docs 5 and 6 share nothing 20 chars long.
    val spans = Dedup.substringSpans(corpus, k = 20)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byDoc = spans.groupBy(_._1)
    byDoc(1L).toSeq shouldBe Seq((1L, 1, 43))
    byDoc(2L).toSeq shouldBe Seq((2L, 1, 43))
    // 3/4: spans must start at position 1 and cover the shared prefix
    // (ends inside the diverging tail are method-defined: every 20-gram
    // in [1, end] occurs in the sibling)
    byDoc(3L).head._2 shouldBe 1
    byDoc(4L).head._2 shouldBe 1
    byDoc(3L).head._3 should be >= 31
    byDoc.contains(5L) shouldBe false
    byDoc.contains(6L) shouldBe false
  }

  test("dedup keep: one canonical per cluster, uniques untouched, total adds up") {
    val docs = Tables.documents(spark, SfDir)
    val kept = SparkEntry.queries("d13_dedup_keep")(spark, SfDir).collect()
    val labels = graft.operators.ConnectedComponents.run(
      Dedup.ngramJaccardPairs(docs, maxDF = 50, minJaccard = 0.8))
    val clustered = labels.count()
    val nClusters = labels.select("label").distinct().count()
    // kept = (corpus - clustered docs) + one canonical per cluster
    kept.length.toLong shouldBe docs.count() - clustered + nClusters
    val canonical = kept.filter(_.getString(1) == "canonical").map(_.getLong(0))
    canonical.length.toLong shouldBe nClusters
    // every canonical keeper is its own cluster label (min member)
    val labelSet = labels.select("label").distinct()
      .collect().map(_.getLong(0)).toSet
    canonical.toSet shouldBe labelSet
  }

  test("leakage-safe split keeps every near-dup cluster in one split") {
    val out = SparkEntry.queries("t26_leakage_safe_split")(spark, SfDir)
      .persist()
    // no split_key straddles train and val — the whole point
    out.groupBy("split_key")
      .agg(count_distinct(col("split")).as("k"))
      .filter(col("k") > 1).count() shouldBe 0L
    // and the guard is live: at least one cluster groups multiple docs
    out.groupBy("split_key").count()
      .filter(col("count") > 1).count() should be > 0L
    out.unpersist()
  }

  test("substring spans: every span is at least gram-length long") {
    val out = Dedup.substringSpans(Tables.documents(spark, SfDir), k = 20)
      .collect()
    out.length should be > 0
    out.foreach { r =>
      r.getInt(3) should be >= 20 // span_len
      r.getInt(1) should be >= 1  // 1-indexed start
      r.getInt(2) shouldBe r.getInt(1) + r.getInt(3) - 1
    }
  }
}
