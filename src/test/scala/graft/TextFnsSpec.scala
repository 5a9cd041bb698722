package graft

import org.apache.spark.sql.functions._
import graft.text.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, s: String): T =
    Seq(s).toDF("text").select(c).collect()(0).get(0).asInstanceOf[T]

  test("normalize lowercases, collapses and trims whitespace") {
    one[String](TextFns.normalize($"text"), "  The   QUICK\tfox  ") shouldBe
      "the quick fox"
  }

  test("token counts: whitespace words vs BPE-ish subwords") {
    one[Long](TextFns.tokenCount($"text"), "ab 12 cd!") shouldBe 3L
    // 'ab', '12', 'cd', '!' -> 4 subword tokens
    one[Long](TextFns.bpeTokenCount($"text"), "ab 12 cd!") shouldBe 4L
  }

  test("quality score is in [0,1] and rewards stopword-bearing prose") {
    val prose = "the cat sat on the mat and looked to the door"
    val junk = "@@## $$%% ^^&&"
    val qp = one[java.lang.Double](TextFns.qualityScore($"text"), prose)
    val qj = one[java.lang.Double](TextFns.qualityScore($"text"), junk)
    qp.doubleValue should be > qj.doubleValue
    qp.doubleValue should (be >= 0.0 and be <= 1.0)
  }

  test("quality score on a whitespace-only document is defined, not " +
      "NULL — the t40/t41 vote must not diverge on the chars=0 edge") {
    // normalize("   ") = "" -> chars = 0: unguarded, Spark's 0/0
    // punct ratio was NULL while DuckDB's was NaN (ordered ABOVE all
    // values, so `quality >= 0.5` flipped cross-engine). The guard
    // pins the ratio to 0; the score is the real number both engines
    // now agree on: 1/50*0.5 + 0/1*0.3 + (1-0)*0.2 = 0.21 (the empty
    // split contributes one empty token).
    val q = one[java.lang.Double](TextFns.qualityScore($"text"), "   ")
    q should not be null
    q.doubleValue shouldBe 0.21 +- 1e-9
    // and the t40 vote built on it is a real 0, never NULL
    val vote = Seq("   ").toDF("text")
      .select((TextFns.qualityScore($"text") >= 0.5).cast("long").as("v"))
      .collect()(0).getLong(0)
    vote shouldBe 0L
  }

  test("profileId picks argmax profile, first wins ties") {
    val profiles = Seq("A" -> Seq("x"), "B" -> Seq("y"))
    one[String](TextFns.profileId($"text", profiles), "y y x") shouldBe "B"
    one[String](TextFns.profileId($"text", profiles), "x y") shouldBe "A" // tie
  }

  /** Reference iterative min-rank BPE encode (the huggingface/
    * subword-nmt algorithm): repeatedly merge ALL occurrences of the
    * lowest-ranked adjacent pair until none applies. The Column
    * implementation is a single ordered pass over the merge table;
    * BpeMerges is constructed so the two are equivalent — this test
    * pins that claim against real corpus text. */
  private def refBpeCount(text: String): Long = {
    val rank = TextFns.BpeMerges.zipWithIndex.toMap
    val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (norm.isEmpty) return 0L
    norm.split(" ").filter(_.nonEmpty).map { w =>
      var syms = w.map(_.toString).toVector
      var done = false
      while (!done) {
        val cands = syms.zip(syms.drop(1)).filter(rank.contains)
        if (cands.isEmpty) done = true
        else {
          val (a, b) = cands.minBy(rank)
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              buf += (a + b); i += 2
            } else { buf += syms(i); i += 1 }
          }
          syms = buf.result()
        }
      }
      syms.length.toLong
    }.sum
  }

  test("merge-table BPE count equals iterative min-rank BPE on the corpus") {
    // targeted shapes first: chained merges (t+h then th+e), digits,
    // punctuation, repeated pairs
    Seq("the thin threads", "aaa", "standing orders", "a1 b2!",
      "the the the", "x").foreach { s =>
      withClue(s"text='$s': ") {
        one[Long](TextFns.bpeMergeTokenCount($"text"), s) shouldBe
          refBpeCount(s)
      }
    }
    // then every document in the corpus
    val docs = graft.sources.Tables.documents(spark, SfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val got = graft.sources.Tables.documents(spark, SfDir)
      .select($"doc_id", TextFns.bpeMergeTokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      withClue(s"doc $id: ") { got(id) shouldBe refBpeCount(text) }
    }
  }

  test("rolling fingerprint matches the hand-computed chain") {
    // "ab c" -> codes a=97 b=98 ' '=32 c=99
    val expect = ((97L * 31 + 98) * 31 + 32) * 31 + 99
    one[Long](TextFns.fingerprintRolling($"text"), "ab c") shouldBe
      expect % 1000000007L
    // single char: hash is the char code itself
    one[Long](TextFns.fingerprintRolling($"text"), "a") shouldBe 97L
  }

  test("BPE learning merges the max pair, ties lexicographic, greedy scan") {
    // vocab: "aaab" x3. Round 1: <a><a> counts 2 per word (overlapping
    // adjacents) = 6 > <a><b> 3; greedy leftmost apply gives <aa><a><b>.
    // Round 2: <aa><a> and <a><b> tie at 3 -> lexicographically smaller
    // "<a><b>" wins. Round 3: only <aa><ab> remains.
    val docs = Seq("aaab aaab", "aaab").toDF("text")
    graft.text.BpeLearn.learnMerges(docs, rounds = 3) shouldBe Seq(
      (1, "<a><a>", 6L), (2, "<a><b>", 3L), (3, "<aa><ab>", 3L))
  }

  test("PPS systematic sampling keeps k rows, weighted, zero-weight never") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, sum}
    // 100 unit-weight rows + one zero-weight row; k=10 strides of 10
    val rows = (1 to 100).map(i => (i.toLong, 1L)) :+ (101L, 0L)
    val df = rows.toDF("id", "w")
      .select(col("id"), col("w"),
        sum("w").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cw"),
        sum("w").over(Window.partitionBy()).as("tw"))
    val kept = df.where(TextFns.ppsKeep(col("cw"), col("w"), col("tw"), 10))
      .select("id").as[Long].collect().sorted
    kept.length shouldBe 10 // exactly k for sub-stride weights
    kept should not contain 101L // zero weight cannot cross a boundary
    kept shouldBe (1 to 10).map(_ * 10L) // every 10th unit of weight
    // a row heavier than one stride is a certainty inclusion
    val heavy = Seq((1L, 5L), (2L, 90L), (3L, 5L)).toDF("id", "w")
      .select(col("id"), col("w"),
        sum("w").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cw"),
        sum("w").over(Window.partitionBy()).as("tw"))
    val keptHeavy = heavy
      .where(TextFns.ppsKeep(col("cw"), col("w"), col("tw"), 10))
      .select("id").as[Long].collect()
    keptHeavy should contain(2L)
  }

  test("quality classifier: checked-in weights are exact thousandths " +
    "and the SQL literal round-trips bit-identically") {
    import graft.text.QualityClassifier
    QualityClassifier.Weights.length shouldBe QualityClassifier.Dim
    QualityClassifier.WeightsMilli.zip(QualityClassifier.Weights)
      .foreach { case (m, d) => d shouldBe m / 1000.0 }
    // every embedded decimal literal parses back to the served double
    val lits = QualityClassifier.weightsSqlList
      .stripPrefix("[").stripSuffix("]").split(", ").map(_.toDouble)
    lits.toSeq shouldBe QualityClassifier.Weights.toSeq
  }

  test("quality classifier separates prose from boilerplate and gates on it") {
    import graft.text.QualityClassifier
    // a doc of curated prose markers must outscore a doc of curated
    // boilerplate markers — the +0.6/-0.3 curated mass dominates the
    // [-0.2, 0.2] hash noise on marker-dense documents
    val prose = QualityClassifier.ProseMarkers.mkString(" ")
    val junk = QualityClassifier.BoilerplateMarkers.mkString(" ")
    val scores = Seq((1L, prose), (2L, junk)).toDF("doc_id", "text")
      .select(col("doc_id"), QualityClassifier.score(col("text")).as("s"))
      .as[(Long, Double)].collect().toMap
    scores(1L) should be > scores(2L)
    val gated = QualityClassifier.gate(
      Seq((1L, prose), (2L, junk)).toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect()
    gated shouldBe Array(1L)
  }

  test("quality classifier scoring: codegen and interpreted agree") {
    import graft.text.QualityClassifier
    val docs = Seq("the data table is fast", "scan merge batch row part",
      "a of and to in", "one").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def run(): Seq[(Long, Double)] = docs
      .select(col("doc_id"), QualityClassifier.rawScore(col("text")).as("s"))
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val gen = try run() finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = try run() finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
    gen shouldBe interp
  }

  test("DSIR features: ordered unigrams then bigrams, single-token safe") {
    import graft.text.Dsir
    val out = Seq("The quick  Fox", "one", "").toDF("text")
      .select(Dsir.features(col("text")).as("fs"))
      .as[Seq[String]].collect().toSeq
    out(0) shouldBe Seq("the", "quick", "fox", "the quick", "quick fox")
    out(1) shouldBe Seq("one") // sequence(1,0) counts DOWN — guarded
    out(2) shouldBe Seq("")    // whitespace-only normalizes to one empty token
  }

  test("DSIR ratio table: Dim buckets, target-exclusive vocab ratios > 1 " +
      "> raw-exclusive, smoothing keeps every bucket finite and positive") {
    import graft.functions.PolyHash64
    import graft.text.Dsir
    // vocab chosen so the asserted buckets are collision-free at Dim=64:
    // alpha=8, gamma=11, "alpha alpha"=43 — no other feature shares them
    val docs = Seq(
      (1L, "alpha alpha alpha", "en"), (2L, "alpha alpha beta", "en"),
      (3L, "gamma gamma gamma", "de"), (4L, "gamma omega gamma", "de"))
      .toDF("doc_id", "text", "lang")
    val r = Dsir.ratioTable(docs, $"lang" === "en")
    r.length shouldBe Dsir.Dim
    all(r) should be > 0.0
    def bucket(f: String) = (PolyHash64.hash(f) % Dsir.Dim).toInt
    r(bucket("alpha")) should be > 1.0   // target-heavy feature
    r(bucket("gamma")) should be < 1.0   // raw-only feature
    r(bucket("alpha alpha")) should be > 1.0 // bigrams count too
  }

  test("DSIR importance weight is the hand-computed ordered ratio product; " +
      "codegen and interpreted agree") {
    import graft.functions.PolyHash64
    import graft.text.Dsir
    val ratios = IndexedSeq.tabulate(Dsir.Dim)(b => 0.5 + (b % 7) * 0.25)
    val docs = Seq((1L, "the data table is fast"),
      (2L, "scan merge batch row part scan"), (3L, "one"))
      .toDF("doc_id", "text")
    def run(): Seq[(Long, Double)] = docs
      .select($"doc_id", Dsir.importanceWeight($"text", ratios).as("w"))
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val gen = try run() finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = try run() finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
    gen shouldBe interp
    def expected(text: String): Double = {
      val toks = text.split(" ").toSeq
      val feats = toks ++ (if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
                           else Seq.empty)
      feats.foldLeft(1.0)((acc, f) =>
        acc * ratios((PolyHash64.hash(f) % Dsir.Dim).toInt))
    }
    gen.toMap shouldBe Map(1L -> expected("the data table is fast"),
      2L -> expected("scan merge batch row part scan"), 3L -> expected("one"))
  }

  test("DSIR resample: target-domain docs systematically upweighted, keep " +
      "set partition-invariant, rates derived not quantized to death") {
    import graft.text.Dsir
    // target vocab vs off-domain vocab, enough docs for the gate to bite
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta alpha gamma beta", "en")
      else (i.toLong, "delta omega delta sigma omega", "de")
    }.toDF("doc_id", "text", "lang")
    val kept = Dsir.resample(docs, $"lang" === "en", budget = 10.0)
    val rows = kept.select($"doc_id", $"lang", $"w", $"rate_ppm")
      .as[(Long, String, Double, Long)].collect().toSeq.sortBy(_._1)
    rows should not be empty
    val (en, de) = rows.partition(_._2 == "en")
    // every en doc shares one weight, every de doc another; en >> de
    if (en.nonEmpty && de.nonEmpty) en.head._3 should be > de.head._3
    // partition invariance: the keep decision hashes ids, not partitions
    val rows7 = Dsir.resample(docs.repartition(7), $"lang" === "en",
        budget = 10.0)
      .select($"doc_id", $"lang", $"w", $"rate_ppm")
      .as[(Long, String, Double, Long)].collect().toSeq.sortBy(_._1)
    rows7 shouldBe rows
    // rates are real ppm values, not collapsed to 0 or 10^6
    all(rows.map(_._4)) should be >= 0L
    all(rows.map(_._4)) should be <= 1000000L
    // a NULL-text row is dropped BEFORE the Σw normalizer: least(NULL,
    // cap) null-skips to the full cap in both engines, so an
    // unfiltered null would deflate every real doc's rate
    val withNull = docs.unionByName(
      Seq((999L, Option.empty[String], "de")).toDF("doc_id", "text", "lang"))
    val rowsN = Dsir.resample(withNull, $"lang" === "en", budget = 10.0)
      .select($"doc_id", $"lang", $"w", $"rate_ppm")
      .as[(Long, String, Double, Long)].collect().toSeq.sortBy(_._1)
    rowsN shouldBe rows
  }

  test("fixed-name appenders fail loudly on reserved input columns " +
      "instead of silently replacing them") {
    import graft.text.Dsir
    // Dsir.resample appends n_feat/w/rate_ppm to a PASSTHROUGH of the
    // input — each must be rejected at construction time
    Dsir.ReservedCols shouldBe Seq("n_feat", "w", "rate_ppm")
    Dsir.ReservedCols.foreach { c =>
      val docs = Seq((1L, "alpha beta", "en", 7L))
        .toDF("doc_id", "text", "lang", c)
      val e = intercept[IllegalArgumentException] {
        Dsir.resample(docs, $"lang" === "en")
      }
      e.getMessage should include(s"'$c'")
    }
    // TopicBalance: a stray n_tok on assign (or cid on tok) would only
    // surface as an ambiguous-reference error deep in the plan
    val assignBad = Seq((1L, 0L, 5L)).toDF("doc_id", "cid", "n_tok")
    val tok = Seq((1L, 5L)).toDF("doc_id", "n_tok")
    intercept[IllegalArgumentException] {
      graft.vector.TopicBalance.plan(assignBad, tok)
    }.getMessage should include("n_tok")
    val assign = Seq((1L, 0L)).toDF("doc_id", "cid")
    val tokBad = Seq((1L, 5L, 0L)).toDF("doc_id", "n_tok", "cid")
    intercept[IllegalArgumentException] {
      graft.vector.TopicBalance.plan(assign, tokBad)
    }.getMessage should include("cid")
  }

  test("shardManifest helpers produce exact rows on a fixed input — " +
      "the t28 <-> CurationPipeline shared tail pinned at the helper " +
      "level, not by the cross-arc containment inequality") {
    import graft.queries.TextQueries
    // n_tok = 500·id so every full shard's running sum crosses the
    // 2048-token pack boundary at least once (packs > 1 exercised)
    val input = (1L to 10L).map(i => (i, 500L * i))
    val df = input.toDF("doc_id", "n_tok")
    val shardSize = 4
    // independent reimplementation of the contract, driver-side: rank
    // by (md5(doc_id), doc_id), 4-doc shards, 2048-token packs
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expAssign = input.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .zipWithIndex.map { case ((id, tok), idx) =>
        (id, tok, idx + 1L, idx.toLong / shardSize) }
    val gotAssign = TextQueries.shardAssignments(df, shardSize)
      .select("doc_id", "n_tok", "pos", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._3).toSeq
    gotAssign shouldBe expAssign
    val expManifest = expAssign.groupBy(_._4).toSeq.sortBy(_._1)
      .map { case (sh, rs) =>
        val toks = rs.sortBy(_._3).map(_._2)
        val cumBefore = toks.scanLeft(0L)(_ + _).dropRight(1)
        (sh, rs.size.toLong, toks.sum, cumBefore.map(_ / 2048L).max + 1L,
          rs.map(_._3).min, rs.map(_._3).max)
      }
    // the fixed input must actually exercise a multi-pack shard
    expManifest.map(_._4).max should be > 1L
    val gotManifest = TextQueries.manifestOf(
        TextQueries.shardAssignments(df, shardSize)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    gotManifest shouldBe expManifest
  }

  test("derivedShardSize keeps the shard count in O(1..10^5): pinned " +
      "64 at testdata scale, capped count at web scale") {
    import graft.queries.TextQueries.derivedShardSize
    // testdata scales: small train sets keep t28-sized shards
    derivedShardSize(10L) shouldBe 64
    derivedShardSize(64L) shouldBe 64
    derivedShardSize(168L) shouldBe 84 // 2 shards of 84
    // the 64-docs-per-shard regime holds until the count cap binds
    derivedShardSize(6400000L) shouldBe 64 // exactly 10^5 shards
    // web scale: the count cap drives the size up instead of the
    // shard count exploding (the filesystem-metadata bug)
    derivedShardSize(1000000000L) shouldBe 10000 // 10^9 docs
    derivedShardSize(100000000000L) shouldBe 1000000 // 10^11 docs
    // invariant sweep: size >= 64 and ceil(n/size) <= 10^5 everywhere
    for (n <- Seq(1L, 63L, 65L, 1000L, 123457L, 999999937L)) {
      val s = derivedShardSize(n)
      s should be >= 64
      (n + s - 1) / s should be <= 100000L
    }
  }

  test("t41 managed tier mixing caches the tier frame and releases it " +
      "deterministically (the DedupSpec managed-entry-point contract)") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    val (df, release) = graft.queries.TextQueries.tierMixManaged(
      spark, SfDir)
    df.count() should be > 0L // materialize: the tier persist fills
    cm.isEmpty shouldBe false
    release()
    cm.isEmpty shouldBe true
    release() // idempotent
    cm.isEmpty shouldBe true
  }
}
