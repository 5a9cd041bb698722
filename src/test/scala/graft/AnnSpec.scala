package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.vector.{Ann, VectorFns}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, SfDir).cache()

  test("cosine of a vector with itself is 1, with its negation -1") {
    val r = Seq((Array(1.0f, 2.0f, 3.0f), Array(-1.0f, -2.0f, -3.0f)))
      .toDF("a", "b")
      .select(VectorFns.cosine($"a", $"a").as("self"),
        VectorFns.cosine($"a", $"b").as("anti")).head
    r.getDouble(0) shouldBe 1.0 +- 1e-12
    r.getDouble(1) shouldBe -1.0 +- 1e-12
  }

  test("brute-force top-k is k rows per query, ranked by cosine desc") {
    val qs = emb.filter($"vec_id" < 3)
    val top = Ann.bruteForceTopK(qs, emb, k = 5).collect()
    top.length shouldBe 15
    top.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getInt(1))
      byRank.map(_.getDouble(3)) shouldBe
        byRank.map(_.getDouble(3)).sorted.reverse
    }
  }

  test("LSH buckets are deterministic, one per table, in-range") {
    val b1 = Ann.withLshBuckets(emb).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toSeq.sorted
    val b2 = Ann.withLshBuckets(emb).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toSeq.sorted
    b1 shouldBe b2
    val n = emb.count()
    b1.size shouldBe n * 8 // 8 tables -> 8 bucket rows per vector
    b1.foreach { case (_, b) => b should (be >= 0L and be < 64L) }
  }

  test("hoisted literal planes bucket identically to the per-row formula") {
    // the interpreted per-row form the literal hoist replaced, kept here
    // as the reference semantics: buckets must be bit-identical
    import org.apache.spark.sql.Column
    def planeComponent(p: Column, i: Column): Column =
      ((p * lit(7919) + i * lit(104729) + lit(12345)) % lit(2001) - lit(1000))
        .cast("double") / lit(1000.0)
    def dotPlane(v: Column, p: Column, dim: Int): Column =
      aggregate(
        zip_with(v, transform(sequence(lit(0), lit(dim - 1)),
          i => planeComponent(p, i)), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
    def oldBuckets(v: Column, dim: Int, m: Int, l: Int): Column =
      transform(sequence(lit(0), lit(l - 1)), t =>
        t.cast("long") * (1L << m) +
          aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
            (acc, j) => acc + when(dotPlane(v, t * lit(m) + j, dim) > 0,
              pow(lit(2.0), j).cast("long")).otherwise(lit(0L))))
    val mismatches = emb.select(
        Ann.lshBuckets($"embedding", 64, 3, 8).as("nb"),
        oldBuckets($"embedding", 64, 3, 8).as("ob"))
      .filter(!($"nb" <=> $"ob"))
    mismatches.count() shouldBe 0
  }

  test("planesFor sizes the per-table bucket count to the corpus") {
    Ann.planesFor(2000) shouldBe 3 // bench scale == the oracled default
    Ann.planesFor(20000) shouldBe 7 // the 10x probe corpus
    Ann.planesFor(0) shouldBe 3 // degenerate corpora keep the floor
    Ann.planesFor(1000000000L) shouldBe 22 // 1B vectors -> 4M buckets/table
  }

  test("IVF assignment covers the corpus; probing beats single-list recall") {
    val assign = Ann.ivfAssign(emb)
    assign.count() shouldBe emb.count() // every vector lands in one list
    assign.select("cid").distinct().count() should be > 4L
    val qs = emb.filter($"vec_id" % 10 === 0)
    val truth = Ann.bruteForceTopK(qs, emb, k = 1)
      .select("q", "b").as[(Long, Long)].collect().toMap
    val probe2 = Ann.ivfTopK(qs, emb, k = 1, nProbe = 2)
      .select("q", "b").as[(Long, Long)].collect().toMap
    val probe4 = Ann.ivfTopK(qs, emb, k = 1, nProbe = 4)
      .select("q", "b").as[(Long, Long)].collect().toMap
    def recall(m: Map[Long, Long]) =
      truth.count { case (q, b) => m.get(q).contains(b) }.toDouble / truth.size
    recall(probe4) should be >= recall(probe2) // more probes, never worse
    recall(probe2) should be > 0.2
  }

  test("ivfTopKSweep is bit-identical to per-point ivfTopK at every np") {
    val qs = emb.filter($"vec_id" % 10 === 0)
    val sweep = Ann.ivfTopKSweep(qs, emb, k = 3, nProbes = Seq(1, 4))
      .select("np", "q", "rank", "b", "cos")
      .as[(Long, Long, Int, Long, Double)].collect().toSet
    Seq(1, 4).foreach { np =>
      val single = Ann.ivfTopK(qs, emb, k = 3, nProbe = np)
        .select("q", "rank", "b", "cos")
        .as[(Long, Int, Long, Double)].collect()
        .map { case (q, r, b, c) => (np.toLong, q, r, b, c) }.toSet
      sweep.filter(_._1 == np) shouldBe single
    }
  }

  test("Lloyd-refined centroids improve probe recall over the first-16 seed") {
    val qs = emb.filter($"vec_id" % 10 === 0)
    val truth = Ann.bruteForceTopK(qs, emb, k = 1)
      .select("q", "b").as[(Long, Long)].collect().toMap
    def recallAt(iters: Int): Double = {
      val m = Ann.ivfTopK(qs, emb, k = 1, nProbe = 2, iters = iters)
        .select("q", "b").as[(Long, Long)].collect().toMap
      truth.count { case (q, b) => m.get(q).contains(b) }.toDouble / truth.size
    }
    val seed = recallAt(0)    // iters=0 == the round-2 first-16 baseline
    val refined = recallAt(Ann.IvfKmeansIters)
    withClue(s"seed=$seed refined=$refined: ") {
      refined should be >= seed
    }
    refined should be > 0.2
    // refinement is deterministic: two builds agree exactly
    val c1 = Ann.ivfCentroids(emb).as[(Long, Seq[Double])].collect().toSeq
    val c2 = Ann.ivfCentroids(emb).as[(Long, Seq[Double])].collect().toSeq
    c1 shouldBe c2
  }

  test("multi-table LSH top-1 recalls most true nearest neighbors") {
    val qs = emb.filter($"vec_id" % 10 === 0)
    val truth = Ann.bruteForceTopK(qs, emb, k = 1)
      .select("q", "b").as[(Long, Long)].collect().toMap
    val approx = Ann.lshTopK(qs, emb, k = 1)
      .select("q", "b").as[(Long, Long)].collect().toMap
    val hits = truth.count { case (q, b) => approx.get(q).contains(b) }
    // 8 tables x 3 planes: P[candidate] = 1-(1-p^3)^8, ~0.9 at cos 0.4
    hits.toDouble / truth.size should be > 0.5
  }

  test("lshTopK defaults resolve to corpus-sized planes and cap") {
    import graft.functions.Buckets
    // the sizing math the defaults wire in: planes grow with the
    // corpus (2^p buckets per table targeting ~targetBucketSize
    // occupancy), the cap tracks the same geometry
    Ann.planesFor(500L, 25) shouldBe 5
    Ann.planesFor(50000L, 25) shouldBe 11
    Ann.planesFor(100L) shouldBe 3 // floor at tiny corpora
    Buckets.capFor(600L, 5) shouldBe 1000 // slack*expected under floor
    // behavioral wiring: on a corpus where sizing ENGAGES (600 vectors
    // at target 25 -> 5 planes, not the fixed 3), the default-arg call
    // must be bit-identical to the explicitly planesFor/capFor-sized
    // call — the production entry point derives, callers don't have to
    val c = (0L until 600L).map { id =>
      (id, Array.tabulate(64)(k => (((id * 31 + k * 7) % 97) / 97.0f) - 0.5f))
    }.toDF("vec_id", "embedding")
    val qs = c.filter($"vec_id" % 50 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long, Double)].collect().toSet
    val p = Ann.planesFor(600L, 25)
    rows(Ann.lshTopK(qs, c, k = 3, targetBucketSize = 25)) shouldBe
      rows(Ann.lshTopK(qs, c, k = 3, planesPerTable = Some(p),
        maxBucketSize = Some(Buckets.capFor(600L, p))))
  }

  test("incremental IVF upsert equals a from-scratch reassign") {
    val base = emb.filter($"vec_id" % 10 =!= 0)
    val delta = emb.filter($"vec_id" % 10 === 0)
    val cents = Ann.ivfCentroids(base)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "cid").as[(Long, Long)].collect().toSet
    val incremental =
      pairs(Ann.ivfAssignTo(base, cents)) ++ pairs(Ann.ivfAssignTo(delta, cents))
    val fromScratch = pairs(Ann.ivfAssignTo(emb, cents))
    incremental shouldBe fromScratch
    incremental.size shouldBe emb.count()
  }

  test("PQ codes cover the corpus and encode incrementally") {
    val n = emb.count()
    val books = Ann.pqCodebooks(emb)
    books.select("m").distinct().count() shouldBe 4
    // every vector gets exactly one code per subspace
    val codes = Ann.pqEncode(emb, books)
    codes.count() shouldBe n * 4
    codes.groupBy("id").count().filter($"count" =!= 4).count() shouldBe 0
    // encoding is per-vector independent: base+delta == from-scratch
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long)].collect().toSet
    val base = emb.filter($"vec_id" % 10 =!= 0)
    val delta = emb.filter($"vec_id" % 10 === 0)
    tuples(Ann.pqEncode(base, books)) ++ tuples(Ann.pqEncode(delta, books)) shouldBe
      tuples(codes)
  }

  test("IVF-PQ finds same-cluster neighbors on clustered data") {
    // PQ preserves CLUSTER structure, not iid noise: on the near-
    // uniform synthetic corpus quantization noise legitimately
    // reorders neighbors (the oracled s08 pins exactness there), so
    // the recall property is asserted on deterministic clustered data
    // — 16 well-separated centers, 10 members each with tiny jitter.
    // member-major ids (id % 16 = cluster) so the deterministic
    // first-N seeds of both k-means spread across clusters
    val dim = 64
    val rows = for (c <- 0 until 16; mIdx <- 0 until 10) yield {
      val id = (mIdx * 16 + c).toLong
      val v = Array.tabulate(dim) { k =>
        // orthogonal block-one-hot centers: cluster c owns dims 4c..4c+3
        val center = if (k / 4 == c) 4.0f else 0.0f
        val jitter = (((id * 7 + k * 3) % 5) - 2) * 0.01f
        center + jitter
      }
      (id, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 16) // one member per cluster
    val top1 = Ann.ivfPqTopK(qs, df, k = 1, nCentroids = 8, nProbe = 2,
        pqK = 8)
      .select("q", "b").as[(Long, Long)].collect()
    // the quantized nearest neighbor should be a same-cluster member
    val ok = top1.count { case (q, b) => b % 16 == q % 16 }
    ok.toDouble / top1.length should be >= 0.9
  }

  test("hybrid RRF emits 5 fused ranks per query, scores descending") {
    val out = SparkEntry.queries("s10_hybrid_rrf")(spark, SfDir).collect()
    out.length should be > 0
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      rows.map(_.getInt(1)).sorted shouldBe (1 to 5)
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      scores.zip(scores.tail).foreach { case (hi, lo) => hi should be >= lo }
      // each leg contributes at most 1/61 per candidate
      scores.head should be <= (2.0 / 61 + 1e-9)
      scores.last should be > 0.0
    }
  }

  test("filtered top-k restricts to the key and never beats the unfiltered top") {
    val queries = emb.filter($"vec_id" % 25 === 0)
    val filtered = Ann.filteredTopK(queries, emb, k = 3, keyCols = Seq("label"))
      .collect()
    filtered.length should be > 0
    // every neighbor carries the query's label by construction (the
    // label column survives the join only when both sides agree)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    filtered.foreach { r =>
      labelOf(r.getLong(0)) shouldBe r.getInt(3)
      labelOf(r.getLong(2)) shouldBe r.getInt(3)
      r.getLong(0) should not be r.getLong(2)
    }
    // subset property: the best same-label cosine cannot exceed the
    // best unrestricted cosine for the same query
    val unfLead = Ann.bruteForceTopK(queries, emb, k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    filtered.filter(_.getInt(1) == 1).foreach { r =>
      r.getDouble(4) should be <= (unfLead(r.getLong(0)) + 1e-9)
    }
  }

  test("filtered top-k plans as a bounded-heap aggregate, never a window") {
    val df = Ann.filteredTopK(emb.filter($"vec_id" % 25 === 0), emb,
      k = 3, keyCols = Seq("label"))
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include ("topk")
    // partial/final split: the heap combines map-side, so the shuffle
    // carries bounded partial heaps, not raw candidates
    plan should include ("partial_topk")
    // and the heap path must agree with the window path it replaced
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val q = emb.filter($"vec_id" % 25 === 0)
      val norm = (d: org.apache.spark.sql.DataFrame, id: String, v: String) =>
        d.select(col("vec_id").as(id), col("label"), col("embedding").as("e"))
          .withColumn("nrm", VectorFns.norm(col("e")))
          .select(col(id), col("label"),
            VectorFns.normalized(col("e"), col("nrm")).as(v))
      val w = Window.partitionBy("q").orderBy(col("cos").desc, col("b"))
      norm(q, "q", "qv").join(norm(emb, "b", "bv"), Seq("label"))
        .filter(col("q") =!= col("b"))
        .withColumn("cos", VectorFns.dot(col("qv"), col("bv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q"), col("rank").cast("int").as("rank"), col("b"),
          col("label"), round(col("cos"), 6).as("cos"))
    }
    df.collect().sortBy(r => (r.getLong(0), r.getInt(1))) shouldBe
      viaWindow.collect().sortBy(r => (r.getLong(0), r.getInt(1)))
  }

  test("every ANN search path plans heap ranking, zero Window operators") {
    val queries = emb.filter($"vec_id" % 25 === 0)
    val paths = Seq(
      "lsh" -> Ann.lshTopK(queries, emb, k = 3),
      "ivf" -> Ann.ivfTopK(queries, emb, k = 3),
      "ivfpq" -> Ann.ivfPqTopK(queries, emb, k = 3))
    for ((name, df) <- paths) {
      val plan = df.queryExecution.executedPlan.toString
      withClue(s"$name: ") {
        // probe selection AND final ranking are both bounded heaps —
        // no per-query SORTED ranking window anywhere in the plan
        // (lsh keeps Buckets.cap's sortless count-over-bucket window,
        // which ships no per-query candidate sets)
        plan should not include "row_number"
        plan should include ("partial_topk")
      }
      df.count() should be > 0L
    }
  }
  test("centroidOutliers equals an independent driver-side recomputation; " +
      "partition-invariant") {
    // recompute the whole rule from the public centroid + assignment
    // APIs with driver-side decimal sums (valueOf = Spark's double →
    // DECIMAL(30,15) cast semantics) — an independent check of the
    // cohesion/stats/threshold arithmetic, not a replay of the plan
    import java.math.{BigDecimal => JBD, RoundingMode}
    val cents = Ann.ivfCentroids(emb).as[(Long, Seq[Double])].collect().toMap
    val assign = Ann.ivfAssign(emb).select("id", "vn", "cid")
      .as[(Long, Seq[Double], Long)].collect().toSeq
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def dec(x: Double) = JBD.valueOf(x).setScale(15, RoundingMode.HALF_UP)
    val coh = assign.map { case (id, vn, cid) => (id, cid, dot(vn, cents(cid))) }
    val expected = coh.groupBy(_._2).flatMap { case (_, rows) =>
      val n = rows.length.toDouble
      val sc = rows.map(r => dec(r._3)).reduce(_.add(_)).doubleValue
      val sq = rows.map(r => dec(r._3 * r._3)).reduce(_.add(_)).doubleValue
      val mean = sc / n
      val sd = math.sqrt(math.max(sq / n - mean * mean, 0.0))
      rows.filter(_._3 < mean - 1.5 * sd).map(_._1)
    }.toSeq.sorted
    expected should not be empty // the 1.5-sd rule bites on this corpus
    val actual = Ann.centroidOutliers(emb)
      .select("vec_id").as[Long].collect().toSeq.sorted
    actual shouldBe expected
    // every flagged row sits strictly below its cluster's mean cohesion
    Ann.centroidOutliers(emb).filter($"cos" >= $"mean_cos")
      .count() shouldBe 0L
    // the flagged set depends on ids and exact sums, never partitioning
    val actual7 = Ann.centroidOutliers(emb.repartition(7))
      .select("vec_id").as[Long].collect().toSeq.sorted
    actual7 shouldBe actual
  }

  test("outlier sweep: factors ordered, flag counts non-increasing, " +
      "swept point equals the single-factor rule") {
    val sw = Ann.centroidOutlierSweep(emb, Seq(1.0, 1.5, 2.0))
      .orderBy("factor").as[(Double, Long, Long)].collect().toSeq
    sw.map(_._1) shouldBe Seq(1.0, 1.5, 2.0)
    // a stricter threshold can only flag fewer vectors and clusters
    sw.sliding(2).foreach { case Seq(a, b) =>
      a._2 should be >= b._2
      a._3 should be >= b._3
    }
    // the 1.5 operating point is exactly s16's flagged set size
    sw.find(_._1 == 1.5).get._2 shouldBe Ann.centroidOutliers(emb).count()
  }

}
