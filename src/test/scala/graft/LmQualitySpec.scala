package graft

import org.apache.spark.sql.functions._
import graft.functions.PolyHash64
import graft.text.LmQuality

/** Independent driver-side replay of the label-free LM scorer — same
  * features, same smoothing, same ordered products, plain Scala — so
  * the distributed path is checked against arithmetic that shares none
  * of its plan machinery (a Dim=64 bucket collision changes both sides
  * identically, the comparison stays exact). */
class LmQualitySpec extends SparkSpec {
  import spark.implicits._

  private val Dim = LmQuality.Dim

  private def featsOf(text: String): Seq[Int] = {
    val ws = text.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ", -1).toSeq
    val fs = ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    fs.map(f => (PolyHash64.hash(f) % Dim).toInt)
  }

  private def referenceScore(refTexts: Seq[String], text: String)
      : (Long, Long, String) = {
    val cnt = Array.fill(Dim)(0L)
    refTexts.foreach(t => featsOf(t).foreach(b => cnt(b) += 1))
    val tot = cnt.sum
    def prod(theta: Double): Double = {
      var p = 1.0
      featsOf(text).foreach { b =>
        p *= (cnt(b) + 1).toDouble / (tot + Dim).toDouble *
          Dim.toDouble / theta
      }
      p
    }
    val mass = featsOf(text).map(b => cnt(b) + 1).sum
    val bucket =
      if (prod(LmQuality.HeadGm) >= 1.0) "head"
      else if (prod(LmQuality.TailGm) >= 1.0) "middle"
      else "tail"
    (featsOf(text).size.toLong, mass, bucket)
  }

  // vocab chosen so reference-typical and off-distribution texts
  // separate; reference docs repeat a concentrated vocabulary, the
  // tail doc uses tokens the reference never hashes
  private val refTexts = Seq.fill(12)("the cat sat on the mat") ++
    Seq.fill(8)("the dog sat on the cat")
  private val corpus: Seq[(Long, String, String)] =
    refTexts.zipWithIndex.map { case (t, i) => (i.toLong, t, "ref") } ++
      Seq(
        (100L, "the cat sat on the mat", "pool"), // reference-typical
        (101L, "wolf jagd nacht frost berg tal see", "pool"), // off-dist
        (102L, "the dog sat quietly nearby today", "pool"))

  test("scored matches an independent driver-side replay of the " +
      "smoothed-LM ordered products") {
    val df = corpus.toDF("doc_id", "text", "source")
    val out = LmQuality.scored(df, col("source") === "ref")
      .select("doc_id", "text", "n_feat", "lm_mass", "lm_bucket")
      .collect()
    out.length shouldBe corpus.size // passthrough keeps every row
    out.foreach { r =>
      val (n, mass, bucket) =
        referenceScore(refTexts, r.getString(1))
      withClue(s"doc ${r.getLong(0)}: ") {
        r.getLong(2) shouldBe n
        r.getLong(3) shouldBe mass
        r.getString(4) shouldBe bucket
      }
    }
    // the fixture must actually exercise both extremes
    val byId = out.map(r => r.getLong(0) -> r.getString(4)).toMap
    byId(100L) shouldBe "head"
    byId(101L) shouldBe "tail"
  }

  test("NULL texts are dropped from both the fit and the output") {
    val df = (corpus :+ ((103L, null.asInstanceOf[String], "ref")))
      .toDF("doc_id", "text", "source")
    val out = LmQuality.scored(df, col("source") === "ref")
    out.count() shouldBe corpus.size
    out.filter(col("doc_id") === 103L).count() shouldBe 0
  }

  test("reserved output columns are guarded at construction") {
    val df = corpus.toDF("doc_id", "text", "lm_bucket")
    val e = intercept[IllegalArgumentException] {
      LmQuality.scored(df, col("lm_bucket") === "ref")
    }
    e.getMessage should include("lm_bucket")
  }

  test("t40 ensemble votes/tiers agree with the REGISTERED component " +
      "queries (t02 heuristic, t31 gate membership, t39 LM bucket)") {
    val dir = SfDir
    val ens = SparkEntry.queries("t40_quality_ensemble")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getString(3), r.getLong(4), r.getString(5))).toMap
    val q02 = SparkEntry.queries("t02_quality")(spark, dir).collect()
      .flatMap(r => if (r.isNullAt(1)) None
        else Some(r.getLong(0) -> r.getDouble(1))).toMap
    val gatePass = SparkEntry.queries("t31_classifier_gate")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val lm = SparkEntry.queries("t39_lm_quality")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    ens.keySet shouldBe lm.keySet // same non-NULL-text population
    val tiers = Map(3L -> "premium", 2L -> "standard", 1L -> "marginal",
      0L -> "reject")
    ens.foreach { case (id, (quality, _, bucket, votes, tier)) =>
      withClue(s"doc $id: ") {
        quality shouldBe q02(id)
        bucket shouldBe lm(id)
        val expect = (if (quality >= 0.5) 1L else 0L) +
          (if (gatePass(id)) 1L else 0L) +
          (if (bucket == "head") 1L else 0L)
        votes shouldBe expect
        tier shouldBe tiers(votes)
      }
    }
    // the fixture corpus must spread across at least three tiers for
    // the vote arithmetic to be exercised, not vacuously green
    ens.values.map(_._5).toSet.size should be >= 3
  }

  test("an empty reference corpus is rejected at construction (it would " +
      "silently fit a uniform LM that buckets everything 'tail')") {
    val df = corpus.toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      LmQuality.scored(df, col("source") === "no-such-source")
    }
    e.getMessage should include("reference")
  }

  test("a whitespace-only text scores through the empty-token path") {
    val df = (corpus :+ ((104L, "   ", "pool")))
      .toDF("doc_id", "text", "source")
    val out = LmQuality.scored(df, col("source") === "ref")
      .filter(col("doc_id") === 104L).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("n_feat") shouldBe 1L // one empty token
  }
}
