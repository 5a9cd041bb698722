package graft

import org.apache.spark.sql.functions._
import graft.functions.PolyHash64
import graft.text.ClassifierTrain

/** Independent driver-side replay of the full fit — same features,
  * same perceptron, plain Scala collections — so the distributed
  * path is checked against arithmetic that shares none of its plan
  * machinery (collision-proof: a Dim=64 bucket collision changes
  * both sides identically, the COMPARISON stays exact). Shared with
  * PropertySpec's randomized-corpus property. */
private[graft] object PerceptronReference {
  private val Dim = ClassifierTrain.Dim

  def featsOf(text: String): Map[Int, Long] = {
    val ws = text.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ", -1).toSeq
    val fs = ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    fs.groupBy(f => (PolyHash64.hash(f) % Dim).toInt)
      .map { case (b, g) => b -> g.size.toLong }
  }

  def scoreOf(w: IndexedSeq[Long], x: Map[Int, Long]): Long =
    x.map { case (b, c) => w(b) * c }.sum

  def fit(docs: Seq[(Long, String, String)], iters: Int)
      : (IndexedSeq[Long], Long, Long) = {
    val feats = docs.map { case (_, text, lang) =>
      (if (lang == "en") 1L else -1L, featsOf(text))
    }
    var w = IndexedSeq.fill(Dim)(0L)
    for (_ <- 1 to iters) {
      val g = Array.fill(Dim)(0L)
      feats.foreach { case (y, x) =>
        if (y * scoreOf(w, x) <= 0L)
          x.foreach { case (b, c) => g(b) += y * c }
      }
      w = IndexedSeq.tabulate(Dim)(b => w(b) + g(b))
    }
    val correct = feats.count { case (y, x) => y * scoreOf(w, x) > 0L }
    (w, correct.toLong, feats.size.toLong)
  }
}

class ClassifierTrainSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = ClassifierTrain.Dim

  private def featsOf(text: String) = PerceptronReference.featsOf(text)
  private def scoreOf(w: IndexedSeq[Long], x: Map[Int, Long]) =
    PerceptronReference.scoreOf(w, x)
  private def referenceFit(docs: Seq[(Long, String, String)], iters: Int) =
    PerceptronReference.fit(docs, iters)

  private val corpus: Seq[(Long, String, String)] = (0 until 30).map { i =>
    i % 3 match {
      case 0 => (i.toLong, "the cat sat on the mat and the dog", "en")
      case 1 => (i.toLong, "der hund lief durch den wald heute", "de")
      case _ => (i.toLong, "le chat dort sur le tapis rouge", "fr")
    }
  }

  private def trainRows(df: org.apache.spark.sql.DataFrame)
      : (IndexedSeq[Long], Long, Long) = {
    val rows = df.collect()
    rows.length shouldBe Dim
    val w = IndexedSeq.tabulate(Dim) { b =>
      val r = rows.find(_.getLong(0) == b.toLong).get
      r.getLong(1)
    }
    (w, rows.head.getLong(2), rows.head.getLong(3))
  }

  test("distributed fit matches an independent driver-side perceptron " +
      "replay exactly — weights, accuracy, totals") {
    val docs = corpus.toDF("doc_id", "text", "lang")
    val got = trainRows(ClassifierTrain.train(docs, $"lang" === "en"))
    got shouldBe referenceFit(corpus, ClassifierTrain.Iters)
  }

  test("disjoint-vocab corpus separates: one full-batch iteration " +
      "already classifies every doc correctly") {
    // the two vocabularies must land in DISJOINT buckets for the
    // separability claim (the round-12 trap: 'alpha alpha' vs 'gamma
    // delta' collided at Dim=64) — checked here, not assumed
    val enFeats = Seq("cat", "sat", "mat", "cat sat", "sat mat")
    val deFeats = Seq("wolf", "jagd", "nacht", "wolf jagd", "jagd nacht")
    val b = (fs: Seq[String]) => fs.map(f => PolyHash64.hash(f) % Dim).toSet
    b(enFeats).intersect(b(deFeats)) shouldBe empty
    val docs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "cat sat mat", "en")
      else (i.toLong, "wolf jagd nacht", "de")
    }
    val (_, nCorrect, nTotal) = trainRows(ClassifierTrain.train(
      docs.toDF("doc_id", "text", "lang"), $"lang" === "en", iters = 1))
    nTotal shouldBe 20L
    nCorrect shouldBe 20L
  }

  test("NULL-text rows are dropped from the pool; result is " +
      "partition-invariant (pure integer arithmetic)") {
    val docs = corpus.toDF("doc_id", "text", "lang")
    val base = trainRows(ClassifierTrain.train(docs, $"lang" === "en"))
    val withNull = docs.unionByName(Seq((999L, Option.empty[String], "en"))
      .toDF("doc_id", "text", "lang"))
    trainRows(ClassifierTrain.train(withNull, $"lang" === "en")) shouldBe base
    trainRows(ClassifierTrain.train(docs.repartition(7),
      $"lang" === "en")) shouldBe base
  }

  /** Driver-side replica of TextFns.splitAssign: the 31-fold of the
    * md5 hex of the id, mod 100, < 80 → train. */
  private def splitOf(id: Long): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    var acc = hex.head.toLong
    hex.tail.foreach { c => acc = (acc * 31 + c.toLong) % 1000000007L }
    if (acc % 100 < 80) "train" else "val"
  }

  test("t37 trained gate: fits on the train split ONLY and scores the " +
      "val split exactly as a driver-side replay using train docs alone") {
    val docs = (0 until 60).map { i =>
      i % 3 match {
        case 0 => (i.toLong, "the cat sat on the mat and the dog", "en")
        case 1 => (i.toLong, "der hund lief durch den wald heute", "de")
        case _ => (i.toLong, "a big dog ran to the red door", "en")
      }
    }
    val (train, value) = docs.partition(d => splitOf(d._1) == "train")
    train should not be empty
    value should not be empty
    // the reference sees ONLY train docs — equality of every val
    // margin therefore also pins leakage safety of the fit
    val (w, _, _) = referenceFit(train, ClassifierTrain.Iters)
    val expected = value.sortBy(_._1).map { case (id, text, lang) =>
      val m = scoreOf(w, featsOf(text))
      (id, lang, m, if (m > 0) 1L else 0L)
    }
    val got = ClassifierTrain.trainedGate(
        docs.toDF("doc_id", "text", "lang"), $"lang" === "en")
      .select($"doc_id", $"lang", $"margin", $"pred")
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    got shouldBe expected
    // and the fixed-name passthrough contract fails loudly
    ClassifierTrain.GateReservedCols.foreach { c =>
      val bad = Seq((1L, "alpha beta", "en", 7L))
        .toDF("doc_id", "text", "lang", c)
      intercept[IllegalArgumentException] {
        ClassifierTrain.trainedGate(bad, $"lang" === "en")
      }.getMessage should include(s"'$c'")
    }
  }

  test("t38 learning curve: every iteration's train/val accuracy equals " +
      "independent per-k driver fits (history = prefix property)") {
    val docs = (0 until 80).map { i =>
      i % 4 match {
        case 0 => (i.toLong, "the cat sat on the mat and the dog", "en")
        case 1 => (i.toLong, "der hund lief durch den wald heute", "de")
        case 2 => (i.toLong, "a big dog ran to the red door", "en")
        case _ => (i.toLong, "le chat dort sur le tapis rouge", "fr")
      }
    }
    val (train, heldOut) = docs.partition(d => splitOf(d._1) == "train")
    heldOut should not be empty
    // the curve's row (k, split) must equal a FULL separate fit at k
    // iterations — the deterministic perceptron makes the k-iteration
    // fit a prefix of the (k+1)-iteration fit, so one history serves
    val expected = (1 to ClassifierTrain.Iters).flatMap { k =>
      val (w, tCorrect, tTotal) = referenceFit(train, k)
      val vPairs = heldOut.map { case (_, text, lang) =>
        ((if (lang == "en") 1L else -1L), scoreOf(w, featsOf(text)))
      }
      Seq((k.toLong, "train", tCorrect, tTotal),
        (k.toLong, "val", vPairs.count { case (y, s) => y * s > 0L }.toLong,
          heldOut.size.toLong))
    }
    val got = ClassifierTrain.learningCurve(
        docs.toDF("doc_id", "text", "lang"), $"lang" === "en")
      .as[(Long, String, Long, Long)].collect().toSeq
    got shouldBe expected.sortBy(r => (r._1, r._2))
  }

  test("t37 serving plan: the val-split gate is scan -> filter -> " +
      "project — no join, no window (weights ride as a reference object)") {
    val df = SparkEntry.queries("t37_trained_gate")(spark, SfDir)
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Window"
  }

  test("gradient pass plans as scan -> filter -> explode -> hash agg: " +
      "zero windows, zero joins, zero sorts") {
    val p = ClassifierTrain.pool(corpus.toDF("doc_id", "text", "lang"),
      $"lang" === "en")
    val w = IndexedSeq.tabulate(Dim)(b => (b % 5).toLong - 2L)
    val plan = ClassifierTrain.gradientFrame(p, w)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "Join"
    plan should not include "Sort"
    plan should include("HashAggregate")
    plan should include("Generate explode")
  }
}
