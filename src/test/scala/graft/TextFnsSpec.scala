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

  test("profileId picks argmax profile, first wins ties") {
    val profiles = Seq("A" -> Seq("x"), "B" -> Seq("y"))
    one[String](TextFns.profileId($"text", profiles), "y y x") shouldBe "B"
    one[String](TextFns.profileId($"text", profiles), "x y") shouldBe "A" // tie
  }

  test("rolling fingerprint matches the hand-computed chain") {
    // "ab c" -> codes a=97 b=98 ' '=32 c=99
    val expect = ((97L * 31 + 98) * 31 + 32) * 31 + 99
    one[Long](TextFns.fingerprintRolling($"text"), "ab c") shouldBe
      expect % 1000000007L
    // single char: hash is the char code itself
    one[Long](TextFns.fingerprintRolling($"text"), "a") shouldBe 97L
  }
}
