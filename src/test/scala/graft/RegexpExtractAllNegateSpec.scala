package graft

import org.apache.spark.sql.functions._
import graft.functions.RegexpExtractAllNegate

class RegexpExtractAllNegateSpec extends SparkSpec {
  import spark.implicits._

  private def run(input: Seq[String], regex: String, idx: Int,
      codegen: Boolean): Seq[String] = {
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try {
      input.toDF("s")
        .select(RegexpExtractAllNegate($"s", lit(regex), lit(idx)).as("r"))
        .as[String].collect().toSeq
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  val geoRe = "[0-9.]+[NSEW]"

  test("single match: strips hemisphere letter, negates W/S") {
    val in = Seq("75.3W", "75.3E", "12.5S", "12.5N")
    run(in, geoRe, 0, codegen = true) shouldBe
      Seq("-75.3", "75.3", "-12.5", "12.5")
  }

  test("multi match: joins with comma, then last-char rule on the joined string") {
    // reference semantics: the strip/negate applies to the JOINED string
    val in = Seq("12.5N 75.3W", "12.5N 75.3E")
    run(in, geoRe, 0, codegen = true) shouldBe
      Seq("-12.5N,75.3", "12.5N,75.3")
  }

  test("no match yields empty string; null subject yields null") {
    run(Seq("nothing here"), geoRe, 0, codegen = true) shouldBe Seq("")
    val r = Seq[String](null).toDF("s")
      .select(RegexpExtractAllNegate($"s", lit(geoRe), lit(0)))
      .collect()(0)
    r.isNullAt(0) shouldBe true
  }

  test("group index extracts the capture group") {
    run(Seq("lat=42.0N lon=8.1W"), "l\\w+=([0-9.]+[NSEW])", 1,
      codegen = true) shouldBe Seq("-42.0N,8.1")
  }

  test("interpreted and codegen paths agree (incl. per-row regex cache)") {
    val in = Seq("75.3W", "1.0N 2.0S", "", "abc", "9.9E")
    run(in, geoRe, 0, codegen = true) shouldBe run(in, geoRe, 0, codegen = false)
    // per-row regex column (not a literal) exercises the pattern cache
    val rows = Seq(("75.3W", "[0-9.]+[NSEW]"), ("ab12cd", "[0-9]+"))
      .toDF("s", "re")
      .select(RegexpExtractAllNegate($"s", $"re", lit(0)).as("r"))
      .as[String].collect().toSeq
    rows shouldBe Seq("-75.3", "1") // "12" loses its last char by the rule
  }
}
