package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct
import graft.sources.Tables
import graft.vector.VectorFns

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot matches the HOF fold bit-for-bit on real embeddings") {
    val emb = Tables.embeddings(spark, SfDir).limit(100)
    val a = emb.select($"vec_id".as("a"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("b"), $"embedding".as("vb"))
    val pairs = a.crossJoin(b).filter($"a" < $"b")
    val diff = pairs
      .select(DotProduct($"va", $"vb").as("native"),
        VectorFns.dotFold($"va", $"vb").as("fold"))
      .filter($"native" =!= $"fold") // bitwise equality, no tolerance
      .count()
    diff shouldBe 0L
  }

  test("interpreted and codegen paths agree") {
    val df = Seq((Array(1.5, -2.0, 3.25), Array(0.5, 4.0, -1.0))).toDF("a", "b")
    def run(mode: String): Double = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(DotProduct($"a", $"b")).head.getDouble(0)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val expected = 1.5 * 0.5 + -2.0 * 4.0 + 3.25 * -1.0
    run("CODEGEN_ONLY") shouldBe expected
    run("NO_CODEGEN") shouldBe expected
  }

  test("null array yields null") {
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    df.select(DotProduct($"a", $"b")).head.isNullAt(0) shouldBe true
  }

  test("mismatched lengths yield null, not a partial sum") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    def run(mode: String): Boolean = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(DotProduct($"a", $"b")).head.isNullAt(0)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    run("CODEGEN_ONLY") shouldBe true
    run("NO_CODEGEN") shouldBe true
  }
}
