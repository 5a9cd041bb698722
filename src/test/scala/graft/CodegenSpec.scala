package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomMightContain, ByteStride, CdcChunks,
  NfcNormalize, PolyHash64, RegexpExtractAllNegate, ShingleHashes}
import graft.text.TextFns
import graft.vector.VectorFns

/** Forced-codegen compilation guard for every custom expression. A
  * broken doGenCode does NOT fail under default configs — Janino logs
  * an error and Spark silently falls back to interpreted execution, a
  * 10x hot-path regression correctness tests can't see (exactly how
  * the fused-shingling kernel regressed: its JVM helper collided with
  * Expression.eval, so no static forwarder existed for the generated
  * call). With fallback disabled, a non-compiling expression throws
  * here instead.
  */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  private def codegenOnly[T](body: => T): T = {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("all custom expressions compile under forced codegen") {
    codegenOnly {
      val row = Seq(("cafe docs and more docs here", "75.3W"))
        .toDF("text", "geo")
        .select(
          PolyHash64($"text").as("ph"),
          NfcNormalize($"text").as("nfc"),
          ShingleHashes(split($"text", " "), 3).as("sh"),
          RegexpExtractAllNegate($"geo", lit("[0-9.]+[NSEW]"), lit(0))
            .as("neg"),
          VectorFns.dot(array(lit(1.0), lit(2.0)),
            array(lit(3.0), lit(4.0))).as("dot"),
          ByteStride($"text".cast("binary"), 4).as("bs"),
          BloomMightContain(
            BloomMightContain.buildWords(
              (0 until BloomMightContain.K).map(j => BloomMightContain
                .probe(PolyHash64.hash("cafe docs and"), j, 64).toLong)
                .toArray, 64),
            64, PolyHash64(lit("cafe docs and"))).as("bloom"),
          CdcChunks($"text", 8, 64).as("cdc"),
          graft.functions.HashedNgramScore(split($"text", " "),
            graft.text.QualityClassifier.Weights).as("ngs"),
          graft.functions.HashedNgramProduct(split($"text", " "),
            (0 until 64).map(b => 0.5 + (b % 7) * 0.25)).as("ngp"))
        .head
      row.getLong(0) should not be 0L
      row.getString(1) shouldBe "cafe docs and more docs here"
      row.getSeq[Long](2).size shouldBe 4 // 4 distinct 3-grams
      row.getString(3) shouldBe "-75.3"
      row.getDouble(4) shouldBe 11.0
      new String(row.getAs[Array[Byte]](5)) shouldBe "c sdroh" // every 4th
      row.getBoolean(6) shouldBe true // its own 3 probes are set
      row.getSeq[String](7).mkString shouldBe "cafe docs and more docs here"
      // ordered unigrams-then-bigrams feature sum over the same tokens
      val toks = "cafe docs and more docs here".split(" ").toSeq
      val feats = toks ++ toks.sliding(2).map(_.mkString(" "))
      val w = graft.text.QualityClassifier.Weights
      row.getDouble(8) shouldBe feats.foldLeft(0.0)((acc, f) =>
        acc + w((PolyHash64.hash(f) % w.length).toInt))
      // same feature order, multiplicative fold (the DSIR weight kernel)
      val r = (0 until 64).map(b => 0.5 + (b % 7) * 0.25)
      row.getDouble(9) shouldBe feats.foldLeft(1.0)((acc, f) =>
        acc * r((PolyHash64.hash(f) % 64).toInt))
    }
  }

  test("LshBucketHash: codegen and interpreted agree and match the per-dot composition") {
    // the matrix-loop expression replaced 24-88 unrolled DotProducts
    // whose generated method fell out of JIT (HashProfile: 37x slower
    // than interpreted at 11 planes) — it must produce bit-identical
    // buckets to the composition under BOTH execution modes
    import graft.vector.Ann
    val emb = graft.sources.Tables.embeddings(spark, SfDir).limit(100)
    def buckets(): Seq[(Long, Seq[Long])] =
      emb.select($"vec_id", Ann.lshBuckets($"embedding", 64, 7, 8).as("b"))
        .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    val gen = codegenOnly { buckets() }
    // disable WHOLE-STAGE codegen too: with it on, the stage still runs
    // doGenCode and the factoryMode knob never reaches nullSafeEval —
    // gen and "interp" would compare the same generated path
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = try buckets()
      finally {
        spark.conf.unset("spark.sql.codegen.factoryMode")
        spark.conf.unset("spark.sql.codegen.wholeStage")
      }
    gen shouldBe interp
    // reference semantics: explicit per-plane DotProduct fold
    val ref = emb.select($"vec_id",
        array((0 until 8).map { t =>
          (0 until 7).foldLeft(lit(t.toLong * (1L << 7))) { (acc, j) =>
            acc + when(graft.functions.DotProduct(
                $"embedding".cast("array<double>"),
                Ann.planeLitPublic(t * 7 + j, 64)) > 0,
              lit(1L << j)).otherwise(lit(0L))
          }
        }: _*).as("b"))
      .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    gen shouldBe ref
    // a wrong-length vector contributes sign bit 0 everywhere (the
    // when(null > 0) otherwise-branch of the old composition)
    val short = Seq((1L, Seq(0.5f, -0.5f))).toDF("vec_id", "embedding")
      .select(Ann.lshBuckets($"embedding", 64, 7, 8).as("b"))
      .as[Seq[Long]].head()
    short shouldBe (0 until 8).map(t => t.toLong << 7)
  }

  test("the text-analysis column stack compiles under forced codegen") {
    codegenOnly {
      val docs = graft.sources.Tables.documents(spark, SfDir).limit(50)
      docs.select(
        TextFns.tokenCount($"text"),
        TextFns.qualityScore($"text"),
        TextFns.fingerprintRolling($"text"),
        TextFns.redactPii($"text"))
        .collect().length shouldBe 50
    }
  }
}
