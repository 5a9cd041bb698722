package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.Media
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.mediaFromDocuments(
    Tables.documents(spark, SfDir)).cache()

  test("media table: opaque binary content with typed envelope") {
    media.schema("content").dataType.typeName shouldBe "binary"
    media.select("kind").distinct().as[String].collect().toSet shouldBe
      Set("image", "audio", "video")
  }

  test("typed mapPartitions decode yields fixed-schema features") {
    val ds = media.as[Media]
    val feats = Multimodal.decodeFeatures(ds)
    feats.schema.fieldNames shouldBe
      Array("media_id", "kind", "n_bytes", "checksum", "feature")
    val rows = feats.collect()
    rows.length shouldBe media.count()
    rows.foreach { f =>
      f.feature.length shouldBe 4
      f.n_bytes should be > 0L
    }
    // deterministic across runs
    val again = Multimodal.decodeFeatures(ds).collect()
    rows.map(_.checksum).sorted shouldBe again.map(_.checksum).sorted
  }

  test("decode runs partition-parallel and survives repartitioning") {
    val ds = media.as[Media].repartition(7, col("kind"))
    val feats = Multimodal.decodeFeatures(ds)
    feats.rdd.getNumPartitions shouldBe 7
    feats.count() shouldBe media.count()
  }

  test("stub checksum matches the expression-side rolling fingerprint") {
    // the mapPartitions stub and the pure-SQL pipeline must agree on
    // bytes: checksum(content) == polynomial fold of the text chars
    val viaDs = Multimodal.decodeFeatures(media.as[Media])
      .select("media_id", "checksum").as[(Long, Long)].collect().toMap
    val viaBytes = Tables.documents(spark, SfDir).collect().map { r =>
      val id = r.getAs[Long]("doc_id")
      id -> Multimodal.StubDecoder.checksum(
        r.getAs[String]("text").getBytes("UTF-8"))
    }.toMap
    viaDs shouldBe viaBytes
  }

  test("frame sampling strides through the fake frame index space") {
    val frames = Multimodal.sampleFrames(media)
    frames.filter($"frame_idx" % 2 =!= 0).count() shouldBe 0
    val perMedia = frames.groupBy("media_id")
      .agg(max("frame_idx").as("mx"), first("n_frames").as("n"))
      .filter($"mx" > $"n").count() shouldBe 0
  }

  test("perceptual hash: identical media collide, distinct media separate") {
    import org.apache.spark.sql.functions.lit
    val long = ("the quick brown fox jumps over the lazy dog and keeps " +
      "running through the long field of words ") * 6
    val other = ("entirely different content built from another set of " +
      "symbols numbers 12345 and punctuation !!! ??? ;;; ") * 6
    val m = Seq(
      (1L, long), (2L, long), // exact duplicates
      (3L, long + " tiny suffix"), // near-duplicate
      (4L, other))
      .toDF("media_id", "text")
      .select($"media_id", lit("image").as("kind"),
        $"text".cast("binary").as("content"))
    val h = Multimodal.perceptualHash(m)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    h(1L) shouldBe h(2L) // identical bytes -> identical 64 bits
    def hamming(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    hamming(h(1L), h(3L)) should be < hamming(h(1L), h(4L))
    // the pair machinery (banded LSH + Hamming filter) finds the dup
    val pairs = Multimodal.perceptualNearDupPairs(m, maxHamming = 6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 4L))
  }

  test("media keep: one canonical per perceptual cluster, uniques survive") {
    import org.apache.spark.sql.functions.lit
    val long = ("the quick brown fox jumps over the lazy dog and keeps " +
      "running through the long field of words ") * 6
    val other = ("entirely different content built from another set of " +
      "symbols numbers 12345 and punctuation !!! ??? ;;; ") * 6
    val m = Seq((1L, long), (2L, long), (3L, long), (4L, other))
      .toDF("media_id", "text")
      .select($"media_id", lit("image").as("kind"),
        $"text".cast("binary").as("content"))
    // same composition as the m06 registration: pairs -> CC -> keep
    val pairs = Multimodal.perceptualNearDupPairs(m, maxHamming = 6)
    val labels = graft.operators.ConnectedComponents.run(pairs)
      .withColumnRenamed("node", "media_id")
    val kept = m.select("media_id")
      .join(labels, Seq("media_id"), "left")
      .filter($"label".isNull || $"media_id" === $"label")
      .select($"media_id",
        when($"label".isNull, "unique").otherwise("canonical").as("reason"))
      .as[(Long, String)].collect().toMap
    kept.keySet shouldBe Set(1L, 4L) // 2,3 drop; 1 canonical; 4 unique
    kept(1L) shouldBe "canonical"
    kept(4L) shouldBe "unique"
  }

  test("media split: a perceptual cluster shares one split, leak-free") {
    import org.apache.spark.sql.functions.lit
    val long = ("the quick brown fox jumps over the lazy dog and keeps " +
      "running through the long field of words ") * 6
    val other = ("entirely different content built from another set of " +
      "symbols numbers 12345 and punctuation !!! ??? ;;; ") * 6
    val m = Seq((1L, long), (2L, long), (3L, long), (4L, other))
      .toDF("media_id", "text")
      .select($"media_id", lit("image").as("kind"),
        $"text".cast("binary").as("content"))
    val pairs = Multimodal.perceptualNearDupPairs(m, maxHamming = 6)
    val labels = graft.operators.ConnectedComponents.run(pairs)
      .withColumnRenamed("node", "media_id")
    val split = m.select("media_id")
      .join(labels, Seq("media_id"), "left")
      .withColumn("split_key", coalesce($"label", $"media_id"))
      .select($"media_id", $"split_key",
        graft.text.TextFns.splitAssign($"split_key").as("split"))
      .as[(Long, Long, String)].collect()
    val clustered = split.filter(r => Set(1L, 2L, 3L)(r._1))
    clustered.map(_._2).toSet.size shouldBe 1 // one shared split key
    clustered.map(_._3).toSet.size shouldBe 1 // hence one shared split
    split.filter(_._1 == 4L).head._2 shouldBe 4L // unique keys itself
  }

  test("perceptual near-dup derives its hot-bucket cap like every LSH door") {
    import org.apache.spark.sql.functions.lit
    // 1200 identical objects: one band bucket of 1200 > the derived
    // floor cap (capFor(1200, 16) = 1000) -> dropped and surfaced;
    // an explicit generous cap keeps the full clique
    val clique = (1L to 1200L).map(i => (i, "identical media payload"))
      .toDF("media_id", "text")
      .select($"media_id", lit("image").as("kind"),
        $"text".cast("binary").as("content"))
    Multimodal.perceptualNearDupPairs(clique).count() shouldBe 0L
    Multimodal.perceptualNearDupPairs(clique,
      maxBucketSize = Some(graft.functions.Buckets.DefaultMaxBucketSize))
      .count() shouldBe (1200L * 1199 / 2)
  }
}
