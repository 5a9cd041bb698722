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
}
