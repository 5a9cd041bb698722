package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

import graft.sources.Topic
import graft.text.Dedup

/** Ingest-time near-dup dedup: documents arrive on a topic in
  * micro-batches; each batch is MinHash-LSH-deduped against the
  * signature index accumulated from all previous batches
  * ([[Dedup.incrementalLshPairs]] — index side contributes only stored
  * signatures, delta buckets broadcast, no index–index pairs), then the
  * batch's own signatures append to the index.
  *
  * The invariant that makes this the 100 TB front-door shape: each
  * near-dup pair is discovered EXACTLY ONCE — when its later member
  * arrives, or within-batch when both arrive together — so the union
  * of per-batch pair outputs equals the full-corpus batch run
  * ([[Dedup.minhashLshPairs]]) no matter how the stream is sliced into
  * micro-batches. IngestDedupSpec asserts that equality across
  * batchings; the st11 oracle pins it against DuckDB.
  *
  * At cluster scale the topic is Kafka and the index is the stored
  * signature table (S1/K4); per-batch cost is O(index + delta) with
  * the delta side broadcast — ingest never re-scans corpus text.
  */
object IngestDedup {

  private val sigSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("sig", ArrayType(StringType))))

  /** Publish `docs` as a topic under `root`, stream it back in bounded
    * micro-batches, and return the accumulated (a, b, est_jaccard)
    * near-dup pairs. `nFiles` × `maxFilesPerTrigger` control the
    * slicing; the result must not depend on either. */
  def run(spark: SparkSession, docs: DataFrame, root: String,
      nFiles: Int = 4, maxFilesPerTrigger: Int = 1, k: Int = 12,
      bands: Int = 4, minEst: Double = 0.5): DataFrame = {
    Topic.publishDocuments(docs, s"$root/topic", nFiles = nFiles)
    val src = Topic.decodeDocuments(
      Topic.readStream(spark, s"$root/topic", maxFilesPerTrigger))
    val q = src.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        // previous batches' signatures only — read BEFORE appending
        val index =
          if (Files.exists(Paths.get(s"$root/index")))
            sp.read.parquet(s"$root/index")
          else sp.createDataFrame(new java.util.ArrayList[Row](), sigSchema)
        Dedup.incrementalLshPairs(index, batch,
            k = k, bands = bands, minEst = minEst)
          .write.mode("append").parquet(s"$root/pairs")
        Dedup.minhashSignatures(batch, "doc_id", "text", k, 3)
          .write.mode("append").parquet(s"$root/index")
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$root/pairs")
  }
}
