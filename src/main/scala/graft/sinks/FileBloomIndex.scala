package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain

/** Per-FILE Bloom index over a parquet directory — point-lookup file
  * skipping where min/max footer stats cannot help (a high-cardinality
  * key scattered by ingest order: every file's [min, max] covers every
  * key, yet each individual key lives in very few files).
  *
  * Delta/Iceberg ship the same idea as optional per-file bloom
  * metadata; here it is an ordinary parquet side table —
  * `(file, pos)` sorted set positions of each file's key hashes —
  * built by ONE distributed pass over the data
  * (`input_file_name()` + the [[BloomMightContain]] probe arithmetic,
  * k=3). A lookup touches the INDEX first (bounded by file count, not
  * rows), keeps the files whose filter might contain the key, and
  * scans only those. At 100 TB with date-partitioned ingest this turns
  * "find one document id" from a full scan into a couple of files.
  *
  * Index size: ≤ min(3·rows, mBits) ints per file (positions are
  * deduplicated); at the default 2^16 bits that is at most 256 KiB
  * per file and typically far less. The driver materializes only the
  * surviving FILE LIST, never data rows.
  */
object FileBloomIndex {

  /** Non-negative 60-bit key hash — the mask alone guarantees the
    * sign (no abs: ANSI mode overflows on abs(Long.MinValue)); probe()
    * splits h1/h2 below 2^30 each, so the shift arithmetic stays
    * exact. */
  private def keyHash(key: org.apache.spark.sql.Column) =
    xxhash64(key).bitwiseAND(lit(0x0FFFFFFFFFFFFFFFL))

  /** One distributed pass: (file, pos) distinct probe positions per
    * data file, written as the index table at `indexDir`. */
  def build(spark: SparkSession, dataDir: String, keyCol: String,
      indexDir: String, mBits: Int = 1 << 16): Unit = {
    spark.read.parquet(dataDir)
      .select(input_file_name().as("file"),
        explode(BloomMightContain.probes(keyHash(col(keyCol)), mBits))
          .as("pos"))
      .distinct()
      .repartition(col("file"))
      .write.mode("overwrite").parquet(indexDir)
  }

  /** Files whose Bloom filter might contain `value` — the candidate
    * list a pruned lookup scans (includes false positives, never
    * misses a true occurrence). Bounded by the file count. */
  def candidateFiles(spark: SparkSession, indexDir: String,
      value: Long, mBits: Int = 1 << 16): Seq[String] = {
    // the literal's hash via the SAME engine arithmetic as build
    val h = spark.range(1).select(keyHash(lit(value))).head.getLong(0)
    val ps = (0 until BloomMightContain.K)
      .map(j => BloomMightContain.probe(h, j, mBits).toLong)
    spark.read.parquet(indexDir)
      .filter(col("pos").isin(ps: _*))
      .groupBy("file").agg(countDistinct("pos").as("hits"))
      .filter(col("hits") === ps.distinct.length)
      .select("file").collect().map(_.getString(0)).toSeq.sorted
  }

  /** Point lookup through the index: scan only candidate files. */
  def lookup(spark: SparkSession, dataDir: String, indexDir: String,
      keyCol: String, value: Long, mBits: Int = 1 << 16): DataFrame = {
    val files = candidateFiles(spark, indexDir, value, mBits)
    val all = spark.read.parquet(dataDir)
    if (files.isEmpty) all.limit(0)
    else spark.read.parquet(files: _*).filter(col(keyCol) === value)
  }
}
