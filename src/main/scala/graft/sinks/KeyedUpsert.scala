package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-semantics keyed upsert onto plain Parquet (SURVEY.md K4): the
  * reference uses `DeltaTable.merge(batch, keys).whenMatched.updateAll.
  * whenNotMatched.insertAll` from `foreachBatch`
  * (`Gold Aggregation/OLD - Step 05 ...scala:41-55`). Without a
  * transaction log, the scalable equivalent is hash-bucketed partition
  * rewrite:
  *
  *  - the target table is partitioned by `__bucket = xxhash64(keys) % N`;
  *  - a batch only touches the buckets its keys hash into: read those
  *    buckets, anti-join out the matched keys, union the batch, and
  *    atomically swap JUST those partition directories.
  *
  * Cost per micro-batch is O(|batch| + |touched buckets|), independent of
  * total table size — the property that makes MERGE viable at 100 TB
  * (with N sized so a bucket fits an executor; compose with a date
  * partition for time-series tables). Replaying the same batch is
  * idempotent: the swap converges to the same rows.
  */
object KeyedUpsert {

  val BucketCol = "__bucket"

  private def bucketed(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame =
    df.withColumn(BucketCol,
      pmod(xxhash64(keyCols.map(col): _*), lit(n.toLong)))

  /** Upsert `batch` into `targetDir` matching on `keyCols`. Within a
    * batch, later rows win per `tieBreak` (descending) when given,
    * otherwise any one row per key is kept. With `keepMaxOnMerge` the
    * tieBreak also arbitrates against EXISTING rows — the conditional
    * MERGE ("update only if newer") the reference's latest-table
    * maintenance needs, which makes the sink correct under
    * out-of-order batch replay. */
  def upsert(spark: SparkSession, targetDir: String, batch: DataFrame,
      keyCols: Seq[String], numBuckets: Int = 64,
      tieBreak: Option[String] = None,
      keepMaxOnMerge: Boolean = false): Unit = {
    if (batch.isEmpty) return
    def top1(df: DataFrame): DataFrame = tieBreak match {
      case Some(tb) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tb).desc)
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None => df.dropDuplicates(keyCols)
    }
    // one row per key within the batch
    val deduped = top1(batch)
    val b = bucketed(deduped, keyCols, numBuckets).persist()
    try {
      val target = new Path(targetDir)
      val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(target)) {
        b.write.partitionBy(BucketCol).parquet(targetDir)
      } else {
        val touched = b.select(BucketCol).distinct()
          .collect().map(_.getLong(0)).sorted // bounded by numBuckets
        val existing = spark.read.parquet(targetDir)
          .filter(col(BucketCol).isin(touched: _*)) // partition-pruned scan
        val merged =
          if (keepMaxOnMerge && tieBreak.isDefined)
            // conditional MERGE: existing and incoming rows compete on
            // the tieBreak; replayed/out-of-order batches cannot
            // regress a key to an older row
            top1(existing.select(b.columns.map(col): _*).union(b))
          else {
            val keep = existing.join(
              b.select(keyCols.map(col): _*), keyCols, "left_anti")
            keep.select(b.columns.map(col): _*).union(b)
          }
        // stage merged buckets, then swap only the touched partition
        // dirs. The swap is rename-to-backup + rename-in: a crash
        // between the renames leaves the previous rows recoverable in
        // the backup dir (true atomicity needs a commit log — that is
        // the one thing Delta's transaction log buys; documented gap)
        val staging = new Path(targetDir + s".staging-${System.nanoTime()}")
        merged.write.partitionBy(BucketCol).parquet(staging.toString)
        val backup = new Path(targetDir + s".backup-${System.nanoTime()}")
        fs.mkdirs(backup)
        touched.foreach { bk =>
          val part = s"$BucketCol=$bk"
          val dst = new Path(target, part)
          val src = new Path(staging, part)
          if (fs.exists(src)) {
            if (fs.exists(dst)) fs.rename(dst, new Path(backup, part))
            fs.rename(src, dst)
          }
        }
        fs.delete(staging, true)
        fs.delete(backup, true)
      }
    } finally b.unpersist()
  }

  /** Read the upsert table back (bucket column dropped). */
  def read(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir).drop(BucketCol)

  /** foreachBatch hook for streaming update-mode aggregates (K3/K4). */
  def sink(targetDir: String, keyCols: Seq[String], numBuckets: Int = 64)
      : (DataFrame, Long) => Unit =
    (batch, _) => upsert(batch.sparkSession, targetDir, batch, keyCols, numBuckets)
}
