package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-level writers and maintenance (SURVEY.md K1/K2/K9/K10): the
  * Delta-specific operations of the reference re-expressed as plain
  * partitioned-Parquet layout management.
  */
object TableSinks {

  /** Datestamp-partitioned table write (the layout every fact table in
    * the reference uses — partition pruning on the date predicate is
    * what keeps interactive queries off the full 100 TB scan). */
  def writePartitioned(df: DataFrame, dir: String,
      partitionCol: String = "datestamp", mode: String = "append"): Unit =
    df.write.mode(mode).partitionBy(partitionCol).parquet(dir)

  /** Single-file CSV report with header (K9: the orphan-report sink,
    * `Detection Data Lack/...Orphaned...scala:77`). */
  def csvReport(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** K10 retention: drop whole partitions below the cutoff value — the
    * `DELETE FROM t WHERE Datestamp < d` + VACUUM pattern
    * (`Set Up Delta Tables/Purge ...scala:6-26`) as O(#partitions)
    * directory removal, no data rewrite. Returns dropped partition
    * values. */
  def purgePartitionsBelow(spark: SparkSession, dir: String,
      partitionCol: String, cutoff: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val prefix = s"$partitionCol="
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(s => s.getPath)
      .filter(p => p.getName.stripPrefix(prefix) < cutoff)
      .map { p => fs.delete(p, true); p.getName.stripPrefix(prefix) }
      .sorted
  }

  /** Additive schema evolution, reader side: a long-lived table gains
    * columns over time, so later partitions carry fields earlier ones
    * lack. `mergeSchema` unions the per-file schemas and reads missing
    * columns as null — the `mergeSchema`/`overwriteSchema` pattern the
    * reference applies to its live tables (`Set Up Delta Tables/Set up
    * Delta tables for BTS telemetry.scala:312`). Schema merging is a
    * footer-metadata operation, not a data scan. */
  def readMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** ALTER TABLE ... ADD COLUMNS + backfill (the reference's live
    * `currentTimestamp` add, `Gold Aggregation/Auto Optimization
    * .scala:370-373,416`): add `colName` = `value` to every partition
    * written before the column existed. Only partitions whose parquet
    * schema lacks the column are rewritten (schema probe reads footers,
    * not data); partitions already carrying it are untouched, so the
    * cost is O(legacy partitions), one distributed rewrite job each,
    * with the same staging swap as compaction. Returns the backfilled
    * partition values. */
  def addColumnBackfill(spark: SparkSession, dir: String,
      partitionCol: String, colName: String,
      value: org.apache.spark.sql.Column): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val prefix = s"$partitionCol="
    val legacy = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath)
      .filter(p => !spark.read.parquet(p.toString)
        .schema.fieldNames.contains(colName))
    legacy.foreach { p =>
      val staging = new Path(p.getParent,
        s".evolve-${p.getName}-${System.nanoTime()}")
      spark.read.parquet(p.toString)
        .withColumn(colName, value)
        .write.parquet(staging.toString)
      fs.delete(p, true)
      fs.rename(staging, p)
    }
    legacy.map(_.getName.stripPrefix(prefix)).sorted
  }

  /** K10 compaction: rewrite any partition holding more than
    * `maxFiles` data files into `targetFiles` files (the OPTIMIZE
    * analog, `Gold Aggregation/Auto Optimization.scala:363-366`).
    * Partition-at-a-time with a staging swap, so concurrent readers
    * never see a half-written partition. Returns compacted partition
    * names. */
  def compactPartitions(spark: SparkSession, dir: String,
      partitionCol: String, maxFiles: Int = 8, targetFiles: Int = 1)
      : Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val prefix = s"$partitionCol="
    val parts = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
    val compacted = parts.filter { p =>
      fs.listStatus(p.getPath)
        .count(f => f.isFile && !f.getPath.getName.startsWith("_")) > maxFiles
    }
    compacted.foreach { p =>
      val staging = new Path(p.getPath.getParent,
        s".compact-${p.getPath.getName}-${System.nanoTime()}")
      spark.read.parquet(p.getPath.toString)
        .coalesce(targetFiles)
        .write.parquet(staging.toString)
      fs.delete(p.getPath, true)
      fs.rename(staging, p.getPath)
    }
    compacted.map(_.getPath.getName.stripPrefix(prefix)).sorted
  }
}
