package graft.sinks

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
    * columns as null — the `mergeSchema` pattern the reference applies
    * to its live tables (`Gold state/Step 04-04b - Gold Phase Raw and
    * custom metric.scala:93`). Schema merging is a footer-metadata
    * operation, not a data scan. */
  def readMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Crash-safe partition swap: live -> .bak, staging -> live, delete
    * .bak. Every crash point leaves a recoverable directory (either the
    * live dir is intact, or the fully-written staging dir and/or the
    * .bak survive under dotted names the readers ignore) — unlike
    * delete-then-rename, which has a window where the partition is
    * simply gone. */
  private def swapPartition(fs: org.apache.hadoop.fs.FileSystem,
      live: Path, staging: Path): Unit = {
    val bak = new Path(live.getParent,
      s".bak-${live.getName}-${System.nanoTime()}")
    if (!fs.rename(live, bak))
      throw new IllegalStateException(s"could not stage out $live")
    if (!fs.rename(staging, live)) {
      fs.rename(bak, live) // restore; staging is left for inspection
      throw new IllegalStateException(s"could not publish $staging to $live")
    }
    fs.delete(bak, true)
  }

  /** ALTER TABLE ... ADD COLUMNS + backfill (the reference's live
    * `currentTimestamp` add, `Gold Aggregation/Auto Optimization
    * .scala:370-373,416`): add `colName` = `value` to every partition
    * written before the column existed.
    *
    * Scale shape: the probe reads ONE parquet footer per partition
    * driver-side (no per-partition Spark job or file-index build), and
    * the rewrite is ONE distributed job over all legacy partitions at
    * once (`basePath` read -> `partitionBy` write), so a table with
    * tens of thousands of legacy partitions costs one job + O(n)
    * metadata renames, not n serial jobs. Partitions already carrying
    * the column are untouched. Returns the backfilled partition
    * values. */
  def addColumnBackfill(spark: SparkSession, dir: String,
      partitionCol: String, colName: String,
      value: org.apache.spark.sql.Column): Seq[String] = {
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    val prefix = s"$partitionCol="
    val parts = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath)
    val legacy = parts.filter { p =>
      // footer of one data file decides the partition's schema (all
      // files in a partition share a writer schema in this layout)
      fs.listStatus(p).toSeq
        .find(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        .exists { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(f.getPath, conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try !reader.getFileMetaData.getSchema.getFields.asScala
            .exists(_.getName == colName)
          finally reader.close()
        }
    }
    if (legacy.isEmpty) return Seq.empty
    val staging = new Path(root, s".evolve-${System.nanoTime()}")
    spark.read.option("basePath", dir).option("mergeSchema", "true")
      .parquet(legacy.map(_.toString): _*)
      .withColumn(partitionCol, col(partitionCol).cast("string"))
      .withColumn(colName, value)
      .write.partitionBy(partitionCol).parquet(staging.toString)
    // The rewrite round-trips partition values through partition
    // inference + a string cast, which can re-render a value (0123 ->
    // 123, null -> __HIVE_DEFAULT_PARTITION__) or collapse two legacy
    // values into one staged dir. Verify every expected staged dir
    // exists BEFORE any swap, so a mismatch aborts cleanly instead of
    // leaving the backfill half-applied.
    val missing = legacy.filterNot(p => fs.exists(new Path(staging, p.getName)))
    if (missing.nonEmpty) {
      fs.delete(staging, true)
      throw new IllegalStateException(
        "backfill aborted (no partition touched): staged dirs missing for " +
          s"${missing.map(_.getName).mkString(", ")} - partition values " +
          "that re-render differently under partition inference are not " +
          "supported by the batched rewrite")
    }
    legacy.foreach { p =>
      swapPartition(fs, p, new Path(staging, p.getName))
    }
    fs.delete(staging, true)
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
      swapPartition(fs, p.getPath, staging)
    }
    compacted.map(_.getPath.getName.stripPrefix(prefix)).sorted
  }

  /** Key-clustered write: range-partition the rows by `sortCol` into
    * `numFiles` files and sort inside each, so every output file owns a
    * disjoint key range. Parquet then records tight min/max stats per
    * file/row-group, and a point or range predicate on the key skips
    * every other file at scan time — the OPTIMIZE-ZORDER-style data
    * layout step, restricted to one clustering key, on plain Parquet.
    * At 100 TB this is what turns a key lookup from a full-table scan
    * into a handful of row groups; `sortWithinPartitions` keeps the
    * sort local (no global sort, one range-exchange shuffle).
    */
  def writeClustered(df: DataFrame, dir: String, sortCol: String,
      numFiles: Int, mode: String = "overwrite"): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(mode).parquet(dir)
  }

  /** Multi-column Z-ORDER layout (Delta's `OPTIMIZE ... ZORDER BY`
    * analog, on plain Parquet): rows are range-partitioned and sorted
    * by the bit-interleaved rank-bucket of EVERY cluster column, so
    * per-file parquet min/max stats stay tight on all of them at once.
    * [[writeClustered]] on one key leaves every other column's
    * per-file range at ~full width — a scan filtering the second
    * dimension prunes nothing; the Z-layout bounds both, so
    * multi-dimensional range scans skip files whichever dimension they
    * filter (the property TableSinksSpec asserts footer-by-footer).
    *
    * Mechanics: per column, `2^bitsPerCol` rank buckets from
    * approxQuantile boundaries (driver-bounded: 2^bits-1 doubles per
    * column); bucket assignment is a codegen'd comparison sum; the
    * z-value interleaves the bucket bits round-robin. The z expression
    * is passed straight to repartitionByRange/sortWithinPartitions —
    * no helper column travels or lands in the files. One range
    * exchange + local sort, same cost shape as writeClustered.
    */
  def writeZOrdered(df: DataFrame, dir: String, zCols: Seq[String],
      numFiles: Int, bitsPerCol: Int = 4, mode: String = "overwrite")
      : Unit = {
    require(zCols.size >= 2,
      "writeZOrdered needs >= 2 cluster columns; use writeClustered for 1")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(bitsPerCol >= 1 && bitsPerCol <= 8,
      s"bitsPerCol must be in [1, 8], got $bitsPerCol")
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright, when}
    val nBuckets = 1 << bitsPerCol
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val ncols = zCols.size
    val z = zCols.zipWithIndex.map { case (c, ci) =>
      val bounds = df.stat.approxQuantile(c, probs, 0.001)
      // bucket = number of boundaries below the value (a flat sum of
      // comparisons — codegen-friendly, no when-chain depth)
      // fold from a lit(0L) seed: an empty or all-null column yields
      // zero approxQuantile boundaries, and the bucket must degrade to
      // a constant 0, not crash an empty reduce
      val bucket = bounds.distinct.map(b =>
        when(col(c).cast("double") > lit(b), 1L).otherwise(0L))
        .foldLeft(lit(0L))(_ + _)
      // spread this column's bucket bits to positions ci, ci+ncols, ...
      (0 until bitsPerCol).map(i =>
        shiftleft(shiftright(bucket, i).bitwiseAND(lit(1L)),
          i * ncols + ci))
        .reduce((a, b) => a.bitwiseOR(b))
    }.reduce((a, b) => a.bitwiseOR(b))
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode(mode).parquet(dir)
  }

  /** Per-file (min, max) of a long column read from the parquet
    * footers — the stats a clustered layout exists to tighten; used by
    * specs and layout audits, one footer read per file, no data scan. */
  def fileRangesOf(spark: SparkSession, dir: String, colName: String)
      : Seq[(String, Long, Long)] = {
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(f.getPath, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val ranges = reader.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala
              .filter(_.getPath.toDotString == colName)
              .map { c =>
                val st = c.getStatistics
                if (st == null || st.isEmpty)
                  throw new IllegalArgumentException(
                    s"fileRangesOf: no statistics for column '$colName' in " +
                      s"${f.getPath.getName} (stats absent from footer)")
                (st.genericGetMin, st.genericGetMax) match {
                  case (mn: Number, mx: Number) =>
                    (mn.longValue(), mx.longValue())
                  case (mn, _) => throw new IllegalArgumentException(
                    s"fileRangesOf: column '$colName' in ${f.getPath.getName} " +
                      s"has non-numeric stats (${mn.getClass.getSimpleName}); " +
                      "only integral columns are supported")
                }
              }
          }
          if (ranges.isEmpty)
            throw new IllegalArgumentException(
              s"fileRangesOf: column '$colName' not found in " +
                s"${f.getPath.getName} — check the name (nested columns use " +
                "dot paths)")
          (f.getPath.getName, ranges.map(_._1).min, ranges.map(_._2).max)
        } finally reader.close()
      }
  }
}
