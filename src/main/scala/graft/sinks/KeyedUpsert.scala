package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-semantics keyed upsert onto plain Parquet (SURVEY.md K4): the
  * reference uses `DeltaTable.merge(batch, keys).whenMatched.updateAll.
  * whenNotMatched.insertAll` from `foreachBatch`
  * (`Gold Aggregation/OLD - Step 05 ...scala:41-55`). The scalable
  * equivalent without Delta is hash-bucketed rewrite behind a snapshot
  * manifest — a minimal transaction log:
  *
  *  - rows are hash-bucketed on `__bucket = xxhash64(keys) % N`;
  *  - a batch only touches the buckets its keys hash into: read those
  *    buckets' live directories, merge, and write the result into a
  *    fresh immutable commit directory (`data/c<version>-<nonce>/`);
  *  - the commit point is ONE atomic file rename publishing
  *    `_manifests/v<version>.txt`, which maps every live bucket to the
  *    directory that currently holds it. A crash before the rename
  *    leaves the previous version fully intact (the half-written commit
  *    dir is unreferenced garbage, reclaimed by vacuum).
  *
  * The manifest chain doubles as a version log (the reference's
  * `DESCRIBE HISTORY` / `startingVersion` replay, `Query the Metric
  * tables/Query the delta tables.scala:702`, `Gold state/Step
  * 04-04b...scala`): `read(version = Some(v))` pins a snapshot,
  * `changesSince(v)` re-reads only buckets that changed after v.
  *
  * Cost per micro-batch is O(|batch| + |touched buckets|), independent
  * of total table size — the property that makes MERGE viable at 100 TB
  * (with N sized so a bucket fits an executor; compose with a date
  * partition for time-series tables). Replaying the same batch is
  * idempotent: the merge converges to the same rows. Writers are
  * single-owner per table (as in the reference's one-stream-per-table
  * layout); a racing writer loses the manifest rename and fails loudly.
  */
object KeyedUpsert {

  val BucketCol = "__bucket"
  private val ManifestDir = "_manifests"
  private val DataDir = "data"

  private def bucketed(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame =
    df.withColumn(BucketCol,
      pmod(xxhash64(keyCols.map(col): _*), lit(n.toLong)))

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestFile(target: Path, v: Long): Path =
    new Path(target, f"$ManifestDir/v$v%08d.txt")

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".txt"))
      name.stripPrefix("v").stripSuffix(".txt").toLongOption
    else None

  /** Committed versions, ascending; empty for a table never written. */
  def versions(spark: SparkSession, targetDir: String): Seq[Long] = {
    val dir = new Path(new Path(targetDir), ManifestDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => versionOf(s.getPath.getName)).sorted
  }

  /** One DESCRIBE HISTORY row: the commit metadata recorded in the
    * manifest header at commit time (`Query the Metric tables/Query the
    * delta tables.scala:702`). `touchedBuckets` is the number of bucket
    * directories the commit rewrote — the unit of work the layout
    * promises stays O(batch), not O(table). */
  case class Commit(version: Long, operation: String, commitMs: Long,
      touchedBuckets: Long)

  /** DESCRIBE HISTORY analog, ascending by version. Manifests written
    * before headers existed surface as operation "unknown" with the
    * file modification time. */
  def history(spark: SparkSession, targetDir: String): Seq[Commit] = {
    val target = new Path(targetDir)
    val dir = new Path(target, ManifestDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap { s =>
        versionOf(s.getPath.getName).map { v =>
          val h = readHeader(fs, target, v)
          Commit(v, h.getOrElse("operation", "unknown"),
            h.get("commitMs").flatMap(_.toLongOption)
              .getOrElse(s.getModificationTime),
            h.get("touchedBuckets").flatMap(_.toLongOption).getOrElse(-1L))
        }
      }
      .sortBy(_.version)
  }

  private def manifestText(fs: FileSystem, target: Path, v: Long): String = {
    val in = fs.open(manifestFile(target, v))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** `#key=value` header lines of the version's manifest. */
  private def readHeader(fs: FileSystem, target: Path,
      version: Long): Map[String, String] =
    manifestText(fs, target, version).linesIterator
      .filter(_.startsWith("#"))
      .flatMap { line =>
        line.stripPrefix("#").split("=", 2) match {
          case Array(k, v) => Some(k -> v)
          case _ => None
        }
      }.toMap

  /** bucket -> table-relative live directory at `version`. Header
    * (`#`-prefixed) lines carry commit metadata, not mappings. */
  private def loadManifest(fs: FileSystem, target: Path,
      version: Long): Map[Long, String] =
    manifestText(fs, target, version).linesIterator
      .filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val Array(bk, rel) = line.split('\t')
        bk.toLong -> rel
      }.toMap

  /** Publish `mapping` as version `v`: write a temp file, then rename —
    * the rename IS the commit; it fails (loudly) if the version was
    * concurrently taken. The header records the DESCRIBE HISTORY
    * metadata: operation name, wall-clock commit time, and how many
    * bucket directories this commit (re)wrote. */
  private def commitManifest(fs: FileSystem, target: Path, v: Long,
      mapping: Map[Long, String], operation: String,
      touchedBuckets: Long): Unit = {
    val dir = new Path(target, ManifestDir)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-$v-${System.nanoTime()}")
    val out = fs.create(tmp, false)
    val header = s"#operation=$operation\n" +
      s"#commitMs=${System.currentTimeMillis()}\n" +
      s"#touchedBuckets=$touchedBuckets\n"
    try out.write((header + mapping.toSeq.sortBy(_._1)
      .map { case (bk, rel) => s"$bk\t$rel" }
      .mkString("\n")).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = manifestFile(target, v)
    if (fs.exists(dst) || !fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent commit of version $v to $target")
    }
  }

  /** Upsert `batch` into `targetDir` matching on `keyCols`. Within a
    * batch, later rows win per `tieBreak` (descending) when given,
    * otherwise any one row per key is kept. With `keepMaxOnMerge` the
    * tieBreak also arbitrates against EXISTING rows — the conditional
    * MERGE ("update only if newer") the reference's latest-table
    * maintenance needs, which makes the sink correct under
    * out-of-order batch replay. Each call commits one new version;
    * versions older than the newest `retainVersions` are vacuumed. */
  def upsert(spark: SparkSession, targetDir: String, batch: DataFrame,
      keyCols: Seq[String], numBuckets: Int = 64,
      tieBreak: Option[String] = None,
      keepMaxOnMerge: Boolean = false,
      retainVersions: Int = 8): Unit = {
    def top1(df: DataFrame): DataFrame = tieBreak match {
      case Some(tb) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tb).desc)
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None => df.dropDuplicates(keyCols)
    }
    // one row per key within the batch
    val b = bucketed(top1(batch), keyCols, numBuckets).persist()
    try {
      // ONE pass decides emptiness AND the touched buckets (filling
      // the persist on the way): the former separate
      // `if (batch.isEmpty) return` cost a full extra evaluation of
      // the batch plan — often an aggregation — per upsert call
      // (guide §1.2: don't compute things twice)
      val touched = b.select(BucketCol).distinct()
        .collect().map(_.getLong(0)).sorted // bounded by numBuckets
      if (touched.isEmpty) return // empty batch: nothing to commit
      val target = new Path(targetDir)
      val fs = fsOf(spark, target)
      val current = versions(spark, targetDir).lastOption
      if (current.isEmpty && fs.exists(target) &&
          fs.listStatus(target).exists { s =>
            val n = s.getPath.getName
            // any directory that isn't ours (incl. legacy __bucket=*/
            // datestamp=* partition dirs), or any non-marker file. An
            // orphan commit under data/ (crash before the FIRST manifest
            // publish) is unreferenced garbage, not legacy data.
            if (s.isDirectory) n != ManifestDir && n != DataDir
            else !n.startsWith(".") && !n.startsWith("_")
          })
        // Guard against silently shadowing a pre-manifest table: an
        // upsert that "initializes" over existing unmanaged data would
        // commit a v1 containing only the batch, making every prior row
        // invisible to read() with no error.
        throw new IllegalStateException(
          s"$targetDir contains data but no $ManifestDir/ — refusing to " +
          "initialize over an unmanaged/legacy layout; migrate the " +
          "existing rows with an explicit initial upsert into a fresh " +
          "directory (or delete the legacy data) first")
      val mapping = current.map(loadManifest(fs, target, _))
        .getOrElse(Map.empty[Long, String])
      val newVersion = current.getOrElse(0L) + 1
      val commitRel = f"$DataDir/c$newVersion%08d-${System.nanoTime()}"
      val commitDir = new Path(target, commitRel)
      // live dirs of ONLY the touched buckets — pruning by manifest,
      // no full-table listing or scan
      val existingDirs = touched.toSeq.flatMap(mapping.get)
        .map(rel => new Path(target, rel).toString)
      val merged = if (existingDirs.isEmpty) b else {
        val existing = bucketed( // leaf dirs carry no bucket col; recompute
          spark.read.parquet(existingDirs: _*), keyCols, numBuckets)
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
      }
      // rows sorted by key within each task (and so within each bucket
      // file): parquet row-group min/max on the leading key column then
      // lets a point lookup (read().filter(key === x)) skip row groups
      // — the layout cost is a local sort, no extra shuffle
      merged.sortWithinPartitions((BucketCol +: keyCols).map(col): _*)
        .write.partitionBy(BucketCol).parquet(commitDir.toString)
      val written = fs.listStatus(commitDir).toSeq
        .map(_.getPath.getName).filter(_.startsWith(s"$BucketCol="))
        .map(_.stripPrefix(s"$BucketCol=").toLong)
      commitManifest(fs, target, newVersion,
        mapping ++ written.map(bk => bk -> s"$commitRel/$BucketCol=$bk"),
        "MERGE", written.size.toLong)
      vacuum(fs, target, newVersion, retainVersions)
    } finally b.unpersist()
  }

  /** MERGE WHEN MATCHED THEN DELETE: remove every row whose key appears
    * in `keys`. Cost is O(|keys| + touched buckets) like [[upsert]]:
    * only buckets the keys hash into are read and rewritten; a bucket
    * left empty drops out of the manifest entirely. Deletes commit a
    * new version, so time travel still reads the pre-delete snapshot
    * until vacuum reclaims it. */
  def delete(spark: SparkSession, targetDir: String, keys: DataFrame,
      keyCols: Seq[String], numBuckets: Int = 64,
      retainVersions: Int = 8): Unit = {
    val k = bucketed(keys.select(keyCols.map(col): _*)
      .dropDuplicates(keyCols), keyCols, numBuckets).persist()
    try {
      // one pass decides emptiness AND the touched buckets (the former
      // separate isEmpty cost a full extra evaluation of `keys`)
      val touchedAll = k.select(BucketCol).distinct()
        .collect().map(_.getLong(0)).sorted // bounded by numBuckets
      if (touchedAll.isEmpty) return // no keys: nothing to delete
      val target = new Path(targetDir)
      val fs = fsOf(spark, target)
      val current = resolveVersion(spark, targetDir, None)
      val mapping = loadManifest(fs, target, current)
      val touched = touchedAll.filter(mapping.contains)
      if (touched.isEmpty) return // no key hashes into a live bucket
      val newVersion = current + 1
      val commitRel = f"$DataDir/c$newVersion%08d-${System.nanoTime()}"
      val commitDir = new Path(target, commitRel)
      val existing = bucketed(
        spark.read.parquet(touched.toSeq.flatMap(mapping.get)
          .map(rel => new Path(target, rel).toString): _*),
        keyCols, numBuckets)
      existing.join(k.select(keyCols.map(col): _*), keyCols, "left_anti")
        .sortWithinPartitions((BucketCol +: keyCols).map(col): _*)
        .write.partitionBy(BucketCol).parquet(commitDir.toString)
      val written = fs.listStatus(commitDir).toSeq
        .map(_.getPath.getName).filter(_.startsWith(s"$BucketCol="))
        .map(_.stripPrefix(s"$BucketCol=").toLong)
      // touched buckets with no surviving rows leave the manifest
      commitManifest(fs, target, newVersion,
        (mapping -- (touched.toSet -- written.toSet)) ++
          written.map(bk => bk -> s"$commitRel/$BucketCol=$bk"),
        "DELETE", touched.length.toLong)
      vacuum(fs, target, newVersion, retainVersions)
    } finally k.unpersist()
  }

  /** OPTIMIZE analog for the versioned table: rewrite the live snapshot
    * into one fresh commit with one file per bucket (optionally sorted
    * by `sortCols` inside each bucket for row-group skipping). Long
    * upsert histories fragment a bucket across many commit dirs and
    * files; compaction restores the one-dir-one-file layout without
    * changing any row. Commits a new version — readers never see a
    * partial rewrite, and pre-compaction versions stay pinnable. */
  def compact(spark: SparkSession, targetDir: String,
      sortCols: Seq[String] = Seq.empty, retainVersions: Int = 8): Unit = {
    val target = new Path(targetDir)
    val fs = fsOf(spark, target)
    val current = resolveVersion(spark, targetDir, None)
    val mapping = loadManifest(fs, target, current)
    if (mapping.isEmpty) return
    val newVersion = current + 1
    val commitRel = f"$DataDir/c$newVersion%08d-${System.nanoTime()}"
    val commitDir = new Path(target, commitRel)
    // leaf dirs don't store the bucket value; tag each bucket's frame
    val parts = mapping.toSeq.sortBy(_._1).map { case (bk, rel) =>
      spark.read.parquet(new Path(target, rel).toString)
        .withColumn(BucketCol, lit(bk))
    }
    parts.reduce(_.unionByName(_))
      .repartition(col(BucketCol)) // whole buckets per task -> 1 file each
      .sortWithinPartitions((BucketCol +: sortCols).map(col): _*)
      .write.partitionBy(BucketCol).parquet(commitDir.toString)
    val written = fs.listStatus(commitDir).toSeq
      .map(_.getPath.getName).filter(_.startsWith(s"$BucketCol="))
      .map(_.stripPrefix(s"$BucketCol=").toLong)
    commitManifest(fs, target, newVersion,
      written.map(bk => bk -> s"$commitRel/$BucketCol=$bk").toMap,
      "OPTIMIZE", written.size.toLong)
    vacuum(fs, target, newVersion, retainVersions)
  }

  /** RESTORE analog (Delta's `RESTORE TABLE ... TO VERSION AS OF v`):
    * re-publish the bucket mapping of `version` as a NEW commit — a
    * rollback that itself appears in history, so the rolled-over
    * versions stay pinnable until vacuum reclaims them. No data moves:
    * commit directories are immutable, the restored manifest simply
    * references the old ones again (and vacuum keeps any directory a
    * retained manifest references). O(manifest), independent of table
    * size. */
  def restore(spark: SparkSession, targetDir: String, version: Long,
      retainVersions: Int = 8): Unit = {
    val target = new Path(targetDir)
    val fs = fsOf(spark, target)
    val v = resolveVersion(spark, targetDir, Some(version))
    val latest = resolveVersion(spark, targetDir, None)
    val mapping = loadManifest(fs, target, v)
    commitManifest(fs, target, latest + 1, mapping, "RESTORE", 0L)
    vacuum(fs, target, latest + 1, retainVersions)
  }

  /** Drop manifests older than the newest `retain` and any commit dir
    * no retained manifest references. Only dirs whose version is <= the
    * just-committed one are candidates, so an in-flight writer's
    * not-yet-committed directory is never reclaimed from under it. */
  private def vacuum(fs: FileSystem, target: Path, latest: Long,
      retain: Int): Unit = {
    val mDir = new Path(target, ManifestDir)
    val all = fs.listStatus(mDir).toSeq
      .flatMap(s => versionOf(s.getPath.getName)).sorted
    val (expired, kept) = all.partition(_ <= latest - retain)
    val referenced = kept.flatMap(v => loadManifest(fs, target, v).values)
      .map(_.split('/')(1)).toSet // data/<commit>/__bucket=K -> <commit>
    val dataDir = new Path(target, DataDir)
    if (fs.exists(dataDir)) fs.listStatus(dataDir).toSeq
      .map(_.getPath)
      .filter { p =>
        val name = p.getName
        !referenced.contains(name) &&
          name.stripPrefix("c").takeWhile(_.isDigit).toLongOption
            .exists(_ <= latest)
      }
      .foreach(fs.delete(_, true))
    expired.foreach(v => fs.delete(manifestFile(target, v), false))
  }

  /** Resolve a requested version against the retained manifest chain,
    * failing with a meaningful message (naming the earliest retained
    * version) when the version was vacuumed — instead of a raw
    * FileNotFoundException from the manifest read. */
  private def resolveVersion(spark: SparkSession, targetDir: String,
      requested: Option[Long]): Long = {
    val vs = versions(spark, targetDir)
    if (vs.isEmpty) throw new IllegalArgumentException(
      s"no committed version in $targetDir")
    requested match {
      case None => vs.last
      case Some(v) if vs.contains(v) => v
      case Some(v) => throw new IllegalArgumentException(
        s"version $v of $targetDir has been vacuumed or never existed; " +
        s"earliest available is ${vs.head}, latest is ${vs.last}")
    }
  }

  /** The live file layout at `version` (default latest): bucket ->
    * table-relative directory. The unit a scale audit inspects: an
    * upsert must remap only the buckets it touched. */
  def snapshot(spark: SparkSession, targetDir: String,
      version: Option[Long] = None): Map[Long, String] = {
    val target = new Path(targetDir)
    val v = resolveVersion(spark, targetDir, version)
    loadManifest(fsOf(spark, target), target, v)
  }

  /** Read the table at `version` (default: latest committed snapshot).
    * A fully-deleted snapshot (empty manifest) reads as zero rows with
    * the schema of the most recent non-empty retained version. */
  def read(spark: SparkSession, targetDir: String,
      version: Option[Long] = None): DataFrame = {
    val target = new Path(targetDir)
    val fs = fsOf(spark, target)
    val v = resolveVersion(spark, targetDir, version)
    val dirs = loadManifest(fs, target, v).values.toSeq.sorted
      .map(rel => new Path(target, rel).toString)
    if (dirs.nonEmpty) spark.read.parquet(dirs: _*)
    else {
      val withData = versions(spark, targetDir).filter(_ < v).reverse
        .map(pv => loadManifest(fs, target, pv))
        .find(_.nonEmpty)
        .getOrElse(throw new IllegalStateException(
          s"$targetDir at version $v is empty and no retained version " +
          "carries a schema"))
      spark.read.parquet(withData.values.toSeq.sorted
        .map(rel => new Path(target, rel).toString): _*).limit(0)
    }
  }

  /** startingVersion-style incremental replay: the current rows of
    * every bucket whose contents changed after `sinceVersion` — the
    * bucket-granular change feed a downstream consumer re-processes
    * instead of the whole table. */
  def changesSince(spark: SparkSession, targetDir: String,
      sinceVersion: Long): DataFrame = {
    val target = new Path(targetDir)
    val fs = fsOf(spark, target)
    val latest = resolveVersion(spark, targetDir, None)
    val base = loadManifest(fs, target,
      resolveVersion(spark, targetDir, Some(sinceVersion)))
    val now = loadManifest(fs, target, latest)
    val changed = now.filter { case (bk, rel) => !base.get(bk).contains(rel) }
    if (changed.isEmpty)
      read(spark, targetDir).limit(0)
    else
      spark.read.parquet(changed.values.toSeq.sorted
        .map(rel => new Path(target, rel).toString): _*)
  }

  /** Semantic row-level diff between two committed versions: one row
    * per key whose content was `added`, `removed` or `updated` going
    * from `fromVersion` to `toVersion` (default latest). Unlike
    * [[changesSince]] — which is FILE-granular and re-emits every
    * current row of a touched bucket — this compares rows, so a key
    * rewritten with identical content reports nothing.
    *
    * Bucket-pruned: only buckets whose manifest entry differs between
    * the two versions are scanned (an identical file path implies
    * identical content — buckets are immutable once published), so the
    * cost scales with the changed fraction, not the table. Rows are
    * compared via md5 of the JSON of their non-key columns (column
    * order fixed by sorting), one codegen'd projection per side and a
    * single full-outer join on the keys.
    */
  def diff(spark: SparkSession, targetDir: String, fromVersion: Long,
      keyCols: Seq[String], toVersion: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "diff needs the table's key columns")
    val target = new Path(targetDir)
    val fs = fsOf(spark, target)
    val mFrom = loadManifest(fs, target,
      resolveVersion(spark, targetDir, Some(fromVersion)))
    val mTo = loadManifest(fs, target,
      resolveVersion(spark, targetDir, toVersion))
    val changed = (mFrom.keySet ++ mTo.keySet)
      .filter(bk => mFrom.get(bk) != mTo.get(bk))
    def side(m: Map[Long, String]): DataFrame = {
      val dirs = m.view.filterKeys(changed).values.toSeq.sorted
        .map(rel => new Path(target, rel).toString)
      if (dirs.nonEmpty) spark.read.parquet(dirs: _*)
      else read(spark, targetDir, toVersion).limit(0)
    }
    def fingerprinted(df: DataFrame, as: String): DataFrame = {
      val others = df.columns.filterNot(keyCols.contains).sorted
      df.select(keyCols.map(col) :+
        md5(to_json(struct(others.map(col): _*))).as(as): _*)
    }
    fingerprinted(side(mFrom), "__fp_a")
      .join(fingerprinted(side(mTo), "__fp_b"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__fp_a").isNull, "added")
          .when(col("__fp_b").isNull, "removed")
          .when(col("__fp_a") =!= col("__fp_b"), "updated"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  /** foreachBatch hook for streaming update-mode aggregates (K3/K4). */
  def sink(targetDir: String, keyCols: Seq[String], numBuckets: Int = 64)
      : (DataFrame, Long) => Unit =
    (batch, _) => upsert(batch.sparkSession, targetDir, batch, keyCols, numBuckets)
}
