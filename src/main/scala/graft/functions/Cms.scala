package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable Count-Min frequency sketch — the point-frequency
  * counterpart of [[Hll]] (distinct counts) and [[Hist]] (quantiles):
  * build per-partition (e.g. per day) d×w cell counts once at ingest,
  * answer "how often did X occur over the whole range" later by
  * SUMMING the partials instead of rescanning raw events. Cell-sum is
  * associative, so the merged estimate equals the direct one — the
  * property the q49 oracle proves cross-engine by computing directly
  * what Spark computes via the day partials. Estimates are upper
  * bounds (est >= true count, over-count only from collisions), the
  * classic CM guarantee (Cormode & Muthukrishnan 2005).
  *
  * Engine-portability: row j's bucket is
  * `poly_hash64(md5(j || ':' || value)) % w` — md5 gives both engines
  * the same hex string and [[PolyHash64]] documents its own DuckDB
  * `list_reduce` replay, so an oracle can re-derive every cell.
  *
  * Scale shape: the sketch is one explode(d) + hash agg with map-side
  * partials, bounded by d×w cells per key group; estimation joins the
  * query items against d×w cells (broadcast-sized by construction).
  */
object Cms {

  /** Working columns the sketch schema claims for itself. */
  private val Reserved = Seq("j", "bucket", "c", "est")

  private def checkKeys(keys: Seq[String], fn: String): Unit = {
    val clash = keys.intersect(Reserved)
    require(clash.isEmpty,
      s"Cms.$fn: key column(s) ${clash.mkString(", ")} collide with the " +
        s"sketch's working columns (${Reserved.mkString(", ")}); rename them")
  }

  private def checkShape(d: Int, w: Int, fn: String): Unit = {
    require(d >= 1 && d <= 16, s"Cms.$fn: d (hash rows) must be 1..16, got $d")
    require(w >= 2 && w <= (1 << 20), s"Cms.$fn: w (buckets) must be 2..2^20, got $w")
  }

  /** Bucket of `value` under hash row `j`. */
  private def bucketOf(j: Column, value: Column, w: Int): Column =
    pmod(PolyHash64(md5(concat_ws(":", j.cast("string"),
      value.cast("string")))), lit(w.toLong))

  /** The mergeable sketch: one row per (keys..., j, bucket) with its
    * count, j in 1..d. Unoccupied cells are implicit zeros. */
  def sketch(df: DataFrame, keys: Seq[String], value: Column,
      d: Int = 4, w: Int = 512): DataFrame = {
    checkKeys(keys, "sketch"); checkShape(d, w, "sketch")
    df.select(keys.map(col) :+ value.as("__v"): _*)
      .withColumn("j", explode(sequence(lit(1), lit(d))))
      .select(keys.map(col) :+ col("j") :+
        bucketOf(col("j"), col("__v"), w).as("bucket"): _*)
      .groupBy(keys.map(col) :+ col("j") :+ col("bucket"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Merge sketches over the same key space (cell-wise count sum). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    checkKeys(keys, "merge")
    a.unionByName(b)
      .groupBy(keys.map(col) :+ col("j") :+ col("bucket"): _*)
      .agg(sum("c").as("c"))
  }

  /** Point-frequency estimates: `items` gains an `est` column =
    * min over hash rows of the matching cell (the CM upper bound).
    * `cells` must be a keyless sketch (j, bucket, c) — collapse keys
    * first for range queries (`groupBy(j, bucket).sum(c)`). Missing
    * cells count as zero, so absent items estimate 0, not null. */
  def estimate(cells: DataFrame, items: DataFrame, value: Column,
      d: Int = 4, w: Int = 512): DataFrame = {
    checkKeys(items.columns.toSeq, "estimate"); checkShape(d, w, "estimate")
    val itemCols = items.columns.toSeq
    items
      .withColumn("j", explode(sequence(lit(1), lit(d))))
      .withColumn("bucket", bucketOf(col("j"), value, w))
      .join(cells.select("j", "bucket", "c"), Seq("j", "bucket"), "left")
      .groupBy(itemCols.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
