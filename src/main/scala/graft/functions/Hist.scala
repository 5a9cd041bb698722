package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable fixed-width histogram sketch for percentile dashboards —
  * the quantile counterpart of [[Hll]]: build per-partition (e.g. per
  * day) bucket counts once at ingest, answer a whole-range p99 later by
  * SUMMING the partials instead of rescanning raw values. Count-sum is
  * associative, so the merged estimate equals the direct one — the
  * property the q48 oracle proves cross-engine by computing directly
  * what Spark computes via the day partials.
  *
  * Engine-portability: buckets are `floor(value * 2^scale)` — scaling
  * by a power of two is exact in IEEE doubles, so every engine bins
  * identically; rank selection runs in scaled integers (`cum * 100 >=
  * p100 * n`), and the only float steps (within-bucket linear
  * interpolation) are single IEEE ops any engine reproduces.
  *
  * Memory per group is the number of OCCUPIED buckets (bounded by the
  * value range times 2^scale) — like all fixed-width histograms this
  * wants a known, bounded value domain; for open-ended domains clamp
  * or switch to log-width buckets before sketching.
  */
object Hist {

  private val Reserved = Seq("bucket", "c", "cum", "n", "p100")

  private def checkKeys(keys: Seq[String], fn: String): Unit = {
    val clash = keys.intersect(Reserved)
    require(clash.isEmpty,
      s"Hist.$fn: key column(s) ${clash.mkString(", ")} collide with the " +
        s"sketch's working columns (${Reserved.mkString(", ")}); rename them")
  }

  /** The mergeable sketch: one row per (keys..., bucket) with its
    * count; bucket = floor(value * 2^scale). */
  def sketch(df: DataFrame, keys: Seq[String], value: Column,
      scale: Int = 2): DataFrame = {
    checkKeys(keys, "sketch")
    require(scale >= 0 && scale <= 20, s"Hist: scale must be 0..20, got $scale")
    df.select(keys.map(col) :+
        floor(value * (1L << scale)).cast("long").as("bucket"): _*)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Merge sketches over the same key space (bucket-wise count sum). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    checkKeys(keys, "merge")
    a.unionByName(b)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(sum("c").as("c"))
  }

  /** Percentile estimates from a sketch: one row per (keys..., p100)
    * with the interpolated estimate. `ps` are integer percents so rank
    * selection stays in exact integer arithmetic. Estimate = lower
    * bucket bound + linear interpolation within the chosen bucket
    * (the smallest bucket whose cumulative count reaches p% of n). */
  def quantiles(sketch: DataFrame, keys: Seq[String], ps: Seq[Int],
      scale: Int = 2): DataFrame = {
    checkKeys(keys, "quantiles")
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"Hist.quantiles: percents must be in 1..100, got ${ps.mkString(",")}")
    val cumW = Window.partitionBy(keys.map(col): _*).orderBy("bucket")
    val totW = Window.partitionBy(keys.map(col): _*)
    val cum = sketch
      .withColumn("cum", sum("c").over(cumW))
      .withColumn("n", sum("c").over(totW))
    val withP = cum
      .withColumn("p100", explode(array(ps.map(p => lit(p)): _*)))
      .filter(col("cum") * 100 >= col("p100") * col("n"))
    // smallest eligible bucket per (keys, p): min(struct) orders by the
    // leading field, and bucket is unique within a key group
    val chosen = withP
      .groupBy(keys.map(col) :+ col("p100"): _*)
      .agg(min(struct(col("bucket"), col("c"), col("cum"), col("n")))
        .as("sel"))
    chosen.select(keys.map(col) ++ Seq(
      col("p100"),
      round((col("sel.bucket") +
        (col("p100") * col("sel.n") - lit(100) * (col("sel.cum") - col("sel.c")))
          / (lit(100.0) * col("sel.c"))) / lit((1L << scale).toDouble), 4)
        .as("est")): _*)
  }
}
