package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch built from engine-portable
  * primitives, so the DuckDB oracle replays the estimate BIT-EXACTLY —
  * unlike Spark's own `approx_count_distinct` (whose HLL++ internals no
  * other engine reproduces), this sketch is deterministic across
  * engines, runs and partitionings:
  *
  *  - hash: [[PolyHash64]] over the md5 hex of the value (md5
  *    decorrelates sequential ids; the 60-bit poly fold is the same
  *    `list_reduce` DuckDB runs),
  *  - bucket = h mod 256, rank = NLZ of the remaining 52 bits derived
  *    from `length(bin(w))` — exact integer logic, no float log2,
  *  - per-bucket max rank (associative -> map-side partial agg; two
  *    sketches over disjoint row sets merge by bucket-wise max),
  *  - the 1/sum(2^-M) denominator summed as EXACT integers
  *    (2^(53-M) fits a long; 256 buckets keep the total under 2^61),
  *    so no float-summation order can perturb the estimate.
  *
  * Memory per group is 256 (bucket, max-rank) pairs — the property
  * that makes distinct counting feasible at 100 TB where an exact
  * count(DISTINCT) shuffles every value. Standard error ~= 1.04/16
  * (~6.5%).
  */
object Hll {

  /** Buckets (m = 2^8); ranks span 1..53 over the remaining 52 bits. */
  val M = 256

  /** Working columns the sketch schema claims for itself: `bucket` and
    * `rank` ARE the sketch (merge re-aggregates them), `sp`/`nb` are
    * built by [[estimate]]. A key column with one of these names would
    * silently mis-group, so it's rejected loudly instead. */
  private val Reserved = Seq("bucket", "rank", "sp", "nb")

  private def checkKeys(keys: Seq[String], fn: String): Unit = {
    val clash = keys.intersect(Reserved)
    require(clash.isEmpty,
      s"Hll.$fn: key column(s) ${clash.mkString(", ")} collide with the " +
        s"sketch's working columns (${Reserved.mkString(", ")}); rename them")
  }

  private def alpha: Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))

  /** Per-row (bucket, rank) of the value's hash. */
  private def bucketRank(value: Column): (Column, Column) = {
    val h = PolyHash64(md5(value.cast("string")))
    // h < 2^60 exceeds double's mantissa — shift, never divide-and-cast
    val w = shiftright(h, 8)
    (pmod(h, lit(256L)).as("bucket"),
      when(w === 0, lit(53)).otherwise(lit(53) - length(bin(w))).as("rank"))
  }

  /** The mergeable sketch: one row per (keys..., bucket) with the max
    * rank observed. Union two sketches and re-run `max(rank)` per
    * bucket to merge them. */
  def sketch(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    checkKeys(keys, "sketch")
    val (bucket, rank) = bucketRank(value)
    df.select(keys.map(col) :+ bucket :+ rank: _*)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(max("rank").as("rank"))
  }

  /** Merge two sketches over the same key space (bucket-wise max). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    checkKeys(keys, "merge")
    a.unionByName(b)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(max("rank").as("rank"))
  }

  /** Finalize a sketch into (keys..., nb, hll_est): nb = buckets hit,
    * hll_est = alpha * m^2 / sum(2^-M) with unseen buckets at M=0 —
    * switched to linear counting (m * ln(m/empty)) in the small range
    * (raw <= 2.5m, the standard HLL correction; the raw estimator
    * overshoots badly when most buckets are empty). Rounded to 4
    * decimals. The denominator is summed as exact longs (scaled by
    * 2^53) before the single double division. */
  def estimate(sk: DataFrame, keys: Seq[String]): DataFrame = {
    checkKeys(keys, "estimate")
    val two53 = 9007199254740992L // 2^53
    val raw = alpha * lit(65536.0) * lit(two53.toDouble) /
      (col("sp") + (lit(256L) - col("nb")) * lit(two53)).cast("double")
    val linear = lit(256.0) *
      log(lit(256.0) / (lit(256L) - col("nb")).cast("double"))
    sk.groupBy(keys.map(col): _*)
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - rank AS INT))"))
          .as("sp"),
        count(lit(1)).as("nb"))
      .select(keys.map(col) :+ col("nb") :+
        round(when(raw <= lit(640.0) && col("nb") < 256, linear)
          .otherwise(raw), 4).as("hll_est"): _*)
  }

  /** sketch + estimate in one call. */
  def distinctEstimate(df: DataFrame, keys: Seq[String],
      value: Column): DataFrame =
    estimate(sketch(df, keys, value), keys)
}
