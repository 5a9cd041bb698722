package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a broadcast and without a
  * nested-loop: both sides are bucketed onto a shared time grid and
  * equi-joined on the bucket, with the exact range predicate applied as
  * a post-join filter. The reference's temporal device-history join
  * (`Gold state/Step 04-04b - Gold Phase Raw and custom metric
  * .scala:58-75`) broadcasts its small interval side
  * (`graft.pipeline.Medallion.gold`); THIS operator is the shape for
  * when neither side fits in memory — both sides shuffle once on
  * (equi-keys, bin), so Spark plans a plain SortMergeJoin and scales
  * horizontally.
  *
  * Replication cost: each interval is duplicated into
  * ceil(len/binSize)+1 bins, each point into exactly one — choose
  * `binSize` near the typical interval length so the blow-up stays ~2x.
  * A point and an interval meet in exactly one bin (the point's), so no
  * pair is emitted twice and no distinct pass is needed.
  */
object RangeJoin {

  /** Joins each point row to every interval row with
    * `lo <= pt < hi` (half-open) and matching `equiKeys`. Point/interval
    * columns must be integral (e.g. epoch seconds); all non-key column
    * names must be disjoint between the two sides. Intervals with
    * `hi <= lo` are empty and match nothing.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, binSize: Long,
      equiKeys: Seq[String] = Seq.empty): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    val overlap = (points.columns.toSet - "__bin")
      .intersect(intervals.columns.toSet) -- equiKeys
    require(overlap.isEmpty,
      s"non-key columns must be disjoint: ${overlap.mkString(", ")}")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "__bin is reserved by pointInInterval; rename input columns")
    def bin(c: Column): Column = floor(c / binSize).cast("long")
    val p = points.withColumn("__bin", bin(col(ptCol)))
    // empty intervals are dropped up front: sequence() would otherwise
    // run DESCENDING for hi < lo and flood the join with junk buckets.
    // One row per grid bucket the interval touches; hi is exclusive so
    // an interval ending exactly on a bucket edge does not spill into it
    val i = intervals.where(col(hiCol) > col(loCol)).withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol) - 1))))
    val cond = (Seq("__bin") ++ equiKeys)
      .map(k => p(k) === i(k))
      .reduce(_ && _) && p(ptCol) >= i(loCol) && p(ptCol) < i(hiCol)
    equiKeys.foldLeft(
      p.join(i, cond).drop(p("__bin")).drop(i("__bin"))) {
      (df, k) => df.drop(i(k))
    }
  }
}
