package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global rank: `row_number() OVER (ORDER BY ...)` without
  * the single reducer.
  *
  * A no-partition ranking window plans `Window ← Sort ← Exchange
  * SinglePartition` — WindowExec demands AllTuples, so EVERY row of
  * the input funnels through one task; at corpus scale that is the one
  * plan shape that cannot ship. This operator computes the identical
  * rank from the plan a global sort actually uses:
  *
  *  1. `repartitionByRange` on the sort key — sampled bounds, every
  *     partition holds a disjoint key range, partition i's keys all
  *     precede partition i+1's (the same exchange a plain `ORDER BY`
  *     plans);
  *  2. `sortWithinPartitions` — partition-local sort, no data motion;
  *  3. `zipWithIndex` over the sorted partitions — Spark's count job
  *     reads per-partition sizes, the follow-up pass adds the
  *     cumulative offset of the preceding partitions to each row's
  *     local position. Both jobs read the SAME shuffle map outputs
  *     (one physical RDD), so the range exchange is paid once; the
  *     count job itself moves one long per partition.
  *
  * rank(row) = |rows ordered strictly before it| + 1 whatever the
  * partition bounds, so the result is exact and reproducible run to
  * run and cluster size to cluster size — PROVIDED `sortCols` is a
  * total order (include a unique tiebreak column; equal keys straddling
  * a partition boundary would otherwise rank nondeterministically).
  *
  * The zip step leaves whole-stage codegen for one row-copy pass
  * (`df.rdd` externalizes rows); acceptable here because a global rank
  * is a terminal materialization — the epoch-shuffle writer, the
  * report sort — not a mid-plan operator.
  */
object RangeRank {

  /** The range-partitioned local sort rank sits on — exposed so plan
    * specs can assert the exchange is `rangepartitioning`, never
    * `SinglePartition`. */
  def rangeSorted(df: DataFrame, sortCols: Seq[Column],
      numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)

  /** Append `rankCol` = the 1-based global rank of each row under
    * `sortCols` (which must totally order the rows — see class doc). */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = rangeSorted(df, sortCols, n)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
