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

  /** Append BOTH the 1-based global rank AND the INCLUSIVE global
    * running sum of LongType `valueCol` under `sortCols` — i.e.
    * `sum(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` without
    * the `Exchange SinglePartition` that window would plan. The
    * zipWithIndex two-job pattern generalized: job 1 reads ONE
    * (row count, value sum) pair per range-sorted partition (a bounded
    * numPartitions-row driver collect — the prefix offsets fold from
    * it for free, and so does the GRAND TOTAL, returned alongside so
    * callers need no extra pass); job 2 re-reads the same shuffle map
    * outputs and adds each partition's offsets to its local running
    * rank/sum. Returns (frame with rankCol + prefixCol appended,
    * total sum of valueCol). Same total-order caveat as
    * [[withGlobalRank]], and the same cost model: the offsets job and
    * the output job each read the sorted shuffle map outputs, so the
    * range exchange is paid once but the sorted data is deserialized
    * twice.
    *
    * `valueCol` must be a NON-NULLABLE LongType: both jobs read it with
    * `getLong`, which would NPE mid-job on a null. Guarded at
    * construction — callers with a nullable-but-clean column must
    * assert that themselves (`coalesce`/`na.fill` before calling). */
  def withRankAndPrefixSum(df: DataFrame, sortCols: Seq[Column],
      valueCol: String, rankCol: String, prefixCol: String,
      numPartitions: Int = 0): (DataFrame, Long) = {
    require(!df.schema(valueCol).nullable,
      s"RangeRank.withRankAndPrefixSum: '$valueCol' is nullable — a " +
        "null would NPE in getLong mid-job; coalesce/na.fill it first")
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = rangeSorted(df, sortCols, n)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val parts = rdd.mapPartitionsWithIndex { (i, it) =>
      var cnt = 0L; var sum = 0L
      it.foreach { r => cnt += 1L; sum += r.getLong(vIdx) }
      Iterator((i, cnt, sum))
    }.collect() // bounded: one row per partition
    val nParts = rdd.getNumPartitions
    val rankOff = new Array[Long](nParts)
    val sumOff = new Array[Long](nParts)
    var rAcc = 0L; var sAcc = 0L
    parts.sortBy(_._1).foreach { case (i, cnt, sum) =>
      rankOff(i) = rAcc; sumOff(i) = sAcc
      rAcc += cnt; sAcc += sum
    }
    val total = sAcc
    val schema = sorted.schema
      .add(rankCol, LongType, nullable = false)
      .add(prefixCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var rank = rankOff(i); var cum = sumOff(i)
      it.map { row =>
        rank += 1L; cum += row.getLong(vIdx)
        Row.fromSeq(row.toSeq :+ rank :+ cum)
      }
    }
    (spark.createDataFrame(out, schema), total)
  }
}
