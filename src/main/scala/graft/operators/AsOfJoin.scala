package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks up the payload of the latest right
  * row with the same key and `rightTs <= leftTs`. The reference reaches
  * for this shape whenever a reading must be attributed to the
  * most-recent state change at its timestamp — the device-history
  * resolution join (`Gold state/Step 04-04b - Gold Phase Raw and custom
  * metric.scala:58-75`) is the interval-materialized special case
  * (see `graft.pipeline.Medallion.gold`).
  *
  * Execution shape — union-tag + carry-forward, NOT a range join:
  * tag right rows 0 and left rows 1, union, shuffle ONCE by key, sort
  * each partition by (ts, tag, tiebreak), and carry the last non-null
  * payload forward with a running `last(_, ignoreNulls)` window. Cost
  * is one shuffle + one sorted scan of |L|+|R| — no per-row probe, no
  * O(|L|x|R|) range-join blowup, state per key is just the carried
  * payload. This is the plan that survives 100 TB; a broadcast range
  * join only works while one side stays small.
  *
  * Tie semantics: a right row AT the left row's timestamp is visible
  * (tag 0 sorts before tag 1); right rows sharing (key, ts) resolve by
  * `tieBreak` ascending — the largest tiebreak value wins the carry.
  * All ordering columns are non-null on the side where they decide
  * order, so Spark/DuckDB null-ordering differences never bite.
  */
object AsOfJoin {

  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema
    val l = payload.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__tag", lit(1))) {
      (df, p) => df.withColumn(p, lit(null).cast(rightSchema(p).dataType))
    }
    val r = leftCols.filterNot(_ == key).foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__tag", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val order = (Seq("__ts", "__tag") ++ tieBreak).map(col)
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all carries in ONE projection -> one Window operator over one
    // sorted pass (a per-column fold plans a Window chain instead)
    l.unionByName(r)
      .select(col("__tag") +: (leftCols.map(col) ++
        payload.map(p => last(col(p), ignoreNulls = true).over(w).as(p))): _*)
      .filter(col("__tag") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
