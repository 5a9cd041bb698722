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
  * `tieBreak` (payload column names) ascending — the largest tiebreak
  * value wins the carry. All ordering columns are non-null on the side
  * where they decide order, so Spark/DuckDB null-ordering differences
  * never bite.
  *
  * The payload travels as ONE nullable struct, carried atomically by a
  * single `last(_, ignoreNulls)`: per-column carries would be wrong
  * whenever a payload field is legitimately null (an open-ended
  * `removed_on`, say) — ignoreNulls would reach past the matched row
  * and stitch that field from an OLDER right row.
  */
object AsOfJoin {

  private val Reserved = Set("__ts", "__tag", "__payload")

  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(tieBreak.forall(payload.contains),
      "tieBreak columns must be payload columns")
    val clash = (left.columns ++ right.columns).filter(Reserved).distinct
    require(clash.isEmpty,
      s"as-of join reserves helper columns ${Reserved.mkString(", ")}; " +
        s"rename input columns: ${clash.mkString(", ")}")
    val dup = payload.intersect(left.columns.toSeq)
    require(dup.isEmpty,
      "payload columns must not collide with left columns (the output " +
        s"carries both): ${dup.mkString(", ")}")
    // NOTE: if right rows can share (key, rightTs), pass a tieBreak —
    // with it empty, which of the tied rows is carried is partition-
    // order-dependent and therefore nondeterministic.
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = leftCols.filterNot(_ == key).foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__tag", lit(0))
        .withColumn("__payload", struct(payload.map(col): _*))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val order = (Seq("__ts", "__tag").map(col) ++
      tieBreak.map(t => col("__payload").getField(t)))
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(col("__tag") +: leftCols.map(col) :+
        last(col("__payload"), ignoreNulls = true).over(w).as("__payload"): _*)
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__payload").getField(p).as(p)): _*)
  }
}
