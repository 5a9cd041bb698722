package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based batch sessionization: consecutive rows of the same key
  * whose timestamps are within `gap` of each other share a session; a
  * silence longer than `gap` starts a new one. The batch counterpart of
  * the streaming session window (`graft.queries.StreamingQueries`
  * st05) — the reference sessionizes connection telemetry the same way
  * a training pipeline sessionizes user activity logs.
  *
  * Execution shape: ONE shuffle by key, then two sorted-window passes
  * over each partition (lag to flag session starts, running sum to
  * number them). State per key is a single previous-row value, so the
  * plan is insensitive to session length and survives arbitrarily many
  * rows per key — no per-session buffering, no driver state. Both
  * window functions share the same (key, ts, order) sort order, so
  * Catalyst plans them in a single Window exec without re-sorting.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key, LongType). `tsCol` must be
    * numeric (e.g. epoch seconds) and `gap` in the same unit; rows
    * exactly `gap` apart stay in one session, `> gap` splits.
    * `orderCols` break timestamp ties deterministically — pass a unique
    * column (an event id) whenever timestamps can collide.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String, gap: Long,
      orderCols: Seq[String] = Seq.empty): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(gap > 0, s"session gap must be positive, got $gap")
    require(!df.columns.contains("session_seq"),
      "input already has a session_seq column; rename it first")
    val order: Seq[Column] = (tsCol +: orderCols).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsCol) - prev > gap, 1L)
      .otherwise(0L)
    df.withColumn("session_seq", sum(isNew).over(run))
  }
}
