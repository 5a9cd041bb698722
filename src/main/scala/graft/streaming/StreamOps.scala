package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Streaming building blocks (SURVEY.md §2.11). All helpers are plain
  * DataFrame transforms so they compose with both streaming and batch
  * frames (batch: watermark is a no-op).
  */
object StreamOps {

  /** ST1 keyed dedup with bounded state: sha1 fingerprint over
    * `keyCols`, `withWatermark(tsCol, retention)` then
    * `dropDuplicates` on the key — the exactly-once-ish guard every
    * bronze/silver table applies (`Bronze-Silver/Part1 ...scala:68-70`;
    * retention 10 s – 750 h per table, kept as data like the
    * reference's Configuration notebook). */
  def watermarkDedup(df: DataFrame, tsCol: String, retention: String,
      tag: String, keyCols: Seq[Column]): DataFrame =
    df.withColumn("__dedup_key", Fns.dedupKey(tag, keyCols: _*))
      .withWatermark(tsCol, retention)
      // the event-time column MUST be in the dedup subset or Spark
      // never evicts dedup state on watermark advance (unbounded
      // state); true duplicates carry identical event times, so
      // semantics are unchanged — this matches the reference, whose
      // hash keys embed the timestamp
      .dropDuplicates("__dedup_key", tsCol)
      .drop("__dedup_key")

  /** ST4 late-data admission gate: drop events older than `maxAgeSec`
    * relative to `now` (injectable for deterministic tests; the
    * reference pins wall clock, `Part2:52,272`). */
  def lateDataGate(df: DataFrame, tsCol: String, maxAgeSec: Long,
      now: Column = current_timestamp()): DataFrame =
    df.filter(unix_timestamp(col(tsCol)) > unix_timestamp(now) - maxAgeSec)
}
