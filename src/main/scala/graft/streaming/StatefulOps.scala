package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via KeyValueGroupedDataset (SURVEY.md's
  * mapGroups/flatMapGroupsWithState extension point): operators whose
  * state transitions the built-in aggregates can't express. Runs on the
  * streaming state store (RocksDB-capable) with per-key state bounded
  * by the timeout configuration.
  */
object StatefulOps {

  final case class KeyedReading(key: String, ts: Long, value: Double)

  /** Running per-key tracker: count, running max timestamp, and the
    * value at that max — a custom "latest + count" state machine. */
  final case class TrackState(n: Long, maxTs: Long, lastValue: Double)

  final case class TrackOutput(key: String, n: Long, maxTs: Long,
      lastValue: Double)

  /** flatMapGroupsWithState update-mode tracker: emits the refreshed
    * state for every key touched in the micro-batch. */
  def track(spark: SparkSession, readings: Dataset[KeyedReading])
      : Dataset[TrackOutput] = {
    import spark.implicits._
    readings
      .groupByKey(_.key)
      .flatMapGroupsWithState[TrackState, TrackOutput](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[KeyedReading],
            state: GroupState[TrackState]) =>
          val prev = state.getOption.getOrElse(TrackState(0L, Long.MinValue, 0.0))
          val next = rows.foldLeft(prev) { (s, r) =>
            if (r.ts > s.maxTs) TrackState(s.n + 1, r.ts, r.value)
            else s.copy(n = s.n + 1)
          }
          state.update(next)
          Iterator.single(TrackOutput(key, next.n, next.maxTs, next.lastValue))
      }
  }
}
