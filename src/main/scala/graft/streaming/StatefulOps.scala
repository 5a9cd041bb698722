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
    * state for every key touched in the micro-batch.
    *
    * `idleTimeout` (e.g. "30 minutes") evicts the state of keys that
    * receive no data for that processing-time duration — the bound that
    * keeps long-running high-cardinality streams from growing state
    * forever. `None` keeps state for the lifetime of the query (only
    * appropriate for bounded key domains like device fleets). */
  def track(spark: SparkSession, readings: Dataset[KeyedReading],
      idleTimeout: Option[String] = None): Dataset[TrackOutput] = {
    import spark.implicits._
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout()
    else GroupStateTimeout.NoTimeout()
    readings
      .groupByKey(_.key)
      .flatMapGroupsWithState[TrackState, TrackOutput](
        OutputMode.Update(), timeoutConf) {
        (key: String, rows: Iterator[KeyedReading],
            state: GroupState[TrackState]) =>
          if (state.hasTimedOut) {
            // idle key: drop its state; counts restart if it returns
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(TrackState(0L, Long.MinValue, 0.0))
            val next = rows.foldLeft(prev) { (s, r) =>
              if (r.ts > s.maxTs) TrackState(s.n + 1, r.ts, r.value)
              else s.copy(n = s.n + 1)
            }
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(TrackOutput(key, next.n, next.maxTs, next.lastValue))
          }
      }
  }
}
