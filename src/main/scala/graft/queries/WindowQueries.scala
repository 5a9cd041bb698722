package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{GapFill, Sessionize}
import graft.sources.Tables

/** Ordered-window analytics over the event stream: reading-to-reading
  * deltas, running totals, quantile bucketing, and grid resampling with
  * forward fill — the time-series questions a telemetry store answers
  * constantly. All windows order by a UNIQUE (ts, event_id) key so both
  * engines resolve ties identically, and arithmetic that must hash-match
  * runs in DECIMAL internally with DOUBLE only at the query edge.
  */
object WindowQueries {

  val all: Map[String, Q] = Map(

    // per-device deltas: value change and seconds elapsed since the
    // previous reading. DECIMAL subtraction keeps the delta exact.
    "q37_lag_delta" -> Q(
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events)
        |SELECT user_id, event_id, ts_s,
        |       CAST(v - lag(v) OVER w AS DOUBLE) AS delta,
        |       ts_s - lag(ts_s) OVER w AS gap_s
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
      e.select(col("user_id"), col("event_id"), col("ts_s"),
          (col("v") - lag(col("v"), 1).over(w)).cast("double").as("delta"),
          (col("ts_s") - lag(col("ts_s"), 1).over(w)).as("gap_s"))
        .orderBy("user_id", "event_id")
    },

    // running total + trailing 4-reading moving average per event type.
    // The running sum is DECIMAL (order-independent, exact on both
    // engines); the average divides that exact sum as DOUBLE.
    "q38_running_total" -> Q(
      """WITH e AS (
        |  SELECT event_type, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events)
        |SELECT event_type, event_id, ts_s,
        |       CAST(sum(v) OVER (PARTITION BY event_type
        |              ORDER BY ts_s, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS run_total,
        |       CAST(sum(v) OVER w4 AS DOUBLE) / count(v) OVER w4 AS mavg4
        |FROM e
        |WINDOW w4 AS (PARTITION BY event_type ORDER BY ts_s, event_id
        |              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(
        col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      val w = Window.partitionBy("event_type").orderBy("ts_s", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w4 = w.rowsBetween(-3, 0)
      e.select(col("event_type"), col("event_id"), col("ts_s"),
          sum("v").over(wRun).cast("double").as("run_total"),
          (sum("v").over(w4).cast("double") / count("v").over(w4)).as("mavg4"))
        .orderBy("event_type", "event_id")
    },

    // quantile bucketing: quartile assignment + percent_rank per event
    // type, over the unique (value, event_id) total order. Both engines
    // define ntile by front-loaded remainder buckets and percent_rank
    // as (rank-1)/(n-1), so the outputs match bit-for-bit.
    "q39_quantile_buckets" -> Q(
      """SELECT event_type, event_id,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pr
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"))
        .orderBy("event_type", "event_id")
    },

    // hourly grid resample with forward fill (graft.operators.GapFill):
    // one row per (device, hour) from first to last observation, the
    // last reading of each hour carried across silent hours.
    "q40_gap_fill" -> Q(
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         value
        |  FROM events WHERE user_id < 10),
        |obs AS (
        |  SELECT user_id, ts_s - ts_s % 3600 AS bucket_ts, value,
        |         row_number() OVER (PARTITION BY user_id, ts_s - ts_s % 3600
        |                            ORDER BY ts_s DESC, event_id DESC) AS rn
        |  FROM e),
        |last_obs AS (
        |  SELECT user_id, bucket_ts, value, 1 AS obs FROM obs WHERE rn = 1),
        |bounds AS (
        |  SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
        |  FROM last_obs GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, 3600)) AS bucket_ts
        |  FROM bounds)
        |SELECT g.user_id, g.bucket_ts,
        |       last_value(o.value IGNORE NULLS) OVER (
        |         PARTITION BY g.user_id ORDER BY g.bucket_ts
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS value_filled,
        |       CAST(coalesce(o.obs, 0) AS BIGINT) AS observed
        |FROM grid g LEFT JOIN last_obs o
        |  ON g.user_id = o.user_id AND g.bucket_ts = o.bucket_ts
        |ORDER BY g.user_id, g.bucket_ts""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).filter(col("user_id") < 10)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_s"), col("value"))
      GapFill.resample(e, "user_id", "ts_s", "value", 3600L,
          tieBreak = Seq("event_id"))
        .select(col("user_id"), col("bucket_ts"),
          col("value").as("value_filled"), col("observed"))
        .orderBy("user_id", "bucket_ts")
    },

    // gap-based batch sessionization (graft.operators.Sessionize): a
    // silence > 30 min starts a new per-device session; sessions are
    // then rolled up to (count, bounds, duration). One shuffle by key,
    // per-key state = one previous timestamp.
    "q41_sessionize" -> Q(
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_s,
        |         CASE WHEN lag(ts_s) OVER w IS NULL
        |                OR ts_s - lag(ts_s) OVER w > 1800
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |sess AS (
        |  SELECT user_id, ts_s,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id
        |           ORDER BY ts_s, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_seq
        |  FROM f)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |       min(ts_s) AS start_s, max(ts_s) AS end_s,
        |       max(ts_s) - min(ts_s) AS dur_s
        |FROM sess GROUP BY 1, 2
        |ORDER BY user_id, session_seq""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"))
      Sessionize.sessionize(e, Seq("user_id"), "ts_s", 1800L,
          orderCols = Seq("event_id"))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min("ts_s").as("start_s"), max("ts_s").as("end_s"),
          (max("ts_s") - min("ts_s")).as("dur_s"))
        .orderBy("user_id", "session_seq")
    },

    // time-based RANGE frame: trailing 1-hour event count and DECIMAL
    // sum per device, at every reading. RANGE (not ROWS) frames include
    // all peers of a timestamp, so the result is tie-insensitive —
    // the rolling-window telemetry shape (readings per trailing hour)
    // q38's row-count frames cannot express.
    "q46_range_frame" -> Q(
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events)
        |SELECT user_id, event_id, ts_s,
        |       count(*) OVER w AS n_1h,
        |       CAST(sum(v) OVER w AS DOUBLE) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      val w = Window.partitionBy("user_id").orderBy("ts_s")
        .rangeBetween(-3600L, Window.currentRow)
      e.select(col("user_id"), col("event_id"), col("ts_s"),
          count(lit(1)).over(w).as("n_1h"),
          sum("v").over(w).cast("double").as("sum_1h"))
        .orderBy("user_id", "event_id")
    },

    // distribution ranks, completing the window-function family beyond
    // lag/sum/quantile/range frames: ntile quartiles, percent_rank and
    // cume_dist per event type. The order key carries an event_id
    // tie-break so no two rows are peers — every rank is deterministic,
    // and pr/cd are exact rationals both engines render identically
    // after rounding.
    "q50_window_ranks" -> Q(
      """SELECT event_id, event_type,
        |       ntile(4) OVER w AS quartile,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      Tables.events(s, d).select(
          col("event_id"), col("event_type"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("event_id")
    },

    // first-order Markov transition model over per-user event
    // sequences: lag() within (user ORDER BY ts, event_id) yields the
    // predecessor state, then one hash-agg counts each (prev -> next)
    // transition and a per-prev window normalizes to integer ppm
    // probabilities. One shuffle by user for the sequencing, one by
    // prev-state for the normalization — both keyed, both bounded by
    // #states² output rows, so the model table stays tiny at any
    // corpus size. START marks sequence heads (the standard absorbing
    // boundary state).
    "q55_markov_transitions" -> Q(
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (
        |           PARTITION BY user_id
        |           ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
        |           AS prev
        |  FROM events),
        |tr AS (
        |  SELECT COALESCE(prev, 'START') AS prev, event_type AS next,
        |         count(*) AS n
        |  FROM seq GROUP BY 1, 2)
        |SELECT prev, next, n,
        |       (n * 1000000)
        |         // CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT) AS p_ppm
        |FROM tr ORDER BY prev, next""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_s"), col("event_id"))
      val tr = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_s"), col("event_id"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .groupBy(coalesce(col("prev"), lit("START")).as("prev"),
          col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
      tr.withColumn("p_ppm",
          expr("(n * 1000000) div sum(n) over (partition by prev)"))
        .orderBy("prev", "next")
    })
}
