package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.{Dims, Medallion}
import graft.sources.Tables

/** Second pipeline wave: the custom-metric cycle ([G4]:168-280) and the
  * max-over-window latest variant (W2, [O5D]:105-119).
  */
object PipelineQueries2 {

  /** Oracle CTE for the custom SUM metrics: source gold rows joined to
    * the custom-metric map, re-aggregated under the custom id, then
    * unit-renormalized with conditional id rewrite — value arithmetic
    * in DOUBLE with the same operation order as the Spark side. */
  private val customCte =
    """,cmap(cm, mapping_id) AS (VALUES
      |  (9101, 9001), (9101, 9003), (9102, 9011), (9102, 9013)),
      |custom AS (
      |  SELECT unix_timestamp, datestamp, remote_id, provider_id, category_id,
      |         CASE WHEN cm = 9101 AND provider_id = 3 THEN 9103
      |              WHEN cm = 9102 THEN 9104 ELSE cm END AS metric_id,
      |         CASE WHEN cm = 9101 AND provider_id = 3 THEN v * 1000
      |              WHEN cm = 9102 AND provider_id = 3 THEN v / 60 * 1000
      |              WHEN cm = 9102 AND provider_id IN (1, 2) THEN v / 300
      |              ELSE v END AS value_double
      |  FROM (
      |    SELECT unix_timestamp, datestamp, remote_id, provider_id,
      |           category_id, cm, CAST(sum(value_double) AS DOUBLE) AS v
      |    FROM gold JOIN cmap ON metric_id = mapping_id
      |    GROUP BY 1, 2, 3, 4, 5, 6))
      |""".stripMargin

  private def sfGold(s: org.apache.spark.sql.SparkSession, d: String) =
    Medallion.gold(Medallion.silver(Tables.events(s, d)),
      Dims.metricMappings(s), Dims.deviceHistory(s))

  val all: Map[String, Q] = Map(

    // custom SUM metrics with unit renormalization + id rewrite.
    "p10_custom_sum" -> Q(
      PipelineQueries.ctes + customCte +
        """SELECT remote_id, metric_id, provider_id, category_id,
          |       unix_timestamp, datestamp, value_double
          |FROM custom
          |ORDER BY remote_id, metric_id, provider_id, unix_timestamp"""
          .stripMargin) { (s, d) =>
      Medallion.customSumMetrics(sfGold(s, d), Dims.customMetrics(s))
        .select("remote_id", "metric_id", "provider_id", "category_id",
          "unix_timestamp", "datestamp", "value_double")
        .orderBy("remote_id", "metric_id", "provider_id", "unix_timestamp")
    },

    // the gold -> custom -> gold re-ingest cycle, reconciled per metric.
    "p11_gold_cycle" -> Q(
      PipelineQueries.ctes + customCte +
        """SELECT metric_id, count(*) AS n,
          |       round(sum(CAST(value_double AS DOUBLE)), 2) AS total
          |FROM (
          |  SELECT metric_id, value_double FROM gold
          |  UNION ALL
          |  SELECT metric_id, value_double FROM custom)
          |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Medallion.goldWithCustom(sfGold(s, d), Dims.customMetrics(s))
        .groupBy("metric_id")
        .agg(count(lit(1)).as("n"),
          round(sum("value_double"), 2).as("total"))
        .orderBy("metric_id")
    },

    // ASM serial-indexed gold branch ([G4]:106-147): the second gold
    // output for the ASM provider, keyed by serialnumber instead of the
    // history-resolved remote — no temporal join on this path.
    "p15_gold_serial" -> Q(
      PipelineQueries.ctes +
        """SELECT element, CAST(unix_ts AS BIGINT) AS unix_timestamp,
          |       datestamp, metric,
          |       CAST(CASE WHEN agg_type IN ('SUM','AVG')
          |            THEN CAST(value AS DECIMAL(30,15)) END AS DOUBLE)
          |         AS value_double,
          |       CASE WHEN agg_type NOT IN ('SUM','AVG')
          |            THEN value END AS value_string,
          |       metric_id, metric_provider_id AS provider_id,
          |       category_id, serialnumber AS remote_id, agg_type
          |FROM silver JOIN mappings ON metric = raw_symbol
          |WHERE metric_provider_id = 2
          |ORDER BY element, metric""".stripMargin) { (s, d) =>
      Medallion.goldSerial(Medallion.silver(Tables.events(s, d)),
          Dims.metricMappings(s))
        .withColumn("value_double", col("value_double").cast("double"))
        .orderBy("element", "metric")
    },

    // Gold-integrated custom JOIN metric: lat+long pair assembly per
    // (ts, remote, provider) with last-known-value fill — the
    // distributed replacement for the reference's Redis driver loop
    // (`Gold state/Step 06c ...scala:63-116`).
    "p16_join_metric_gold" -> Q(
      PipelineQueries.ctes +
        """,jsrc AS (
          |  SELECT unix_timestamp, datestamp, remote_id, provider_id,
          |         max(CASE WHEN metric_id = 9004 THEN value_string END)
          |           AS lat_now,
          |         max(CASE WHEN metric_id = 9015 THEN value_string END)
          |           AS lon_now
          |  FROM gold WHERE metric_id IN (9004, 9015)
          |  GROUP BY 1, 2, 3, 4),
          |jfill AS (
          |  SELECT unix_timestamp, datestamp, remote_id, provider_id,
          |         coalesce(last_value(lat_now IGNORE NULLS) OVER w, '0')
          |           AS lat,
          |         coalesce(last_value(lon_now IGNORE NULLS) OVER w, '0')
          |           AS lon
          |  FROM jsrc
          |  WINDOW w AS (PARTITION BY remote_id, provider_id
          |               ORDER BY unix_timestamp
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |SELECT CAST(NULL AS VARCHAR) AS element, unix_timestamp,
          |       datestamp, CAST(NULL AS VARCHAR) AS metric,
          |       CAST(NULL AS DOUBLE) AS value_double,
          |       lat || ',' || lon AS value_string,
          |       CAST(9105 AS BIGINT) AS metric_id, provider_id,
          |       CAST(4 AS BIGINT) AS category_id,
          |       remote_id, 'JOIN' AS agg_type
          |FROM jfill
          |ORDER BY remote_id, provider_id, unix_timestamp""".stripMargin) {
        (s, d) =>
      Medallion.customJoinMetrics(sfGold(s, d))
        .withColumn("value_double", col("value_double").cast("double"))
        .orderBy("remote_id", "provider_id", "unix_timestamp")
    },

    // Gold via as-of temporal resolution (no history broadcast): must
    // reproduce p02's interval-join gold bit-for-bit — same oracle.
    // The 100 TB path when the device-history dim outgrows a broadcast.
    "p17_gold_asof" -> Q(
      PipelineQueries.ctes +
        """SELECT element, unix_timestamp, datestamp, metric,
          |       CAST(value_double AS DOUBLE) AS value_double,
          |       value_string, metric_id, provider_id, category_id,
          |       remote_id, agg_type
          |FROM gold ORDER BY element, metric""".stripMargin) { (s, d) =>
      Medallion.goldAsOf(Medallion.silver(Tables.events(s, d)),
          Dims.metricMappings(s), Dims.deviceHistory(s))
        .withColumn("value_double", col("value_double").cast("double"))
        .orderBy("element", "metric")
    },

    // SCD2 -> as-of COMPOSITION (the reference's actual topology: the
    // dim-maintenance notebook [SU]:77-96 feeds the gold resolution
    // join [G4]:65 — p20 showed the maintain half, p02/p17 the join
    // half against a STATIC dim; this chains them): the device-history
    // dim is BUILT by Scd2.applyChanges from a change log, in two
    // time-ordered batches, and gold resolves against the RESULT via
    // the as-of carry-forward join. Must reproduce p02's interval-join
    // gold bit-for-bit — same oracle, which therefore certifies the
    // whole maintain-then-join chain end to end.
    "p21_scd2_asof_gold" -> Q(
      PipelineQueries.ctes +
        """SELECT element, unix_timestamp, datestamp, metric,
          |       CAST(value_double AS DOUBLE) AS value_double,
          |       value_string, metric_id, provider_id, category_id,
          |       remote_id, agg_type
          |FROM gold ORDER BY element, metric""".stripMargin) { (s, d) =>
      import graft.operators.Scd2
      val keys = Seq("serial")
      val attrs = Seq("remote_id")
      val changes = Dims.deviceHistoryChanges(s)
      val dim0 = Scd2.applyChanges(
        Scd2.emptyDim(changes, keys, attrs, "t"),
        changes.filter(col("t") < Dims.IntervalSplit),
        keys, attrs, "t", "seq")
      val dim = Scd2.applyChanges(dim0,
        changes.filter(col("t") >= Dims.IntervalSplit),
        keys, attrs, "t", "seq")
      val history = dim.select(col("serial"), col("remote_id"),
        col("valid_from").as("added_on"), col("valid_to").as("removed_on"))
      Medallion.goldAsOf(Medallion.silver(Tables.events(s, d)),
          Dims.metricMappings(s), history)
        .withColumn("value_double", col("value_double").cast("double"))
        .orderBy("element", "metric")
    },

    // Dim-refresh repair flow (reference Set Up Delta Tables/...Slowly
    // changing Data.scala:84-96): detect duplicate ACTIVE device-history
    // groups, drop the affected serials via anti join (the reference's
    // except + collect + isin, distributed), yielding the repaired dim
    // an idempotent overwrite then persists. Dup rows are a
    // deterministic fixture (every 10th serial double-writes its open
    // interval) since the clean dim has none to repair.
    "p18_dim_repair" -> Q(
      """WITH history AS (
        |  SELECT 'SN'||u AS serial, 'R'||u||'a' AS remote_id,
        |         CAST(1704067200 AS BIGINT) AS added_on,
        |         CAST(1705363200 AS BIGINT) AS removed_on
        |  FROM range(0,140) t(u)
        |  UNION ALL
        |  SELECT 'SN'||u, 'R'||u||'b', 1705363200, NULL FROM range(0,140) t(u)),
        |corrupt AS (
        |  SELECT * FROM history
        |  UNION ALL
        |  SELECT 'SN'||u, 'R'||u||'b', 1705363200, NULL
        |  FROM range(0,140) t(u) WHERE u % 10 = 0),
        |bad AS (
        |  SELECT serial FROM corrupt WHERE removed_on IS NULL
        |  GROUP BY serial, remote_id HAVING count(*) > 1)
        |SELECT serial, remote_id, added_on, removed_on
        |FROM corrupt WHERE serial NOT IN (SELECT serial FROM bad)
        |ORDER BY serial, remote_id, added_on""".stripMargin) { (s, _) =>
      Dims.repairDupActive(Dims.deviceHistoryWithDups(s))
        .select("serial", "remote_id", "added_on", "removed_on")
        .orderBy("serial", "remote_id", "added_on")
    },

    // W2 max-over-window latest variant: window max + equality filter
    // instead of row_number (the reference's commented alternative).
    "q29_max_over_window" -> Q(
      """SELECT user_id, event_type, max_ts, count(*) AS n_at_max
        |FROM (
        |  SELECT user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         max(CAST(floor(epoch(ts)) AS BIGINT))
        |           OVER (PARTITION BY user_id, event_type) AS max_ts
        |  FROM events)
        |WHERE ts_s = max_ts
        |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id", "event_type")
      Tables.events(s, d)
        .withColumn("ts_s", unix_timestamp(col("ts")))
        .withColumn("max_ts", max(col("ts_s")).over(w))
        .filter(col("ts_s") === col("max_ts"))
        .groupBy("user_id", "event_type", "max_ts")
        .agg(count(lit(1)).as("n_at_max"))
        .orderBy("user_id", "event_type")
    }
  )
}
