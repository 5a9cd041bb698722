package graft.queries

import org.apache.spark.sql.functions._
import graft.pipeline.{Dims, Medallion}
import graft.sources.Tables

/** End-to-end medallion pipeline queries (SURVEY.md §3): silver unpivot,
  * gold temporal enrichment (JN4), hour/day/month rollups (A1/A2), latest
  * snapshot (W1), orphan detection (JN6/JN10), reconciliation (A8) and
  * delay stats (A9). The DuckDB oracle rebuilds every stage from shared
  * CTEs so the whole chain is independently verified.
  */
object PipelineQueries {

  /** Oracle CTE mirror of Dims + Medallion.silver/gold. */
  private[queries] val ctes: String =
    """WITH mappings(raw_symbol, metric_id, agg_type, category_id) AS (VALUES
      |  ('click.value',9001,'SUM',1), ('view.value',9002,'AVG',1),
      |  ('purchase.value',9003,'SUM',2), ('signup.value',9004,'NONE',2),
      |  ('error.value',9005,'NONE',3), ('click.k',9011,'SUM',1),
      |  ('view.k',9012,'AVG',1), ('purchase.k',9013,'SUM',2),
      |  ('signup.k',9014,'NONE',2), ('error.k',9015,'NONE',3)),
      |history AS (
      |  SELECT 'SN'||u AS serial, 'R'||u||'a' AS remote_id,
      |         1704067200 AS added_on, 1705363200 AS removed_on
      |  FROM range(0,140) t(u)
      |  UNION ALL
      |  SELECT 'SN'||u, 'R'||u||'b', 1705363200, NULL FROM range(0,140) t(u)),
      |silver AS (
      |  SELECT CAST(event_id AS VARCHAR) AS element,
      |         CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) AS unix_ts,
      |         strftime(ts, '%Y-%m-%d') AS datestamp,
      |         event_type || '.value' AS metric,
      |         CAST(value AS VARCHAR) AS value,
      |         'SN'||CAST(user_id AS VARCHAR) AS serialnumber,
      |         'DEV_MODEM' AS device_type,
      |         event_id % 3 + 1 AS metric_provider_id
      |  FROM events
      |  UNION ALL
      |  SELECT CAST(event_id AS VARCHAR),
      |         CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR),
      |         strftime(ts, '%Y-%m-%d'),
      |         event_type || '.k',
      |         json_extract_string(props, '$.k'),
      |         'SN'||CAST(user_id AS VARCHAR),
      |         'DEV_MODEM',
      |         event_id % 3 + 1
      |  FROM events),
      |gold AS (
      |  SELECT element,
      |         CAST(unix_ts AS BIGINT) AS unix_timestamp,
      |         datestamp, metric,
      |         CASE WHEN agg_type IN ('SUM','AVG')
      |              THEN CAST(value AS DECIMAL(30,15)) END AS value_double,
      |         CASE WHEN agg_type NOT IN ('SUM','AVG')
      |              THEN value END AS value_string,
      |         metric_id,
      |         metric_provider_id AS provider_id,
      |         category_id, remote_id, agg_type
      |  FROM silver
      |  JOIN mappings ON metric = raw_symbol
      |  JOIN history ON serialnumber = serial
      |    AND CAST(unix_ts AS BIGINT) >= added_on
      |    AND (removed_on IS NULL OR CAST(unix_ts AS BIGINT) < removed_on))
      |""".stripMargin

  /** One grain's rollup SELECT (no ORDER BY); `tagGrain` prepends a
    * literal grain column for the cascade's stacked output. */
  private def rollupSelect(grain: String, tagGrain: Boolean): String = {
    val tag = if (tagGrain) s"'$grain' AS grain, " else ""
    s"""SELECT ${tag}remote_id || '|' || CAST(bucket_ts AS VARCHAR) || '|' ||
       |       CAST(metric_id AS VARCHAR) || '|' || CAST(provider_id AS VARCHAR)
       |       || '|' || CAST(category_id AS VARCHAR) AS id,
       |       bucket_ts, remote_id, metric_id, provider_id, category_id,
       |       CAST(sum_dec AS DOUBLE) AS sum_value,
       |       CAST(sum_dec AS DOUBLE) / n AS avg_value,
       |       min_value, max_value, n
       |FROM (
       |  SELECT CAST(floor(epoch(date_trunc('$grain', to_timestamp(unix_timestamp)))) AS BIGINT) AS bucket_ts,
       |         remote_id, metric_id, provider_id, category_id,
       |         sum(value_double) AS sum_dec, count(*) AS n,
       |         CAST(min(value_double) AS DOUBLE) AS min_value,
       |         CAST(max(value_double) AS DOUBLE) AS max_value
       |  FROM gold
       |  WHERE agg_type IN ('SUM','AVG') AND value_double != 0
       |  GROUP BY 1,2,3,4,5)""".stripMargin
  }

  /** Rollup oracle at a given date_trunc granularity. */
  private[queries] def rollupSql(grain: String): String =
    ctes + rollupSelect(grain, tagGrain = false) +
      "\nORDER BY id, bucket_ts"

  /** Oracle for the grain-stacked hour/day/month cascade (p19, st12):
    * every grain computed INDEPENDENTLY from gold — the engine's
    * partial-reaggregation (batch or streaming-MERGE) must reproduce
    * all three exactly. */
  private[queries] def cascadeSql: String =
    ctes + Seq("hour", "day", "month")
      .map(rollupSelect(_, tagGrain = true))
      .mkString("", "\nUNION ALL\n", "\nORDER BY grain, id, bucket_ts")

  private def sfGold(s: org.apache.spark.sql.SparkSession, d: String) =
    Medallion.gold(Medallion.silver(Tables.events(s, d)),
      Dims.metricMappings(s), Dims.deviceHistory(s))

  val all: Map[String, Q] = Map(

    // §3.1 silver stage: the unified narrow metric table (J3 unpivot + J1).
    "p01_silver" -> Q(
      ctes +
        """SELECT * FROM silver
          |ORDER BY element, metric""".stripMargin) { (s, d) =>
      Medallion.silver(Tables.events(s, d)).orderBy("element", "metric")
    },

    // §3.2 gold enrichment: JN4 temporal interval join + numeric/string
    // value split into Decimal(30,15) ([G4]:60-73). DECIMAL stays internal
    // (order-independent sums); the query EDGE casts to DOUBLE so both
    // engines render the column identically.
    "p02_gold" -> Q(
      ctes +
        """SELECT element, unix_timestamp, datestamp, metric,
          |       CAST(value_double AS DOUBLE) AS value_double,
          |       value_string, metric_id, provider_id, category_id,
          |       remote_id, agg_type
          |FROM gold ORDER BY element, metric""".stripMargin) { (s, d) =>
      sfGold(s, d)
        .withColumn("value_double", col("value_double").cast("double"))
        .orderBy("element", "metric")
    },

    // A1/A2 rollups at three granularities ([A5]:84-98).
    "p03_rollup_hour" -> Q(rollupSql("hour")) { (s, d) =>
      Medallion.hourRollup(sfGold(s, d)).orderBy("id", "bucket_ts")
    },
    "p04_rollup_day" -> Q(rollupSql("day")) { (s, d) =>
      Medallion.dayRollup(sfGold(s, d)).orderBy("id", "bucket_ts")
    },
    "p05_rollup_month" -> Q(rollupSql("month")) { (s, d) =>
      Medallion.monthRollup(sfGold(s, d)).orderBy("id", "bucket_ts")
    },

    // Fused multi-granularity cascade: ONE gold scan -> hour partials,
    // day/month re-aggregated from partials (sum/count add, min/max
    // fold — [A5]:127-225 scans gold once per grain instead). The
    // oracle computes every grain independently from gold, so the
    // partial-merge law itself is what the hash compare certifies.
    "p19_rollup_cascade" -> Q(cascadeSql) { (s, d) =>
      Medallion.rollupCascade(sfGold(s, d))
        .orderBy("grain", "id", "bucket_ts")
    },

    // SCD2 dimension maintenance from a change log (the MERGE behind
    // the device-history validity intervals, [SU]): the dim is built
    // in TWO batches split at t0 — seed from the pre-split log, then
    // applyChanges MERGEs the rest — while the oracle derives the
    // whole history in ONE pass. The hash compare therefore certifies
    // the incremental-equals-batch property, not just the final shape.
    "p20_scd2_dim" -> Q(
      """WITH c AS (
        |  SELECT user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id
        |  FROM events),
        |o AS (
        |  SELECT user_id, event_type, t, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY t, event_id) AS prev
        |  FROM c),
        |ch AS (
        |  SELECT user_id, event_type, t, event_id FROM o
        |  WHERE prev IS NULL OR prev != event_type),
        |iv AS (
        |  SELECT user_id, event_type, t AS valid_from,
        |         lead(t) OVER (PARTITION BY user_id
        |                       ORDER BY t, event_id) AS valid_to
        |  FROM ch)
        |SELECT user_id, event_type, valid_from, valid_to FROM iv
        |WHERE valid_to IS NULL OR valid_to > valid_from
        |ORDER BY user_id, valid_from, event_type""".stripMargin) { (s, d) =>
      import graft.operators.Scd2
      val keys = Seq("user_id")
      val attrs = Seq("event_type")
      val c = Tables.events(s, d).select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("t"), col("event_id").as("seq"))
      val t0 = 1705708800L // same split as k05/st03
      val dim0 = Scd2.applyChanges(Scd2.emptyDim(c, keys, attrs, "t"),
        c.filter(col("t") < t0), keys, attrs, "t", "seq")
      Scd2.applyChanges(dim0, c.filter(col("t") >= t0),
          keys, attrs, "t", "seq")
        .orderBy("user_id", "valid_from", "event_type")
    },

    // W1 latest snapshot per 4-part key ([C6C]:57-64, id form [C6A]:126).
    "p06_latest" -> Q(
      ctes +
        """SELECT remote_id || '|' || CAST(metric_id AS VARCHAR) || '|' ||
          |       CAST(provider_id AS VARCHAR) || '|' || CAST(category_id AS VARCHAR) AS id,
          |       remote_id, metric_id, provider_id, category_id,
          |       unix_timestamp,
          |       CAST(value_double AS DOUBLE) AS value_double, value_string
          |FROM (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY remote_id, metric_id, provider_id, category_id
          |    ORDER BY unix_timestamp DESC, CAST(element AS BIGINT) DESC) AS rn
          |  FROM gold) WHERE rn = 1
          |ORDER BY id""".stripMargin) { (s, d) =>
      Medallion.latest(sfGold(s, d))
        .withColumn("value_double", col("value_double").cast("double"))
        .orderBy("id")
    },

    // JN6/JN10 orphan detection: silver rows with no covering validity
    // interval (user_id >= 140 by construction) ([DLO]:22-84).
    "p07_orphans" -> Q(
      ctes +
        """SELECT element, metric, serialnumber FROM silver
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM history
          |  WHERE serialnumber = serial
          |    AND CAST(unix_ts AS BIGINT) >= added_on
          |    AND (removed_on IS NULL OR CAST(unix_ts AS BIGINT) < removed_on))
          |ORDER BY element, metric""".stripMargin) { (s, d) =>
      Medallion.orphans(Medallion.silver(Tables.events(s, d)),
          Dims.deviceHistory(s))
        .select("element", "metric", "serialnumber")
        .orderBy("element", "metric")
    },

    // A8 cross-path reconciliation: day-rollup sums re-aggregated per
    // provider must equal sums taken directly from gold ([DLA]:44-138).
    "p08_reconcile" -> Q(
      ctes +
        """SELECT provider_id, path, round(total, 2) AS total FROM (
          |  SELECT provider_id, 'rollup' AS path,
          |         CAST(sum(sum_dec) AS DOUBLE) AS total FROM (
          |    SELECT provider_id,
          |           date_trunc('day', to_timestamp(unix_timestamp)) AS b,
          |           sum(value_double) AS sum_dec
          |    FROM gold WHERE agg_type IN ('SUM','AVG') AND value_double != 0
          |    GROUP BY 1, 2) GROUP BY 1
          |  UNION ALL
          |  SELECT provider_id, 'direct',
          |         CAST(sum(value_double) AS DOUBLE)
          |  FROM gold WHERE agg_type IN ('SUM','AVG') AND value_double != 0
          |  GROUP BY 1)
          |ORDER BY provider_id, path""".stripMargin) { (s, d) =>
      val g = sfGold(s, d)
        .filter(col("agg_type").isin("SUM", "AVG") && col("value_double") =!= 0)
      val viaRollup = g
        .groupBy(col("provider_id"),
          date_trunc("day", timestamp_seconds(col("unix_timestamp"))).as("b"))
        .agg(sum("value_double").as("sum_dec"))
        .groupBy("provider_id")
        .agg(sum("sum_dec").cast("double").as("total"))
        .withColumn("path", lit("rollup"))
      val direct = g.groupBy("provider_id")
        .agg(sum("value_double").cast("double").as("total"))
        .withColumn("path", lit("direct"))
      viaRollup.unionByName(direct)
        .select(col("provider_id"), col("path"), round(col("total"), 2).as("total"))
        .orderBy("provider_id", "path")
    },

    // A9 delay stats: avg/min/max of (stage-max time − event time) per
    // key — the Bronze→Gold relative-delay report shape ([DLB]:58-141),
    // with the per-remote max standing in for wall-clock load time.
    "p09_delay_stats" -> Q(
      ctes +
        """SELECT remote_id,
          |       CAST(max(unix_timestamp) - min(unix_timestamp) AS BIGINT) AS span_s,
          |       CAST(round(avg(unix_timestamp), 0) AS BIGINT) AS avg_ts,
          |       count(*) AS n
          |FROM gold GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      sfGold(s, d)
        .groupBy("remote_id")
        .agg(
          (max("unix_timestamp") - min("unix_timestamp")).cast("long").as("span_s"),
          round(avg("unix_timestamp"), 0).cast("long").as("avg_ts"),
          count(lit(1)).as("n"))
        .orderBy("remote_id")
    }
  )
}
