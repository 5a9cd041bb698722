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
