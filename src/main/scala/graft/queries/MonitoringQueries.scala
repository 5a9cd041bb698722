package graft.queries

import org.apache.spark.sql.functions._
import graft.pipeline.{Dims, Medallion}
import graft.sources.Tables

/** Monitoring side-channel (SURVEY.md §3.3b): per-stage max-timestamp
  * lag and per-provider staleness classification — the Data Lack
  * Detection surface ([DLD]:34-160, [DLM]:213) with a deterministic
  * "now" (the corpus max timestamp) instead of wall clock.
  */
object MonitoringQueries {

  private def sfGold(s: org.apache.spark.sql.SparkSession, d: String) =
    Medallion.gold(Medallion.silver(Tables.events(s, d)),
      Dims.metricMappings(s), Dims.deviceHistory(s))

  val all: Map[String, Q] = Map(

    // stage-lag fan-in: max event time per provider at each pipeline
    // stage, unioned into one report ([DLD]:71-132 shape).
    "p12_stage_lag" -> Q(
      PipelineQueries.ctes +
        """SELECT stage, provider_id, max_ts FROM (
          |  SELECT 'silver' AS stage, metric_provider_id AS provider_id,
          |         max(CAST(unix_ts AS BIGINT)) AS max_ts
          |  FROM silver GROUP BY 2
          |  UNION ALL
          |  SELECT 'gold', provider_id, max(unix_timestamp) FROM gold GROUP BY 2
          |  UNION ALL
          |  SELECT 'rollup_day', provider_id,
          |         max(CAST(floor(epoch(date_trunc('day',
          |             to_timestamp(unix_timestamp)))) AS BIGINT))
          |  FROM gold WHERE agg_type IN ('SUM','AVG') AND value_double != 0
          |  GROUP BY 2)
          |ORDER BY stage, provider_id""".stripMargin) { (s, d) =>
      val silver = Medallion.silver(Tables.events(s, d))
      val gold = sfGold(s, d)
      val silverLag = silver
        .groupBy(col("metric_provider_id").as("provider_id"))
        .agg(max(col("unix_ts").cast("long")).as("max_ts"))
        .withColumn("stage", lit("silver"))
      val goldLag = gold.groupBy("provider_id")
        .agg(max("unix_timestamp").as("max_ts"))
        .withColumn("stage", lit("gold"))
      val rollupLag = Medallion.dayRollup(gold)
        .groupBy("provider_id")
        .agg(max("bucket_ts").as("max_ts"))
        .withColumn("stage", lit("rollup_day"))
      silverLag.unionByName(goldLag).unionByName(rollupLag)
        .select("stage", "provider_id", "max_ts")
        .orderBy("stage", "provider_id")
    },

    // gold dup-detection on the 5-part metric key ([Q1]:413-418: GROUP
    // BY ... HAVING count(*)>1) — the post-dedup invariant check run as
    // a query; reports key-collision groups (legitimately present here:
    // events can share (user, type, second)).
    "p14_gold_dups" -> Q(
      PipelineQueries.ctes +
        """SELECT remote_id, metric_id, provider_id, category_id,
          |       unix_timestamp, count(*) AS n
          |FROM gold
          |GROUP BY 1, 2, 3, 4, 5 HAVING count(*) > 1
          |ORDER BY 1, 2, 3, 4, 5""".stripMargin) { (s, d) =>
      sfGold(s, d)
        .groupBy("remote_id", "metric_id", "provider_id", "category_id",
          "unix_timestamp")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy("remote_id", "metric_id", "provider_id", "category_id",
          "unix_timestamp")
    },

    // staleness SLO: classify each provider's gold lag against its
    // threshold (the reference's 3.6 ks / 86.4 ks / 15.55 Ms tiers,
    // [DLM]:213), against the deterministic corpus max as "now".
    "p13_staleness" -> Q(
      PipelineQueries.ctes +
        """SELECT provider_id, lag_s,
          |       CASE WHEN lag_s > slo THEN 'STALE' ELSE 'OK' END AS status
          |FROM (
          |  SELECT provider_id,
          |         (SELECT max(unix_timestamp) FROM gold) - max(unix_timestamp) AS lag_s,
          |         CASE provider_id WHEN 1 THEN 3600 WHEN 2 THEN 86400
          |              ELSE 15552000 END AS slo
          |  FROM gold GROUP BY provider_id)
          |ORDER BY provider_id""".stripMargin) { (s, d) =>
      val gold = sfGold(s, d).cache()
      val now = gold.agg(max("unix_timestamp")).head.getLong(0)
      gold.groupBy("provider_id")
        .agg((lit(now) - max("unix_timestamp")).as("lag_s"))
        .withColumn("slo",
          when(col("provider_id") === 1, 3600L)
            .when(col("provider_id") === 2, 86400L)
            .otherwise(15552000L))
        .select(col("provider_id"), col("lag_s"),
          when(col("lag_s") > col("slo"), "STALE").otherwise("OK").as("status"))
        .orderBy("provider_id")
    }
  )
}
