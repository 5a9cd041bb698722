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
    },

    // distribution-drift monitor: total-variation distance between the
    // first and second half-month value distributions, per event type —
    // the "did the feature distribution move between snapshots" check a
    // training pipeline runs before each ingest is admitted. Values
    // bucket as exact integer cents (DECIMAL(20,2) cast, div 5000), and
    // TVD is pure integer cross-multiplication ppm: no float ever
    // touches the comparison. One scan, one #types*10-row hash-agg —
    // the moment table is tiny at any corpus size. (The |o1*n2 - o2*n1|
    // cross products sit in BIGINT: exact to ~1e6 rows/group; past
    // that, promote the sums to DECIMAL(38) as q56 does its moments.)
    "q57_dist_drift" -> Q(
      """WITH e AS (
        |  SELECT event_type,
        |         CASE WHEN strftime(ts, '%Y-%m-%d') < '2024-01-15'
        |              THEN 1 ELSE 2 END AS half,
        |         least(CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT)
        |               // 5000, 9) AS b
        |  FROM events),
        |c AS (
        |  SELECT event_type, b,
        |         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS o1,
        |         CAST(sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT) AS o2
        |  FROM e GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(o1) AS BIGINT) AS n1,
        |             CAST(sum(o2) AS BIGINT) AS n2
        |      FROM c GROUP BY 1),
        |a AS (SELECT c.event_type, c.b, abs(c.o1 * t.n2 - c.o2 * t.n1) AS ad
        |      FROM c JOIN t USING (event_type)),
        |sd AS (SELECT event_type, CAST(sum(ad) AS BIGINT) AS sad
        |       FROM a GROUP BY 1),
        |m AS (SELECT event_type, b AS top_bucket FROM (
        |        SELECT event_type, b, row_number() OVER (
        |          PARTITION BY event_type ORDER BY ad DESC, b) AS rn
        |        FROM a) WHERE rn = 1)
        |SELECT t.event_type, t.n1, t.n2,
        |       (sd.sad * 1000000) // (2 * t.n1 * t.n2) AS tvd_ppm,
        |       m.top_bucket
        |FROM t JOIN sd USING (event_type) JOIN m USING (event_type)
        |ORDER BY t.event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val e = Tables.events(s, d).select(col("event_type"),
        when(graft.functions.Fns.datestamp(col("ts")) < "2024-01-15", 1)
          .otherwise(2).as("half"),
        (col("value").cast(DecimalType(20, 2)) * 100).cast("long").as("c"))
        .withColumn("b", expr("least(c div 5000, 9)")).drop("c")
      val c = e.groupBy("event_type", "b").agg(
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("o1"),
        sum(when(col("half") === 2, 1L).otherwise(0L)).as("o2"))
      val t = c.groupBy("event_type").agg(
        sum("o1").as("n1"), sum("o2").as("n2"))
      val a = c.join(t, Seq("event_type"))
        .withColumn("ad", abs(col("o1") * col("n2") - col("o2") * col("n1")))
      val sd = a.groupBy("event_type").agg(sum("ad").as("sad"))
      val m = a.withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy(col("ad").desc, col("b"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("b").as("top_bucket"))
      t.join(sd, Seq("event_type")).join(m, Seq("event_type"))
        .select(col("event_type"), col("n1"), col("n2"),
          expr("(sad * 1000000) div (2 * n1 * n2)").as("tvd_ppm"),
          col("top_bucket"))
        .orderBy("event_type")
    },

    // declarative data-quality expectations (the managed-pipeline
    // expectations idiom the reference hand-rolls one detection
    // notebook at a time): named row predicates evaluated in ONE
    // map-side pass, per-rule pass/fail metrics from a single
    // partial-agg rollup — n_fail > 0 rows prove the rules actually
    // discriminate. The clean/quarantine split over the same flags is
    // spec-verified (OperatorsSpec).
    "q61_expectations" -> Q(
      """SELECT rule, n_rows, n_pass, n_rows - n_pass AS n_fail FROM (
        |  SELECT 'not_error' AS rule, count(*) AS n_rows,
        |         CAST(sum(CASE WHEN event_type != 'error' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_pass
        |  FROM events
        |  UNION ALL
        |  SELECT 'props_has_k', count(*),
        |         CAST(sum(CASE WHEN json_extract_string(props, '$.k')
        |                       IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'value_small', count(*),
        |         CAST(sum(CASE WHEN value < 900 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT '_all', count(*),
        |         CAST(sum(CASE WHEN event_type != 'error'
        |                       AND json_extract_string(props, '$.k') IS NOT NULL
        |                       AND value < 900 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM events)
        |ORDER BY rule""".stripMargin) { (s, d) =>
      import graft.operators.Expectations
      import graft.operators.Expectations.Rule
      Expectations.summary(Tables.events(s, d), Seq(
          Rule("not_error", col("event_type") =!= "error"),
          Rule("props_has_k",
            get_json_object(col("props"), "$.k").isNotNull),
          Rule("value_small", col("value") < 900)))
        .orderBy("rule")
    }
  )
}
