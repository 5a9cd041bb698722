package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (one entry per SURVEY.md §2
  * operator); `oracleSql` carries the DuckDB equivalent for every
  * SQL-expressible query. Registries live in graft.queries.*.
  */
object SparkEntry {

  /** All registries, merged. Later waves add their own objects here. */
  private def registry: Map[String, Q] =
    CoreQueries.all ++ CoreQueries2.all ++ ExprQueries.all ++
      BronzeQueries.all ++
      PipelineQueries.all ++ PipelineQueries2.all ++ MonitoringQueries.all ++
      StreamingQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ AnnQueries.all ++ MultimodalQueries.all ++
      SinkQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Daily per-user/event_type rollup — the medallion pipeline's core
    * aggregate shape (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    graft.sources.Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("datestamp"),
        col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"),
        avg("value").as("avg_value"), min("value").as("min_value"),
        max("value").as("max_value"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
