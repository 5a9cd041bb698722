package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (one entry per SURVEY.md §2
  * operator); `oracleSql` carries the DuckDB equivalent for every
  * SQL-expressible query. Registries live in graft.queries.*.
  *
  * EAGER-CONSTRUCTOR contract: building a registered frame may itself
  * execute BOUNDED driver jobs (fit/sizing collects of ≤ a few hundred
  * rows — IVF centroids, LSH sizing count-stars, Dsir/LmQuality ratio
  * tables, the t35/t37/t38 perceptron fits, RangeRank partition
  * offsets). Callers therefore pay those scans at CONSTRUCTION time,
  * not first action; every such collect is audited bounded (≤ Dim/
  * numPartitions rows) and documented at its operator. The driver
  * always executes what it builds, so nothing is computed that isn't
  * consumed.
  */
object SparkEntry {

  /** All registries, merged. Later waves add their own objects here. */
  private def registry: Map[String, Q] =
    CoreQueries.all ++ CoreQueries2.all ++ ExprQueries.all ++
      BronzeQueries.all ++
      PipelineQueries.all ++ PipelineQueries2.all ++ MonitoringQueries.all ++
      StreamingQueries.all ++ TextQueries.all ++ JoinQueries.all ++
      DedupQueries.all ++ AnnQueries.all ++ MultimodalQueries.all ++
      SinkQueries.all ++ AnalyticsQueries.all ++ WindowQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full medallion chain — silver unpivot, temporal gold
    * enrichment, day rollup (SURVEY.md §7.2 / §3) — in one plan. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.pipeline.{Dims, Medallion}
    val dir = "/root/testdata/sf0.001"
    Medallion.dayRollup(
      Medallion.gold(
        Medallion.silver(graft.sources.Tables.events(spark, dir)),
        Dims.metricMappings(spark), Dims.deviceHistory(spark)))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
