package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dimension tables for the medallion pipeline, synthesized
  * from nothing but constants + `range` so the DuckDB oracle can rebuild
  * them verbatim (CTEs in PipelineQueries.OracleCtes).
  *
  * Shapes mirror the reference's mapping dims:
  *  - `metricMappings` ~ metricmappings(rawSymbol, metricId, mappingType)
  *    joined with metrics-aggtype(aggregationType, categoryId)
  *    (`Set Up Delta Tables/Set up Delta tables ...scala:153,299`).
  *  - `deviceHistory` ~ remotedevicehistory(RemoteId, Serial, AddedOn,
  *    RemovedOn) — the SCD-2 validity-interval dim behind the temporal
  *    join (`Gold state/Step 04-04b ...scala:60,65`). Two intervals per
  *    serial (suffix a/b split at mid-month) and, deliberately, NO rows
  *    for user_id >= 140 so orphan detection has work to do.
  */
object Dims {

  /** Epoch seconds of the interval boundaries (UTC). */
  val IntervalStart = 1704067200L // 2024-01-01
  val IntervalSplit = 1705363200L // 2024-01-16
  val MappedUsers   = 140         // user_id >= 140 stays unmapped (orphans)

  /** (rawSymbol, metricId, aggregationType, categoryId) — the raw metric
    * symbol is "<event_type>.<field>"; SUM/AVG metrics flow to the
    * numeric gold column, others stay strings ([G4]:69-70 semantics). */
  val mappingRows: Seq[(String, Long, String, Long)] = Seq(
    ("click.value", 9001L, "SUM", 1L),
    ("view.value", 9002L, "AVG", 1L),
    ("purchase.value", 9003L, "SUM", 2L),
    ("signup.value", 9004L, "NONE", 2L),
    ("error.value", 9005L, "NONE", 3L),
    ("click.k", 9011L, "SUM", 1L),
    ("view.k", 9012L, "AVG", 1L),
    ("purchase.k", 9013L, "SUM", 2L),
    ("signup.k", 9014L, "NONE", 2L),
    ("error.k", 9015L, "NONE", 3L))

  def metricMappings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    mappingRows.toDF("raw_symbol", "metric_id", "agg_type", "category_id")
  }

  /** Custom-metric definitions ~ custommetrics(metricId, mappingIds,
    * mappingType) ([SU]:254-278): custom 9101 sums sources 9001+9003,
    * 9102 sums 9011+9013. */
  val customMetricRows: Seq[(Long, Long, String)] = Seq(
    (9101L, 9001L, "SUM"), (9101L, 9003L, "SUM"),
    (9102L, 9011L, "SUM"), (9102L, 9013L, "SUM"))

  def customMetrics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    customMetricRows.toDF("custom_metric_id", "mapping_id", "mapping_type")
  }

  /** Two validity intervals per serial "SN<u>": remote R<u>a owns
    * [2024-01-01, 2024-01-16), R<u>b owns [2024-01-16, open). */
  def deviceHistory(spark: SparkSession): DataFrame = {
    val u = spark.range(0, MappedUsers).select(col("id"))
    val a = u.select(
      concat(lit("SN"), col("id").cast("string")).as("serial"),
      concat(lit("R"), col("id").cast("string"), lit("a")).as("remote_id"),
      lit(IntervalStart).as("added_on"),
      lit(IntervalSplit).cast("long").as("removed_on"))
    val b = u.select(
      concat(lit("SN"), col("id").cast("string")).as("serial"),
      concat(lit("R"), col("id").cast("string"), lit("b")).as("remote_id"),
      lit(IntervalSplit).as("added_on"),
      lit(null).cast("long").as("removed_on"))
    a.union(b)
  }

  /** The change log whose SCD2 fold reproduces [[deviceHistory]]
    * exactly: each serial changes remote at IntervalStart (-> R<u>a)
    * and again at IntervalSplit (-> R<u>b). p21 feeds this through
    * [[graft.operators.Scd2.applyChanges]] in two time-ordered batches
    * and resolves gold against the RESULT — the maintain-then-join
    * topology the reference runs as two separate notebooks. */
  def deviceHistoryChanges(spark: SparkSession): DataFrame = {
    val u = spark.range(0, MappedUsers).select(col("id"))
    val a = u.select(
      concat(lit("SN"), col("id").cast("string")).as("serial"),
      concat(lit("R"), col("id").cast("string"), lit("a")).as("remote_id"),
      lit(IntervalStart).as("t"),
      col("id").as("seq"))
    val b = u.select(
      concat(lit("SN"), col("id").cast("string")).as("serial"),
      concat(lit("R"), col("id").cast("string"), lit("b")).as("remote_id"),
      lit(IntervalSplit).as("t"),
      col("id").as("seq"))
    a.union(b)
  }

  /** [[deviceHistory]] with deterministic duplicate ACTIVE rows
    * injected — every 10th serial repeats its open-interval row. The
    * corrupted input the dim-repair flow exists to fix (the reference
    * hits this when an upstream export double-writes history rows). */
  def deviceHistoryWithDups(spark: SparkSession): DataFrame = {
    val dup = spark.range(0, MappedUsers)
      .filter(col("id") % 10 === 0)
      .select(
        concat(lit("SN"), col("id").cast("string")).as("serial"),
        concat(lit("R"), col("id").cast("string"), lit("b")).as("remote_id"),
        lit(IntervalSplit).as("added_on"),
        lit(null).cast("long").as("removed_on"))
    deviceHistory(spark).union(dup)
  }

  /** Dim-refresh repair (`Set Up Delta Tables/Set up Delta tables for
    * Slowly changing Data.scala:84-96`): a serial whose ACTIVE rows
    * (removed_on IS NULL) duplicate within (serial, remote_id) has
    * corrupt history — drop the whole serial, exactly as the reference
    * does, and let the next dim export repopulate it. The reference
    * collects the surviving serials to the driver and filters with
    * `isin`; here the same set algebra is one left-anti join against
    * the (tiny, auto-broadcast) dup-serial table — no driver
    * round-trip, so it holds at any dim size. Idempotent by
    * construction: a repaired dim has no dup groups, so a second pass
    * is the identity. */
  def repairDupActive(hist: DataFrame): DataFrame = {
    val dupSerials = hist.filter(col("removed_on").isNull)
      .groupBy("serial", "remote_id")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select("serial").distinct()
    hist.join(dupSerials, Seq("serial"), "left_anti")
  }
}
