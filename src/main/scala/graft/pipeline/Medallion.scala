package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Fns

/** The medallion pipeline re-expressed Spark-first. Each stage is a pure
  * DataFrame => DataFrame transform, so the same code runs batch (driver
  * correctness gate) and streaming (graft.streaming, file-stream in /
  * memory-sink out).
  *
  * Stage semantics follow the reference:
  *  - silver: one unified long/narrow stringly-typed metric table that
  *    every provider funnels into (`Bronze-Silver/Part1 ...scala:219-228`)
  *  - gold: remote-resolved, type-split fact — numeric metrics to
  *    Decimal(30,15) `valueInDouble`, rest to `valueInString`
  *    (`Gold state/Step 04-04b ...scala:60-73`)
  *  - rollups: hour/day/month groupBy(5-key).agg(sum,avg,min,max)
  *    (`Gold Aggregation/Step 05 ...scala:84-98`)
  *  - latest: top-1 per 4-key via row_number window
  *    (`Metric Stream to Cosmos/Step 06.c ...scala:57-64`), replacing the
  *    groupBy(max)+self-join form (`Old ... Step 05.d:97-140`).
  */
object Medallion {

  /** Events -> unified narrow silver. Each event yields two metric rows
    * (fields `value` and `k`), unpivoted with a single Generate — no JSON
    * string rebuild ([P1]:169-180 replaced, SURVEY.md J3). Stays entirely
    * map-side: zero shuffles, codegen-friendly. */
  def silver(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("ts"),
        Fns.nameValueExplode(
          "value" -> col("value"),
          "k" -> get_json_object(col("props"), "$.k")).as("nv"))
      .select(
        col("event_id").cast("string").as("element"),
        unix_timestamp(col("ts")).cast("string").as("unix_ts"),
        Fns.datestamp(col("ts")).as("datestamp"),
        concat(col("event_type"), lit("."), col("nv.name")).as("metric"),
        col("nv.value").as("value"),
        concat(lit("SN"), col("user_id").cast("string")).as("serialnumber"),
        lit("DEV_MODEM").as("device_type"),
        (col("event_id") % 3 + 1).as("metric_provider_id"))

  /** The temporal interval join predicate (JN4): serial match + event time
    * inside the validity window, open-ended RemovedOn ([G4]:65). */
  def intervalJoinCond(silver: DataFrame, hist: DataFrame): Column =
    silver("serialnumber") === hist("serial") &&
      silver("unix_ts").cast("long") >= hist("added_on") &&
      (hist("removed_on").isNull ||
        silver("unix_ts").cast("long") < hist("removed_on"))

  /** Silver -> gold: metric-id mapping join, temporal remote resolution,
    * numeric/string value split. Both dims are small -> broadcast; the
    * interval join broadcasts history and keeps the range predicate as a
    * residual on the serial-equality hash join (no BNLJ). */
  def gold(silver: DataFrame, mappings: DataFrame, history: DataFrame): DataFrame = {
    val numeric = col("agg_type").isin("SUM", "AVG")
    silver
      .join(broadcast(mappings), silver("metric") === mappings("raw_symbol"))
      .join(broadcast(history), intervalJoinCond(silver, history))
      .select(
        col("element"),
        col("unix_ts").cast("long").as("unix_timestamp"),
        col("datestamp"),
        col("metric"),
        when(numeric, col("value").cast(DecimalType(30, 15)))
          .otherwise(lit(null).cast(DecimalType(30, 15))).as("value_double"),
        when(!numeric, col("value"))
          .otherwise(lit(null).cast("string")).as("value_string"),
        col("metric_id"),
        col("metric_provider_id").as("provider_id"),
        col("category_id"),
        col("remote_id"),
        col("agg_type"))
  }

  /** [[gold]] without the history broadcast: temporal remote resolution
    * as an as-of join ([[graft.operators.AsOfJoin]]) — union-tag by
    * serial, one shuffle of |silver|+|history|, carry the latest
    * (added_on <= ts) interval forward, then apply the validity residual
    * (`removed_on` open or ts inside) and drop uncovered rows.
    *
    * Identical output to [[gold]] whenever validity intervals per serial
    * are non-overlapping (the SCD-2 invariant the reference's
    * remotedevicehistory maintains). This is the 100 TB path for a
    * device-history dim too large to broadcast: the interval join's
    * broadcast becomes a shuffle that scales with the data, and no
    * range-join blowup appears because the as-of core never builds
    * pair candidates. */
  def goldAsOf(silver: DataFrame, mappings: DataFrame,
      history: DataFrame): DataFrame = {
    val numeric = col("agg_type").isin("SUM", "AVG")
    val left = silver
      .join(broadcast(mappings), silver("metric") === mappings("raw_symbol"))
      .withColumn("__uts", col("unix_ts").cast("long"))
    val hist = history.select(col("serial").as("serialnumber"),
      col("added_on"), col("remote_id"), col("removed_on"))
    graft.operators.AsOfJoin.joinAsOf(left, hist,
        key = "serialnumber", leftTs = "__uts", rightTs = "added_on",
        payload = Seq("remote_id", "removed_on"),
        tieBreak = Seq("remote_id"))
      .filter(col("remote_id").isNotNull &&
        (col("removed_on").isNull || col("__uts") < col("removed_on")))
      .select(
        col("element"),
        col("__uts").as("unix_timestamp"),
        col("datestamp"),
        col("metric"),
        when(numeric, col("value").cast(DecimalType(30, 15)))
          .otherwise(lit(null).cast(DecimalType(30, 15))).as("value_double"),
        when(!numeric, col("value"))
          .otherwise(lit(null).cast("string")).as("value_string"),
        col("metric_id"),
        col("metric_provider_id").as("provider_id"),
        col("category_id"),
        col("remote_id"),
        col("agg_type"))
  }

  /** Orphaned silver rows: serial has no covering validity interval —
    * the reference's unmapped-remote report
    * (`Detection Data Lack/...Orphaned Usage...scala:22-84`), as a
    * distributed left_anti instead of NOT IN over a collect. */
  def orphans(silver: DataFrame, history: DataFrame): DataFrame =
    silver.join(broadcast(history), intervalJoinCond(silver, history), "left_anti")

  /** Gold -> one rollup granularity. `bucket` maps the event-time column
    * to the epoch-second bucket start ([A5]:84,133,186 via date_trunc).
    * Only SUM/AVG metrics with non-zero numeric values roll up
    * ([A5]:85). Output values are doubles derived from exact decimal
    * sums (sumValue) so results are reproducible regardless of
    * partitioning / aggregation order. */
  def rollup(gold: DataFrame, bucket: Column => Column): DataFrame =
    finalizeRollup(rollupPartials(gold, bucket))

  /** Mergeable partial-aggregate state for one rollup grain: exact
    * DECIMAL sum, count, DECIMAL min/max per (bucket_ts, dims). Sums
    * and counts add, min/max fold — the same reaggregation law the
    * sketch family (q47/q48) relies on — so any coarser grain derives
    * from these partials without touching gold again. */
  def rollupPartials(gold: DataFrame, bucket: Column => Column): DataFrame = {
    val bucketTs = bucket(timestamp_seconds(col("unix_timestamp")))
    gold
      .filter(col("agg_type").isin("SUM", "AVG") && col("value_double") =!= 0)
      .groupBy(
        bucketTs.cast("long").as("bucket_ts"),
        col("remote_id"), col("metric_id"), col("provider_id"),
        col("category_id"))
      .agg(
        sum("value_double").as("dec_sum"),
        count(lit(1)).as("n"),
        min("value_double").as("dec_min"),
        max("value_double").as("dec_max"))
  }

  /** Merge partials down to a coarser grain (hour partials -> day,
    * day -> month): input and output share the partials schema, so
    * cascades compose. Cost is O(finer-grain groups), not O(gold). */
  def reaggPartials(partials: DataFrame,
      bucket: Column => Column): DataFrame =
    partials
      .groupBy(
        bucket(timestamp_seconds(col("bucket_ts"))).cast("long")
          .as("bucket_ts"),
        col("remote_id"), col("metric_id"), col("provider_id"),
        col("category_id"))
      .agg(
        sum("dec_sum").as("dec_sum"),
        sum("n").as("n"),
        min("dec_min").as("dec_min"),
        max("dec_max").as("dec_max"))

  /** Partials -> the serving rollup shape (id, doubles at the edge). */
  def finalizeRollup(partials: DataFrame): DataFrame =
    partials.select(
      Fns.servingId(col("remote_id"), col("bucket_ts"), col("metric_id"),
        col("provider_id"), col("category_id")).as("id"),
      col("bucket_ts"), col("remote_id"), col("metric_id"),
      col("provider_id"), col("category_id"),
      col("dec_sum").cast("double").as("sum_value"),
      (col("dec_sum").cast("double") / col("n")).as("avg_value"),
      col("dec_min").cast("double").as("min_value"),
      col("dec_max").cast("double").as("max_value"),
      col("n"))

  def hourRollup(gold: DataFrame): DataFrame =
    rollup(gold, ts => unix_timestamp(date_trunc("hour", ts)))
  def dayRollup(gold: DataFrame): DataFrame =
    rollup(gold, ts => unix_timestamp(date_trunc("day", ts)))
  def monthRollup(gold: DataFrame): DataFrame =
    rollup(gold, ts => unix_timestamp(date_trunc("month", ts)))

  /** Fused hour→day→month cascade ([A5]:127-225 runs three INDEPENDENT
    * full scans — one per grain — against the same gold table): gold is
    * aggregated ONCE into hour partials, day re-aggregates the hour
    * partials, month the day partials; the three finalized grains stack
    * under a `grain` column. The hour partials are persisted so the
    * union's three branches share one computation — at 100 TB they are
    * the table you'd write to storage, after which every coarser rollup
    * is O(hour groups) and the raw-event scan happens exactly once. */
  def rollupCascade(gold: DataFrame): DataFrame =
    cascadeFromHourPartials(rollupPartials(gold,
      ts => unix_timestamp(date_trunc("hour", ts))).persist())

  /** The cascade's reaggregation half, starting from (stored or
    * freshly computed) hour partials — the entry point a persisted
    * partials table (batch parquet or the streaming MERGE table)
    * shares with [[rollupCascade]]. */
  def cascadeFromHourPartials(hour: DataFrame): DataFrame = {
    val day = reaggPartials(hour,
      ts => unix_timestamp(date_trunc("day", ts)))
    val month = reaggPartials(day,
      ts => unix_timestamp(date_trunc("month", ts)))
    def graded(grain: String, p: DataFrame) =
      finalizeRollup(p).select(lit(grain).as("grain"), col("*"))
    graded("hour", hour)
      .unionByName(graded("day", day))
      .unionByName(graded("month", month))
  }

  /** Custom SUM metrics ([G4]:182-242): gold rows whose metric id is a
    * custom-metric source are re-aggregated per (timestamp, remote,
    * provider, category) under the custom metric id, then
    * unit-renormalized per (metric, provider) with conditional id
    * rewrite — the reference's 9005->9003 x1000 / 9008,9009->9006,9007
    * /60x1000 | /300 pattern on our id space. Values move through
    * double for engine-neutral arithmetic. Output is gold-shaped, ready
    * for re-ingest. */
  def customSumMetrics(gold: DataFrame, customMetrics: DataFrame): DataFrame = {
    val joined = gold.join(broadcast(customMetrics),
      gold("metric_id") === customMetrics("mapping_id") &&
        customMetrics("mapping_type") === "SUM")
    val summed = joined
      .groupBy(col("unix_timestamp"), col("datestamp"), col("remote_id"),
        col("provider_id"), col("category_id"), col("custom_metric_id"))
      .agg(sum("value_double").cast("double").as("v"))
    summed
      .withColumn("v",
        when(col("custom_metric_id") === 9101 && col("provider_id") === 3,
          col("v") * 1000)
          .when(col("custom_metric_id") === 9102 && col("provider_id") === 3,
            col("v") / 60 * 1000)
          .when(col("custom_metric_id") === 9102 && col("provider_id").isin(1, 2),
            col("v") / 300)
          .otherwise(col("v")))
      .withColumn("custom_metric_id",
        when(col("custom_metric_id") === 9101 && col("provider_id") === 3,
          lit(9103L))
          .when(col("custom_metric_id") === 9102, lit(9104L))
          .otherwise(col("custom_metric_id")))
      .select(
        lit(null).cast("string").as("element"),
        col("unix_timestamp"),
        col("datestamp"),
        lit(null).cast("string").as("metric"),
        col("v").as("value_double"),
        lit(null).cast("string").as("value_string"),
        col("custom_metric_id").as("metric_id"),
        col("provider_id"),
        col("category_id"),
        col("remote_id"),
        lit("SUM").as("agg_type"))
  }

  /** The gold -> custom-sum -> gold cycle ([G4]:246-280) as a single
    * batch pass. The source filter on metric id is the provenance guard
    * that keeps re-ingested custom rows (>= 9100) from feeding the
    * aggregation again — the batch equivalent of the streaming form's
    * 750-h dedup against infinite reprocessing. */
  def goldWithCustom(gold: DataFrame, customMetrics: DataFrame): DataFrame = {
    val custom = customSumMetrics(
      gold.filter(col("metric_id") < 9100), customMetrics)
    gold.withColumn("value_double", col("value_double").cast("double"))
      .unionByName(custom)
  }

  /** ASM serial-indexed gold branch ([G4]:106-147, `Gold state/Step
    * 04-04b - Gold Phase Raw and custom metric.scala`): rows of the ASM
    * provider bypass remote resolution entirely — the reference writes
    * a SECOND gold output for `metricProviderId === 5` where
    * `$"serialnumber" as "remoteId"` (the serial itself is the key) and
    * no device-history join runs. Same mapping join and numeric/string
    * value split as [[gold]]; only the key differs. Map-side only
    * (broadcast mapping join, no shuffle). */
  def goldSerial(silver: DataFrame, mappings: DataFrame,
      asmProviderId: Long = 2L): DataFrame = {
    val numeric = col("agg_type").isin("SUM", "AVG")
    silver
      .filter(col("metric_provider_id") === asmProviderId)
      .join(broadcast(mappings), silver("metric") === mappings("raw_symbol"))
      .select(
        col("element"),
        col("unix_ts").cast("long").as("unix_timestamp"),
        col("datestamp"),
        col("metric"),
        when(numeric, col("value").cast(DecimalType(30, 15)))
          .otherwise(lit(null).cast(DecimalType(30, 15))).as("value_double"),
        when(!numeric, col("value"))
          .otherwise(lit(null).cast("string")).as("value_string"),
        col("metric_id"),
        col("metric_provider_id").as("provider_id"),
        col("category_id"),
        col("serialnumber").as("remote_id"),
        col("agg_type"))
  }

  /** Gold-integrated custom JOIN metric (`Old Notebooks not used/Step
    * 04b - Gold Phase of KITE - Handle custom metrics.scala:71-77`,
    * prod form `Gold state/Step 06c - write custom join metrics to
    * cosmos.scala:63-116`): the reference assembles a location row per
    * (ts, remote) from the latitude metric (131) and longitude metric
    * (130), filling a missing half from per-remote state it keeps in
    * Redis via a driver-side collect loop (default "0" when no state).
    *
    * Distributed replacement: one conditional aggregation pins the
    * halves observed at each (ts, remote, provider), then a running
    * `last(_, ignoreNulls)` window per (remote, provider) carries the
    * most recent known value of each half forward — exactly the Redis
    * hash semantics, but as a single shuffle + ordered window scan, no
    * driver state, no per-row network round trips. Emits gold-shaped
    * rows under `outMetricId` with `value_string = "<lat>,<lon>"`. */
  def customJoinMetrics(gold: DataFrame,
      latMetricId: Long = 9004L, lonMetricId: Long = 9015L,
      outMetricId: Long = 9105L, outCategoryId: Long = 4L): DataFrame = {
    val atTs = gold
      .filter(col("metric_id").isin(latMetricId, lonMetricId))
      .groupBy("unix_timestamp", "datestamp", "remote_id", "provider_id")
      .agg(
        max(when(col("metric_id") === latMetricId, col("value_string")))
          .as("lat_now"),
        max(when(col("metric_id") === lonMetricId, col("value_string")))
          .as("lon_now"))
    val w = Window.partitionBy("remote_id", "provider_id")
      .orderBy("unix_timestamp")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    atTs
      .withColumn("lat", coalesce(last(col("lat_now"), ignoreNulls = true)
        .over(w), lit("0")))
      .withColumn("lon", coalesce(last(col("lon_now"), ignoreNulls = true)
        .over(w), lit("0")))
      .select(
        lit(null).cast("string").as("element"),
        col("unix_timestamp"),
        col("datestamp"),
        lit(null).cast("string").as("metric"),
        // DECIMAL(30,15) like every other gold producer, so a
        // unionByName with gold never coerces gold's column to double
        lit(null).cast(DecimalType(30, 15)).as("value_double"),
        concat(col("lat"), lit(","), col("lon")).as("value_string"),
        lit(outMetricId).as("metric_id"),
        col("provider_id"),
        lit(outCategoryId).as("category_id"),
        col("remote_id"),
        lit("JOIN").as("agg_type"))
  }

  /** Latest value per 4-part key (id without timestamp, [C6A]:126).
    * Deterministic tiebreak on the element (event) id. */
  def latest(gold: DataFrame): DataFrame = {
    // argmax as a hash aggregation, not a row_number window: the
    // max(struct) partials collapse map-side, so one row per serving
    // key reaches the shuffle instead of every gold reading being
    // shuffled AND sorted. Order is preserved exactly: struct
    // comparison is (ts, element) lexicographic, and a null element
    // ranks below any value under max() just as DESC NULLS LAST did;
    // payload fields sit after the tiebreaks and are never compared
    // for the tie-free (ts, element) data the oracle pins.
    gold
      .groupBy("remote_id", "metric_id", "provider_id", "category_id")
      .agg(max(struct(col("unix_timestamp"),
        col("element").cast("long").as("el"),
        col("value_double"), col("value_string"))).as("m"))
      .select(
        Fns.servingId(col("remote_id"), col("metric_id"),
          col("provider_id"), col("category_id")).as("id"),
        col("remote_id"), col("metric_id"), col("provider_id"),
        col("category_id"), col("m.unix_timestamp").as("unix_timestamp"),
        col("m.value_double").as("value_double"),
        col("m.value_string").as("value_string"))
  }
}
