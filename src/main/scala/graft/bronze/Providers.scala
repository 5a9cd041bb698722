package graft.bronze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Provider envelope parse layer (SURVEY.md §1.4, §2.4): the four
  * structurally-distinct wire formats the reference ingests, each with
  * a deterministic encoder (events -> envelope JSON) and the decoder
  * that mirrors the reference's parse exactly. Because encoding is
  * lossless at second precision, `decode(encode(events))` must
  * reproduce the source rows — which is how the DuckDB oracle checks
  * the whole parse layer without its own JSON round-trip.
  *
  *  - Hub stats ([P2]:241-252): declared StructType with parallel
  *    timestamp[]/mean_value[] arrays -> explode + arrays_zip.
  *  - ASM ([P2]:96-142): open-ended MapType data -> map explode
  *    (distributed, replacing the reference's driver collect loop ST7).
  *  - EVO ([P3]:32-47): JSON-array-in-string envelope ->
  *    get_json_object + from_json(ArrayType(StringType)) + per-record
  *    JSONPath, 12-hour "M/d/yy h:m:s a" timestamps, LAT-LONG gate.
  *  - Intelsat usage ([P2]:724-771): 3-level nested arrays -> chained
  *    explodes + usage add-up aggregation.
  */
object Providers {

  // ------------------------------------------------------------ hub stats

  /** [P2]:241-252 verbatim shape. */
  val hubStatSchema: StructType = StructType(Seq(
    StructField("errors", ArrayType(StringType)),
    StructField("data", ArrayType(StructType(Seq(
      StructField("element", StringType),
      StructField("timestamp", ArrayType(LongType)),
      StructField("mean_value", ArrayType(StringType)),
      StructField("metric", StringType))))),
    StructField("meta", StructType(Seq(StructField("count", LongType))))))

  /** One envelope per user: data[] holds one element per event_type,
    * with parallel ts/value arrays sorted by (ts, value). */
  def hubStatEncode(events: DataFrame): DataFrame = {
    val perMetric = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(sort_array(collect_list(struct(
        unix_timestamp(col("ts")).as("t"),
        col("value").cast("string").as("v")))).as("arr"))
      .select(col("user_id"),
        struct(
          concat(lit("E"), col("user_id")).as("element"),
          transform(col("arr"), x => x.getField("t")).as("timestamp"),
          transform(col("arr"), x => x.getField("v")).as("mean_value"),
          col("event_type").as("metric")).as("elem"))
    perMetric
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("elem"))).as("data"))
      .select(to_json(struct(
        array().cast("array<string>").as("errors"),
        col("data"),
        struct(size(col("data")).cast("long").as("count")).as("meta")))
        .as("value"))
  }

  /** The reference's parse: from_json -> explode(data) -> arrays_zip ->
    * explode ([P2]:256-270). */
  def hubStatDecode(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), hubStatSchema).as("p"))
      .select(explode(col("p.data")).as("d"))
      .select(col("d.element").as("element"), col("d.metric").as("metric"),
        explode(arrays_zip(col("d.timestamp"), col("d.mean_value"))).as("z"))
      .select(col("element"), col("metric"),
        col("z.timestamp").as("ts"), col("z.mean_value").as("value"))

  // ------------------------------------------------------------------ ASM

  /** [P2]:104 verbatim: open-ended string->string maps. */
  val asmSchema: StructType = new StructType()
    .add("data", MapType(StringType, StringType))
    .add("meta", MapType(StringType, StringType))

  /** One envelope per event: data carries the (value, k) readings,
    * meta the serial + timestamp. */
  def asmEncode(events: DataFrame): DataFrame =
    events.select(to_json(struct(
      map(lit("value"), col("value").cast("string"),
        lit("k"), get_json_object(col("props"), "$.k")).as("data"),
      map(lit("Serial"), concat(lit("SN"), col("user_id")),
        lit("Timestamp"), unix_timestamp(col("ts")).cast("string"))
        .as("meta"))).as("value"))

  /** Distributed form of the reference's per-row driver loop
    * ([P2]:119-142, anti-pattern ST7): one from_json + map explode. */
  def asmDecode(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), asmSchema).as("p"))
      .select(
        element_at(col("p.meta"), "Serial").as("serial"),
        element_at(col("p.meta"), "Timestamp").cast("long").as("ts"),
        explode(col("p.data")).as(Seq("name", "value")))

  // ------------------------------------------------------------------ EVO

  /** Envelope: {"header":{"table":...},"data":"[{...},{...}]"} — the
    * data field is a STRING holding a JSON array. Timestamps travel in
    * the reference's 12-hour "M/d/yy h:m:s a" format; error events
    * carry LAT-LONG / plain msgs to exercise the event_msg gate. */
  def evoEncode(events: DataFrame): DataFrame = {
    val table = when(col("event_type") === "error", "event_msg")
      .otherwise(col("event_type"))
    val msg = when(col("event_type") === "error" && col("value") > 100,
      concat(lit("LAT-LONG "), col("value").cast("string")))
      .otherwise(concat(lit("msg-"), col("value").cast("string")))
    events.select(to_json(struct(
      struct(table.as("table")).as("header"),
      to_json(array(struct(
        date_format(col("ts"), "M/d/yy h:m:s a").as("timestamp"),
        col("event_id").cast("string").as("unique_id"),
        msg.as("msg")))).as("data"))).as("value"))
  }

  /** [P3]:32-47 verbatim flow: JSONPath envelope pulls, explode of the
    * JSON-array-in-string, 12-hour timestamp parse, LAT-LONG gate. */
  def evoDecode(raw: DataFrame): DataFrame =
    raw.select(
        get_json_object(col("value"), "$.header.table").as("table"),
        explode(from_json(get_json_object(col("value"), "$.data"),
          ArrayType(StringType))).as("data"))
      .withColumn("timestamp",
        unix_timestamp(get_json_object(col("data"), "$.timestamp"),
          "M/d/yy h:m:s a"))
      .withColumn("unique_id", get_json_object(col("data"), "$.unique_id"))
      .withColumn("msg", get_json_object(col("data"), "$.msg"))
      .filter((col("table") === "event_msg" &&
        !col("msg").startsWith("LAT-LONG")) === false)
      .select("table", "unique_id", "timestamp", "msg")

  // ------------------------------------------------------------- Intelsat

  /** [P2]:724-739 verbatim 3-level nesting. */
  val intelsatUsageSchema: StructType = StructType(Seq(
    StructField("errors", ArrayType(StringType)),
    StructField("usages", ArrayType(StructType(Seq(
      StructField("terminalId", StringType),
      StructField("requestedStartTimestamp", LongType),
      StructField("resolutionSeconds", LongType),
      StructField("networkProfiles", ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("usages", ArrayType(StructType(Seq(
          StructField("bytesReceived", LongType),
          StructField("bytesTransmitted", LongType),
          StructField("timestamp", LongType)))))))))))))))

  /** One envelope per user: networkProfiles per event_type, usages per
    * event (bytes derived deterministically from k / value). */
  def intelsatEncode(events: DataFrame): DataFrame = {
    val perProfile = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(sort_array(collect_list(struct(
        unix_timestamp(col("ts")).as("t"),
        get_json_object(col("props"), "$.k").cast("long").as("br"),
        round(col("value") * 100).cast("long").as("bt")))).as("arr"))
      .select(col("user_id"),
        struct(col("event_type").as("id"),
          transform(col("arr"), x => struct(
            x.getField("br").as("bytesReceived"),
            x.getField("bt").as("bytesTransmitted"),
            x.getField("t").as("timestamp"))).as("usages")).as("profile"))
    perProfile
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("profile"))).as("profiles"))
      .select(to_json(struct(
        array().cast("array<string>").as("errors"),
        array(struct(
          concat(lit("T"), col("user_id")).as("terminalId"),
          lit(0L).as("requestedStartTimestamp"),
          lit(300L).as("resolutionSeconds"),
          col("profiles").as("networkProfiles"))).as("usages")))
        .as("value"))
  }

  /** [P2]:757-771: three chained explodes down the nesting. */
  def intelsatDecode(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), intelsatUsageSchema).as("p"))
      .select(explode(col("p.usages")).as("u"))
      .select(col("u.terminalId").as("terminal_id"),
        explode(col("u.networkProfiles")).as("np"))
      .select(col("terminal_id"), col("np.id").as("sspc_id"),
        explode(col("np.usages")).as("usage"))
      .select(col("terminal_id"), col("sspc_id"),
        col("usage.bytesReceived").as("bytes_received"),
        col("usage.bytesTransmitted").as("bytes_transmitted"),
        col("usage.timestamp").as("ts"))

  /** The Intelsat usage add-up ([P2]:780-783): totals per terminal and
    * profile. */
  def intelsatAddUp(decoded: DataFrame): DataFrame =
    decoded.groupBy("terminal_id", "sspc_id")
      .agg(sum("bytes_received").as("sum_received"),
        sum("bytes_transmitted").as("sum_transmitted"),
        count(lit(1)).as("n"))
}
