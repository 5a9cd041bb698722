package graft.queries

import org.apache.spark.sql.functions._
import graft.bronze.Providers
import graft.sources.Tables

/** Provider parse-layer queries: each encodes the events table into a
  * provider wire format and decodes it with the reference's exact parse
  * flow. Encoding is lossless at second precision, so the oracle checks
  * the decoded rows straight against the original events — a full
  * round-trip proof of the J-layer for each envelope shape.
  */
object BronzeQueries {

  val all: Map[String, Q] = Map(

    // hub stats: StructType + explode + arrays_zip parallel arrays.
    "b01_hub_stats" -> Q(
      """SELECT 'E' || CAST(user_id AS VARCHAR) AS element,
        |       event_type AS metric,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |       CAST(value AS VARCHAR) AS value
        |FROM events ORDER BY element, metric, ts, value""".stripMargin) { (s, d) =>
      Providers.hubStatDecode(Providers.hubStatEncode(Tables.events(s, d)))
        .orderBy("element", "metric", "ts", "value")
    },

    // ASM: MapType data map-exploded, distributed (ST7 fixed).
    "b02_asm_map" -> Q(
      """SELECT serial, ts, name, value FROM (
        |  SELECT 'SN' || CAST(user_id AS VARCHAR) AS serial,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         'value' AS name, CAST(value AS VARCHAR) AS value
        |  FROM events
        |  UNION ALL
        |  SELECT 'SN' || CAST(user_id AS VARCHAR),
        |         CAST(floor(epoch(ts)) AS BIGINT),
        |         'k', json_extract_string(props, '$.k')
        |  FROM events)
        |ORDER BY serial, ts, name, value""".stripMargin) { (s, d) =>
      Providers.asmDecode(Providers.asmEncode(Tables.events(s, d)))
        .orderBy("serial", "ts", "name", "value")
    },

    // EVO: JSON-array-in-string, 12-hour timestamp parse, LAT-LONG gate.
    "b03_evo_envelope" -> Q(
      """SELECT CASE WHEN event_type = 'error' THEN 'event_msg'
        |            ELSE event_type END AS "table",
        |       CAST(event_id AS VARCHAR) AS unique_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS timestamp,
        |       CASE WHEN event_type = 'error' AND value > 100
        |              THEN 'LAT-LONG ' || CAST(value AS VARCHAR)
        |            ELSE 'msg-' || CAST(value AS VARCHAR) END AS msg
        |FROM events
        |WHERE NOT (event_type = 'error' AND NOT (value > 100))
        |ORDER BY unique_id""".stripMargin) { (s, d) =>
      Providers.evoDecode(Providers.evoEncode(Tables.events(s, d)))
        .orderBy("unique_id")
    },

    // Intelsat: 3-level nested explode + usage add-up (A3 batch form).
    "b04_intelsat_usage" -> Q(
      """SELECT 'T' || CAST(user_id AS VARCHAR) AS terminal_id,
        |       event_type AS sspc_id,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_received,
        |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_transmitted,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2
        |ORDER BY terminal_id, sspc_id""".stripMargin) { (s, d) =>
      Providers.intelsatAddUp(
          Providers.intelsatDecode(
            Providers.intelsatEncode(Tables.events(s, d))))
        .orderBy("terminal_id", "sspc_id")
    }
  )
}
