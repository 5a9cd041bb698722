package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.RegexpExtractAllNegate
import graft.sources.Tables

/** Queries exercising the custom expression layer (SURVEY.md §2.12 U1).
  * Coordinate strings are synthesized from event values + a derived
  * hemisphere letter so the DuckDB oracle can rebuild them verbatim.
  */
object ExprQueries {

  val all: Map[String, Q] = Map(

    // U1 regexp extract-all + hemisphere negate, driven per-row like the
    // reference drives it from metricmappings.regex ([P3]:243-245).
    "q28_geo_extract" -> Q(
      """SELECT event_id, raw,
        |       CASE WHEN joined = '' THEN ''
        |            WHEN substr(joined, -1, 1) IN ('W','S')
        |              THEN '-' || substr(joined, 1, len(joined) - 1)
        |            ELSE substr(joined, 1, len(joined) - 1) END AS coord
        |FROM (
        |  SELECT event_id, raw,
        |         array_to_string(regexp_extract_all(raw, '[0-9.]+[NSEW]', 0), ',') AS joined
        |  FROM (
        |    SELECT event_id,
        |           CAST(value AS VARCHAR) ||
        |           CASE CAST(user_id % 4 AS INTEGER) WHEN 0 THEN 'N' WHEN 1 THEN 'S'
        |                WHEN 2 THEN 'E' ELSE 'W' END AS raw
        |    FROM events WHERE event_id < 500))
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val hemi = col("user_id") % 4
      Tables.events(s, d)
        .filter(col("event_id") < 500)
        .select(col("event_id"),
          concat(col("value").cast("string"),
            when(hemi === 0, "N").when(hemi === 1, "S")
              .when(hemi === 2, "E").otherwise("W")).as("raw"))
        .select(col("event_id"), col("raw"),
          RegexpExtractAllNegate(col("raw"), lit("[0-9.]+[NSEW]"), lit(0))
            .as("coord"))
        .orderBy("event_id")
    },

    // skew-salted aggregation: event_type is a low-cardinality (hot)
    // key; the two-stage salted aggregate must equal the plain GROUP BY
    // exactly (sums through decimal for order independence).
    "q30_salted_agg" -> Q(
      """SELECT event_type,
        |       CAST(round(sum(CAST(value AS DECIMAL(20,2))), 2) AS DOUBLE) AS sum_value,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("value", col("value").cast("decimal(20,2)"))
      graft.functions.Salt
        .saltedSumCount(ev, Seq("event_type"), "value",
          nSalts = 16, entropy = col("event_id"))
        .select(col("event_type"),
          round(col("sum_value"), 2).cast("double").as("sum_value"), col("n"))
        .orderBy("event_type")
    }
  )
}
