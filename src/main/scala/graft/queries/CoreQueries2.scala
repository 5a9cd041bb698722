package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Second relational/JSON operator wave (SURVEY.md §2.4–§2.9): schema'd
  * JSON parsing, nested array explode + positional zip, map explode,
  * JSON serialization, array item access, disjunctive joins, HAVING
  * dup-detection, the collect_list JOIN-metric assembly, distinct,
  * global sort+limit, and the spark.sql registered-view surface.
  */
object CoreQueries2 {

  val all: Map[String, Q] = Map(

    // J2 from_json with a declared schema + J1 array-index JSONPath
    // ($.data[0]-style pull, Bronze-Silver/Part3:32-37 shape).
    "q17_from_json" -> Q(
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       CAST(json_extract_string('[' || props || ']', '$[0].k') AS BIGINT) AS k_idx
        |FROM events WHERE event_id < 300 ORDER BY event_id""".stripMargin) { (s, d) =>
      val schema = StructType(Seq(StructField("k", LongType)))
      Tables.events(s, d)
        .filter(col("event_id") < 300)
        .select(col("event_id"),
          from_json(col("props"), schema).getField("k").as("k"),
          get_json_object(concat(lit("["), col("props"), lit("]")), "$[0].k")
            .cast("long").as("k_idx"))
        .orderBy("event_id")
    },

    // A6 + J4 + J5: collect_list(struct) per key, sorted for determinism,
    // then arrays_zip + explode back — round-trips the parallel-array
    // pattern (Part2:270,424,582) and must reproduce the direct sum.
    "q18_zip_explode" -> Q(
      """SELECT l_orderkey,
        |       round(sum(l_quantity * l_extendedprice), 2) AS amount
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      // one sorted source array, split into two parallel arrays with
      // transform() so positions stay aligned even under duplicate keys
      val arrs = l.groupBy("l_orderkey").agg(
        sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice")))).as("arr"))
        .select(col("l_orderkey"),
          transform(col("arr"), x => struct(x.getField("l_quantity").as("l_quantity"))).as("qarr"),
          transform(col("arr"), x => struct(x.getField("l_extendedprice").as("l_extendedprice"))).as("parr"))
      arrs
        .select(col("l_orderkey"),
          explode(arrays_zip(col("qarr"), col("parr"))).as("z"))
        .select(col("l_orderkey"),
          (col("z.qarr.l_quantity") * col("z.parr.l_extendedprice")).as("amt"))
        .groupBy("l_orderkey")
        .agg(round(sum("amt"), 2).as("amount"))
        .orderBy("l_orderkey")
    },

    // J6 map explode (ASM's open-ended key->value data map, Part2:133).
    "q19_map_explode" -> Q(
      """SELECT event_id, name, value FROM (
        |  SELECT event_id, 'k' AS name, json_extract_string(props, '$.k') AS value FROM events
        |  UNION ALL
        |  SELECT event_id, 'value', CAST(value AS VARCHAR) FROM events)
        |WHERE event_id < 300 ORDER BY event_id, name""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 300)
        .select(col("event_id"),
          explode(map(
            lit("k"), get_json_object(col("props"), "$.k"),
            lit("value"), col("value").cast("string"))).as(Seq("name", "value")))
        .orderBy("event_id", "name")
    },

    // J7 to_json(struct(...)) row serialization (Redis value shape,
    // Detection Data Lack/...d-pipeline.scala:143-149).
    "q20_to_json" -> Q(
      """SELECT event_id,
        |       CAST(to_json(struct_pack(event_id := event_id,
        |                                event_type := event_type,
        |                                user_id := user_id)) AS VARCHAR) AS doc
        |FROM events WHERE event_id < 300 ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 300)
        .select(col("event_id"),
          to_json(struct(col("event_id"), col("event_type"), col("user_id")))
            .as("doc"))
        .orderBy("event_id")
    },

    // J8 array item access: getItem on a split array (Interfaces[0]
    // pattern, Part1:123-130).
    "q21_array_access" -> Q(
      """SELECT doc_id, (string_split(text, ' '))[1] AS w0,
        |       (string_split(text, ' '))[2] AS w1,
        |       len(string_split(text, ' ')) AS n_items
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          col("ws").getItem(0).as("w0"),
          col("ws").getItem(1).as("w1"),
          size(col("ws")).cast("long").as("n_items"))
        .orderBy("doc_id")
    },

    // JN3 disjunctive join condition: equi key + OR residual
    // (Part2:868-874 shape).
    "q22_disjunctive_join" -> Q(
      """SELECT o_orderpriority, count(*) AS n,
        |       round(sum(l_extendedprice), 2) AS total
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND (l_returnflag = 'R' OR o_totalprice > 150000)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey")
          && (l("l_returnflag") === "R" || o("o_totalprice") > 150000))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    },

    // A5 dup/anomaly detection via GROUP BY ... HAVING count(*) > k
    // (Query the delta tables.scala:413-418).
    "q23_having" -> Q(
      """SELECT l_orderkey, count(*) AS n_lines
        |FROM lineitem GROUP BY 1 HAVING count(*) > 5
        |ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"))
        .filter(col("n_lines") > 5)
        .orderBy("l_orderkey")
    },

    // A6/U3 JOIN-metric assembly: per (user, day) gather per-metric sums
    // into a map, emit "click,view" location-style pair — the lat+long →
    // "lat,long" custom metric done distributed (map_from_entries
    // replacing the Redis driver loop, Old .../Step 04b:71-77).
    "q24_join_metric" -> Q(
      """SELECT user_id, bucket_ts,
        |       round(coalesce(click_sum, 0), 3) || ',' ||
        |       round(coalesce(view_sum, 0), 3) AS pair
        |FROM (
        |  SELECT user_id,
        |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS bucket_ts,
        |         sum(CASE WHEN event_type = 'click' THEN value END) AS click_sum,
        |         sum(CASE WHEN event_type = 'view' THEN value END) AS view_sum
        |  FROM events GROUP BY 1, 2)
        |WHERE click_sum IS NOT NULL OR view_sum IS NOT NULL
        |ORDER BY user_id, bucket_ts""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .groupBy(col("user_id"),
          unix_timestamp(date_trunc("day", col("ts"))).as("bucket_ts"),
          col("event_type"))
        .agg(sum("value").as("v"))
        .groupBy("user_id", "bucket_ts")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("v"))))
          .as("m"))
        .select(col("user_id"), col("bucket_ts"),
          concat(
            round(coalesce(element_at(col("m"), "click"), lit(0)), 3).cast("string"),
            lit(","),
            round(coalesce(element_at(col("m"), "view"), lit(0)), 3).cast("string"))
            .as("pair"))
        .orderBy("user_id", "bucket_ts")
    },

    // A7 distinct (dropDuplicates over a projection, ASMON:39).
    "q25_distinct" -> Q(
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type")
    },

    // O1 global sort + O2 limit with a deterministic tiebreak
    // (Query ...:254,930).
    "q26_sort_limit" -> Q(
      """SELECT event_id, user_id, value FROM events
        |ORDER BY value DESC, event_id LIMIT 10""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select("event_id", "user_id", "value")
        .orderBy(col("value").desc, col("event_id"))
        .limit(10)
    },

    // §2.10 date/time family: date_sub, month truncation, from_unixtime
    // round-trips ([A5]:134, [Q1]:963-964 shapes).
    "q31_date_funcs" -> Q(
      """SELECT event_id,
        |       strftime(ts - INTERVAL 7 DAY, '%Y-%m-%d') AS week_ago,
        |       strftime(date_trunc('month', ts), '%Y-%m-%d') AS month_start,
        |       strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)),
        |                '%Y-%m-%d %H:%M:%S') AS rt,
        |       CAST(floor(epoch(date_trunc('month', ts))) AS BIGINT) AS month_ts
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 200)
        .select(col("event_id"),
          date_format(date_sub(col("ts"), 7), "yyyy-MM-dd").as("week_ago"),
          date_format(trunc(col("ts"), "month"), "yyyy-MM-dd").as("month_start"),
          from_unixtime(unix_timestamp(col("ts")), "yyyy-MM-dd HH:mm:ss").as("rt"),
          unix_timestamp(date_trunc("month", col("ts"))).as("month_ts"))
        .orderBy("event_id")
    },

    // S10 SQL over registered views — the ad-hoc query surface
    // (Query the delta tables.scala:28-34 + TPC-H Q3 shape).
    "q27_sql_view" -> Q(
      """SELECT o_orderpriority,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(DISTINCT o_orderkey) AS n_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT o_orderpriority,
          |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          |       count(DISTINCT o_orderkey) AS n_orders
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // correlated EXISTS + uncorrelated scalar subquery, same SQL text
    // on both engines: Catalyst decorrelates the EXISTS into a left
    // semi join and evaluates the scalar subquery once (a broadcast
    // scalar) — the analyst-SQL shapes a serving datalake answers
    // without the user ever writing a join.
    "q45_subqueries" -> Q(
      """SELECT c_mktsegment, count(*) AS n_big_spenders
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND CAST(o.o_totalprice AS DECIMAL(18,2))
        |        * (SELECT count(*) FROM orders)
        |        > 2 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |               FROM orders))
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_mktsegment, count(*) AS n_big_spenders
          |FROM customer c
          |WHERE EXISTS (
          |  SELECT 1 FROM orders o
          |  WHERE o.o_custkey = c.c_custkey
          |    AND CAST(o.o_totalprice AS DECIMAL(18,2))
          |        * (SELECT count(*) FROM orders)
          |        > 2 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
          |               FROM orders))
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    }
  )
}
