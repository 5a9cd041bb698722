package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.sources.Tables

/** Relational operator inventory (SURVEY.md §2.3–§2.10) expressed as
  * driver-checkable queries over the testdata tables. Every query has a
  * DuckDB oracle; every query ends in a deterministic ORDER BY so the
  * result set is stable under any comparison scheme.
  *
  * Floating-point policy: sums over non-integral doubles are rounded
  * (grid >> fp error) on BOTH sides; integral-double sums, min/max and
  * raw values are emitted unrounded.
  */
object CoreQueries {

  val all: Map[String, Q] = Map(
    // A1 multi-agg rollup — the reference's core groupBy(keys).agg(sum,avg,min,max)
    // (Gold Aggregation/Step 05:91-98); TPC-H Q1 shape on lineitem.
    // NOTE (r18): a DECIMAL(20,2)-summed + respread form of this query
    // was implemented and measured at 2.1x (0.36 -> 0.75 s, clean
    // window) — the decimal aggregation + extra exchange dominate at
    // this query's 0.3 s scale — and reverted per the guide's
    // measure-first discipline (OPTIMIZATION_r18.md, Finding 4).
    "q01_pricing_summary" -> Q(
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       sum(l_quantity) / count(*) AS avg_qty,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // F2 predicate filter + F1 projection; filters and 3-col ReadSchema must
    // reach the parquet scan (pushdown is asserted in PlanSpec).
    "q02_filter_project" -> Q(
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 45
        |  AND l_returnflag IN ('A','R')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") < to_timestamp(lit("1997-01-01"))
          && col("l_quantity") > 45
          && col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // JN1 stream-static-style equi join; customer is small → broadcast-hash
    // (auto via AQE; PlanSpec asserts BroadcastHashJoin).
    "q03_join_agg" -> Q(
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("c_mktsegment")
    },

    // JN2 conjunctive multi-condition equi join (Part3:214-219 shape:
    // rawSymbol=Name AND TableName=mappingType).
    "q04_multi_cond_join" -> Q(
      """SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_linestatus = o_orderstatus
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey")
          && l("l_linestatus") === o("o_orderstatus"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .orderBy("o_orderpriority")
    },

    // JN5 left outer join preserving unmatched dimension rows.
    "q05_outer_join" -> Q(
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |       round(coalesce(sum(o_totalprice), 0), 2) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(o("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0)), 2).as("spend"))
        .orderBy("c_custkey")
    },

    // JN6 anti-join (reference: NOT IN subquery, Detection Data Lack/…Orphaned
    // Usage…:22; DataFrame `except` SetUp:93) — as left_anti, no driver collect.
    "q06_anti_join" -> Q(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      // distinct keys only, broadcast: the anti side never needs the
      // full orders payload, and the key set stays small at any SF
      val o = Tables.orders(s, d).select("o_custkey").distinct()
      c.join(broadcast(o), c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // JN7 semi-join (reference uses isin(collect(...)) — SetUp:95; we keep it
    // distributed as left_semi).
    "q07_semi_join" -> Q(
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // W1/A4/JN8 latest-per-key: the reference's latest-metric snapshot
    // (Metric Stream to Cosmos/Step 06.c:57-64) via row_number window,
    // replacing the groupBy(max)+self-join form (Old…Step 05.d:97-140).
    "q08_latest_per_key" -> Q(
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type")
    },

    // O3 top-k per key (row_number <= k), deterministic tiebreak.
    "q09_window_topk" -> Q(
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) WHERE rk <= 3
        |ORDER BY c_mktsegment, rk""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rk")
        .orderBy("c_mktsegment", "rk")
    },

    // SO1–SO3: union / intersect / except — the reference's symmetric-
    // difference equality test (Set Up Delta Tables/…:10-15) as a query:
    // customers in BUILDING vs customers with a >100k order.
    "q10_set_ops" -> Q(
      """WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 100000)
        |(SELECT k FROM a UNION SELECT k FROM b)
        |EXCEPT (SELECT k FROM a INTERSECT SELECT k FROM b)
        |ORDER BY k""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("k")).distinct()
      a.union(b).distinct().except(a.intersect(b)).orderBy("k")
    },

    // J1 get_json_object path extraction on the events props payload
    // (Bronze-Silver/Part1:33 shape).
    "q11_json_extract" -> Q(
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       count(*) AS n, round(sum(value), 3) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
        .orderBy("k")
    },

    // J3 Name/Value unpivot — reference rebuilds JSON strings and re-parses
    // (Part1:169-180); here one Generate over array(struct(...)), then re-agg.
    "q12_unpivot" -> Q(
      """SELECT name, round(sum(CAST(value AS DOUBLE)), 2) AS total FROM (
        |  SELECT 'quantity' AS name, CAST(l_quantity AS VARCHAR) AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'extendedprice', CAST(l_extendedprice AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'discount', CAST(l_discount AS VARCHAR) FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(Fns.nameValueExplode(
          "quantity" -> col("l_quantity"),
          "extendedprice" -> col("l_extendedprice"),
          "discount" -> col("l_discount")).as("nv"))
        .select(col("nv.name").as("name"), col("nv.value").cast("double").as("v"))
        .groupBy("name")
        .agg(round(sum("v"), 2).as("total"))
        .orderBy("name")
    },

    // A2 time-bucket derivation (hour) — date_trunc form of Step 05:84.
    // NOTE (r18): DECIMAL-sum + respread measured at 2.6x (0.25 ->
    // 0.65 s) and reverted — see q01's note / OPTIMIZATION_r18.md.
    "q13_hour_rollup" -> Q(
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_ts,
        |       event_type, count(*) AS n, round(sum(value), 3) AS sum_value,
        |       min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(Fns.hourBucket(col("ts")), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"),
          min("value").as("min_value"), max("value").as("max_value"))
        .orderBy("bucket_ts", "event_type")
    },

    // F6 composite-key fingerprint (md5 variant — DuckDB lacks sha1; the
    // library's sha1 form is dedupKey, exercised in ScalaTest).
    "q14_fingerprint" -> Q(
      """SELECT event_id, md5(concat_ws('|', 'evt', CAST(event_id AS VARCHAR),
        |       CAST(user_id AS VARCHAR), event_type)) AS fp
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 100)
        .select(col("event_id"),
          Fns.dedupKeyMd5("evt", col("event_id"), col("user_id"),
            col("event_type")).as("fp"))
        .orderBy("event_id")
    },

    // F3 CASE normalization + F4 null-fill (status-code mapping shape,
    // Part1:160-165).
    "q15_case_normalize" -> Q(
      """SELECT event_type,
        |       CASE WHEN event_type = 'error' THEN 3
        |            WHEN event_type = 'purchase' THEN 2
        |            WHEN event_type IN ('click','view') THEN 1
        |            ELSE 0 END AS code,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("code",
          when(col("event_type") === "error", 3)
            .when(col("event_type") === "purchase", 2)
            .when(col("event_type").isin("click", "view"), 1)
            .otherwise(0))
        .groupBy("event_type", "code")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // §2.10 string/date scalar layer: substring/instr/concat/date_format/
    // unix_timestamp over events.
    "q16_scalar_funcs" -> Q(
      """SELECT event_id,
        |       upper(substring(event_type, 1, 3)) AS ty3,
        |       instr(event_type, 'i') AS pos_i,
        |       concat(event_type, '#', CAST(user_id AS VARCHAR)) AS tag,
        |       strftime(ts, '%Y-%m-%d') AS datestamp,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 200)
        .select(col("event_id"),
          upper(substring(col("event_type"), 1, 3)).as("ty3"),
          instr(col("event_type"), "i").cast("long").as("pos_i"),
          concat(col("event_type"), lit("#"), col("user_id").cast("string")).as("tag"),
          Fns.datestamp(col("ts")).as("datestamp"),
          unix_timestamp(col("ts")).as("unix_ts"))
        .orderBy("event_id")
    }
  )
}
