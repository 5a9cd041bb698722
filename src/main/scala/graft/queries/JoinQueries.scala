package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{AsOfJoin, RangeJoin}
import graft.sources.Tables

/** Join-operator queries beyond the reference's own shapes: the as-of
  * join ([[graft.operators.AsOfJoin]]) every telemetry attribution
  * problem eventually needs, verified against a window-mirror oracle.
  */
object JoinQueries {

  val all: Map[String, Q] = Map(

    // as-of join: every event picks up the same user's most recent
    // purchase at-or-before its timestamp (second resolution; ties
    // resolved toward the highest purchase event_id). Union-tag +
    // carry-forward — one shuffle, no range join; the oracle mirrors
    // the same union + running last_value shape.
    "q32_asof_join" -> Q(
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ets,
        |         event_type, value
        |  FROM events),
        |u AS (
        |  SELECT user_id, ets, 1 AS tag, event_id,
        |         CAST(NULL AS BIGINT) AS anchor_id,
        |         CAST(NULL AS DOUBLE) AS anchor_value
        |  FROM ev
        |  UNION ALL
        |  SELECT user_id, ets, 0 AS tag, NULL, event_id, value
        |  FROM ev WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id, tag,
        |         last_value(anchor_id IGNORE NULLS) OVER w AS asof_purchase_id,
        |         last_value(anchor_value IGNORE NULLS) OVER w
        |           AS asof_purchase_value
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ets, tag, anchor_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, asof_purchase_id, asof_purchase_value
        |FROM c WHERE tag = 1
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ets"), col("event_type"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ets").as("aets"),
          col("event_id").as("anchor_id"), col("value").as("anchor_value"))
      AsOfJoin.joinAsOf(
          ev.select("event_id", "user_id", "ets"), purchases,
          key = "user_id", leftTs = "ets", rightTs = "aets",
          payload = Seq("anchor_id", "anchor_value"),
          tieBreak = Seq("anchor_id"))
        .select(col("event_id"), col("anchor_id").as("asof_purchase_id"),
          col("anchor_value").as("asof_purchase_value"))
        .orderBy("event_id")
    },

    // O3 at scale: top-3 orders per market segment via the bounded
    // topk aggregate ([[graft.functions.TopKAgg]]) — map-side k-bounded
    // heaps, at most k rows per key per task cross the shuffle, versus
    // the row_number window (q09) that shuffles and sorts every row.
    // Same oracle as q09: results must be identical.
    "q33_topk_agg" -> Q(
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) WHERE rk <= 3
        |ORDER BY c_mktsegment, rk""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      // descending price, ascending orderkey tiebreak: negate the key
      // so the struct's natural "largest" ordering encodes both
      val packed = struct(col("o_totalprice").as("p"),
        (-col("o_orderkey")).as("nk"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(graft.functions.TopKAgg.topK(packed, 3).as("top"))
        .select(col("c_mktsegment"), posexplode(col("top")))
        .select(col("c_mktsegment"), (col("pos") + 1).cast("int").as("rk"),
          (-col("col.nk")).as("o_orderkey"), col("col.p").as("o_totalprice"))
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rk")
        .orderBy("c_mktsegment", "rk")
    },

    // cross-key point-in-interval range join (graft.operators
    // .RangeJoin): every 100th order opens a 7-day audit window; count
    // the lineitems (of ANY order) shipped inside each window. No equi
    // key exists, so the operator grids both sides onto week buckets
    // and equi-joins on the bucket — a SortMergeJoin both sides of
    // which shuffle once, instead of the O(|L|x|R|) nested loop the
    // naive inequality join plans. The oracle IS that inequality join.
    "q42_interval_overlap" -> Q(
      """WITH iv AS (
        |  SELECT o_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS lo_s
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |pt AS (
        |  SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) AS pt_s,
        |         CAST(l_quantity AS DECIMAL(18,2)) AS qty
        |  FROM lineitem)
        |SELECT o_orderkey, count(*) AS n_ship,
        |       CAST(sum(qty) AS DOUBLE) AS sum_qty
        |FROM iv JOIN pt ON pt_s >= lo_s AND pt_s < lo_s + 604800
        |GROUP BY 1 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val iv = Tables.orders(s, d)
        .where(pmod(col("o_orderkey"), lit(100L)) === 0)
        .select(col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("lo_s"))
        .withColumn("hi_s", col("lo_s") + 604800L)
      val pt = Tables.lineitem(s, d).select(
        unix_timestamp(col("l_shipdate")).as("pt_s"),
        col("l_quantity").cast(DecimalType(18, 2)).as("qty"))
      RangeJoin.pointInInterval(pt, iv, "pt_s", "lo_s", "hi_s", 604800L)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_ship"),
          sum("qty").cast("double").as("sum_qty"))
        .orderBy("o_orderkey")
    }
  )
}
