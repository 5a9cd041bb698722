package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
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
    }
  )
}
