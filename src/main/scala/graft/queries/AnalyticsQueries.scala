package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Ad-hoc OLAP surface beyond the reference's own queries: exact
  * percentiles, ROLLUP grouping sets, and pivot — the analyst-facing
  * SQL a serving datalake ends up answering. All deterministic and
  * DuckDB-mirrored.
  */
object AnalyticsQueries {

  /** q51's oracle: replay `iters` PageRank rounds, each a contribution
    * join + sum structurally identical to the Spark loop in
    * graft.operators.PageRank, over the same mutualized edge list.
    * Pure integer pico-unit arithmetic (// is DuckDB's integer
    * division; all operands positive, so it matches Spark's `div`),
    * so the replay is bit-exact with no float rounding to align. */
  private def pagerankOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |         CAST(sum((((r.r * 17) // 20) * e.w) // ws.wsum)
         |           AS BIGINT) AS inflow
         |  FROM e JOIN r${i - 1} r ON e.src = r.node
         |  JOIN ws ON e.src = ws.src
         |  GROUP BY 1),
         |r$i AS (
         |  SELECT nodes.node,
         |         ((1000000000000 * 3) // 20) // nn.n
         |           + COALESCE(c$i.inflow, 0) AS r
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH eb AS (
       |  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
       |         count(*) AS w
       |  FROM lineitem GROUP BY 1, 2),
       |e AS (SELECT src, dst, w FROM eb
       |      UNION ALL SELECT dst, src, w FROM eb),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |ws AS (SELECT src, sum(w) AS wsum FROM e GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, 1000000000000 // nn.n AS r
       |       FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT rk,
       |       CASE WHEN node % 2 = 0 THEN 'p' || CAST(node // 2 AS VARCHAR)
       |            ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
       |       score_pico FROM (
       |  SELECT row_number() OVER (ORDER BY r DESC, node) AS rk, node,
       |         CAST(r AS BIGINT) AS score_pico
       |  FROM r$iters)
       |WHERE rk <= 25 ORDER BY rk""".stripMargin
  }

  val all: Map[String, Q] = Map(

    // exact interpolated percentiles per group (both engines implement
    // the same (N-1)*p linear interpolation); rounded on both sides.
    "q34_percentile" -> Q(
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.9), 4) AS p90,
        |       round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
      // NOTE (r18): a respread form measured 1.7x (0.19 -> 0.32 s) and
      // was reverted — exchange overhead dominates at this scale
      // (OPTIMIZATION_r18.md, Finding 4)
      Tables.events(s, d).groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))
        .orderBy("event_type")
    },

    // ROLLUP grouping sets: per (type, day), per type, and grand total
    // in one pass — partial aggregation covers all three levels.
    // grouping() flags disambiguate the null super-aggregate rows.
    // NOTE (r18): DECIMAL-sum + respread measured at 1.7x (0.33 ->
    // 0.56 s) and reverted — see OPTIMIZATION_r18.md, Finding 4.
    "q35_rollup_sets" -> Q(
      """SELECT event_type, CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT)
        |         AS day_ts,
        |       grouping(event_type) AS g_type,
        |       grouping(date_trunc('day', ts)) AS g_day,
        |       count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |GROUP BY ROLLUP (event_type, date_trunc('day', ts))
        |ORDER BY g_type, g_day, event_type, day_ts""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
          col("value"))
      e.rollup("event_type", "day")
        .agg(grouping("event_type").as("g_type"), grouping("day").as("g_day"),
          count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("event_type"), unix_timestamp(col("day")).as("day_ts"),
          col("g_type").cast("long"), col("g_day").cast("long"),
          col("n"), col("total"))
        .toDF("event_type", "day_ts", "g_type", "g_day", "n", "total")
        .orderBy("g_type", "g_day", "event_type", "day_ts")
    },

    // pivot: one row per user bucket, one count column per event type.
    // Spark's pivot plans a single partial-aggregated pass; the oracle
    // mirrors it as conditional aggregation (what pivot desugars to).
    "q36_pivot" -> Q(
      """SELECT user_id % 10 AS cohort,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |       count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |       count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin) { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      types.foldLeft(
        Tables.events(s, d)
          .select(pmod(col("user_id"), lit(10L)).as("cohort"),
            col("event_type"))
          .groupBy("cohort")
          .pivot("event_type", types)
          .count()
          .na.fill(0L)) { (df, t) => df.withColumnRenamed(t, s"n_$t") }
        .orderBy("cohort")
    },

    // cohort retention: customers grouped by first-order month, counted
    // distinct in each subsequent activity month. The cohort comes from
    // a whole-partition window min — one shuffle by customer, no
    // self-join back onto orders.
    "q43_cohort_retention" -> Q(
      """WITH fo AS (
        |  SELECT o_custkey, date_trunc('month', o_orderdate) AS m
        |  FROM orders),
        |w AS (
        |  SELECT o_custkey, m,
        |         min(m) OVER (PARTITION BY o_custkey) AS cohort
        |  FROM fo)
        |SELECT CAST(floor(epoch(cohort)) AS BIGINT) AS cohort_s,
        |       CAST(datediff('month', cohort, m) AS BIGINT) AS months_since,
        |       count(DISTINCT o_custkey) AS n_active
        |FROM w GROUP BY 1, 2
        |ORDER BY cohort_s, months_since""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
      Tables.orders(s, d)
        .select(col("o_custkey"),
          date_trunc("month", col("o_orderdate")).as("m"))
        .withColumn("cohort", min("m").over(w))
        .select(unix_timestamp(col("cohort")).as("cohort_s"),
          months_between(col("m"), col("cohort")).cast("long")
            .as("months_since"),
          col("o_custkey"))
        .groupBy("cohort_s", "months_since")
        .agg(countDistinct("o_custkey").as("n_active"))
        .orderBy("cohort_s", "months_since")
    },

    // engine-portable HyperLogLog (graft.functions.Hll): approximate
    // distinct devices per event type next to the exact count. The
    // whole sketch — poly-fold hash, bin()-derived rank, per-bucket
    // max, EXACT-integer denominator sum — replays bit-identically in
    // SQL, so an approximate sketch still hash-matches its oracle.
    // State per group is 256 bucket maxima, vs a full value shuffle
    // for count(DISTINCT): the 100 TB distinct-count shape.
    "q44_hll_distinct" -> Q(
      """WITH h AS (
        |  SELECT event_type, user_id,
        |         list_reduce(list_transform(
        |             string_split(md5(CAST(user_id AS VARCHAR)), ''),
        |             c -> CAST(ascii(c) AS BIGINT)),
        |           (acc, x) -> (acc * 31 + x) % 1073741789) * 1073741824 +
        |         list_reduce(list_transform(
        |             string_split(md5(CAST(user_id AS VARCHAR)), ''),
        |             c -> CAST(ascii(c) AS BIGINT)),
        |           (acc, x) -> (acc * 131 + x) % 1073741783) AS hh
        |  FROM events),
        |b AS (
        |  SELECT event_type, hh % 256 AS bucket,
        |         CASE WHEN hh // 256 = 0 THEN 53
        |              ELSE 53 - length(bin(hh // 256)) END AS rank
        |  FROM h),
        |mx AS (SELECT event_type, bucket, max(rank) AS rank
        |       FROM b GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type,
        |         CAST(sum(1::BIGINT << CAST(53 - rank AS INT)) AS BIGINT)
        |           AS sp,
        |         count(*) AS nb
        |  FROM mx GROUP BY 1),
        |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
        |       FROM events GROUP BY 1),
        |raw AS (
        |  SELECT event_type, nb,
        |         (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |           * 9007199254740992.0
        |           / CAST(sp + (256 - nb) * 9007199254740992 AS DOUBLE) AS r
        |  FROM agg)
        |SELECT event_type, nb,
        |       round(CASE WHEN r <= 640.0 AND nb < 256
        |             THEN 256.0 * ln(256.0 / CAST(256 - nb AS DOUBLE))
        |             ELSE r END, 4) AS hll_est,
        |       n_exact
        |FROM raw JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val est = graft.functions.Hll.distinctEstimate(
        ev, Seq("event_type"), col("user_id"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct("user_id").as("n_exact"))
      est.join(exact, "event_type")
        .select("event_type", "nb", "hll_est", "n_exact")
        .orderBy("event_type")
    },

    // Sketch REAGGREGATION — the pattern that makes sketches worth
    // storing at 100 TB: per-(event_type, day) HLL sketches are built
    // once (e.g. at ingest), then a month query merges the day partials
    // by bucket-wise max instead of rescanning raw events. max is
    // associative, so the merged estimate must equal the direct
    // whole-corpus estimate — which is exactly what the oracle computes
    // (without ever seeing the partials), proving the merge path
    // cross-engine.
    "q47_hll_rollup" -> Q(
      """WITH h AS (
        |  SELECT event_type, user_id,
        |         list_reduce(list_transform(
        |             string_split(md5(CAST(user_id AS VARCHAR)), ''),
        |             c -> CAST(ascii(c) AS BIGINT)),
        |           (acc, x) -> (acc * 31 + x) % 1073741789) * 1073741824 +
        |         list_reduce(list_transform(
        |             string_split(md5(CAST(user_id AS VARCHAR)), ''),
        |             c -> CAST(ascii(c) AS BIGINT)),
        |           (acc, x) -> (acc * 131 + x) % 1073741783) AS hh
        |  FROM events),
        |b AS (
        |  SELECT event_type, hh % 256 AS bucket,
        |         CASE WHEN hh // 256 = 0 THEN 53
        |              ELSE 53 - length(bin(hh // 256)) END AS rank
        |  FROM h),
        |mx AS (SELECT event_type, bucket, max(rank) AS rank
        |       FROM b GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type,
        |         CAST(sum(1::BIGINT << CAST(53 - rank AS INT)) AS BIGINT)
        |           AS sp,
        |         count(*) AS nb
        |  FROM mx GROUP BY 1),
        |days AS (
        |  SELECT event_type,
        |         count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days
        |  FROM events GROUP BY 1),
        |raw AS (
        |  SELECT event_type, nb,
        |         (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |           * 9007199254740992.0
        |           / CAST(sp + (256 - nb) * 9007199254740992 AS DOUBLE) AS r
        |  FROM agg)
        |SELECT event_type, n_days, nb,
        |       round(CASE WHEN r <= 640.0 AND nb < 256
        |             THEN 256.0 * ln(256.0 / CAST(256 - nb AS DOUBLE))
        |             ELSE r END, 4) AS hll_est
        |FROM raw JOIN days USING (event_type)
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      import graft.functions.Hll
      val ev = Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
      // day-partial sketches -> bucket-wise max merge -> month estimate
      val daySketches = Hll.sketch(ev, Seq("event_type", "day"),
        col("user_id"))
      val merged = daySketches.groupBy("event_type", "bucket")
        .agg(max("rank").as("rank"))
      Hll.estimate(merged, Seq("event_type"))
        .join(ev.groupBy("event_type")
          .agg(countDistinct("day").as("n_days")), "event_type")
        .select("event_type", "n_days", "nb", "hll_est")
        .orderBy("event_type")
    },

    // q47's quantile counterpart: per-(event_type, day) fixed-width
    // histograms built once, merged to whole-range p50/p90/p99 by
    // bucket-wise count sum — a month's p99 without rescanning raw
    // events. The oracle bins the raw corpus directly (never sees the
    // day partials); count-sum associativity makes the two equal.
    // Buckets are floor(value*4) (power-of-two scaling, IEEE-exact) and
    // rank selection runs in scaled integers, so both engines pick the
    // same bucket and interpolate identically.
    "q48_hist_quantile_rollup" -> Q(
      """WITH h AS (
        |  SELECT event_type, CAST(floor(value * 4) AS BIGINT) AS bucket,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, bucket, c,
        |         sum(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
        |         sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM h),
        |px AS (SELECT unnest([50, 90, 99]) AS p100),
        |sel AS (
        |  SELECT cum.event_type, px.p100, bucket, c, cum.cum, n,
        |         row_number() OVER (PARTITION BY cum.event_type, px.p100
        |                            ORDER BY bucket) AS rn
        |  FROM cum, px
        |  WHERE cum.cum * 100 >= px.p100 * n)
        |SELECT event_type, p100,
        |       round((bucket + (p100 * n - 100 * (cum - c)) / (100.0 * c))
        |             / 4.0, 4) AS est
        |FROM sel WHERE rn = 1
        |ORDER BY event_type, p100""".stripMargin) { (s, d) =>
      import graft.functions.Hist
      val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
      // day-partial histograms -> bucket-wise count-sum -> percentiles
      val day = Hist.sketch(ev, Seq("event_type", "day"),
        col("value"), scale = 2)
      val merged = day.groupBy("event_type", "bucket")
        .agg(sum("c").as("c"))
      Hist.quantiles(merged, Seq("event_type"), Seq(50, 90, 99), scale = 2)
        .orderBy("event_type", "p100")
    },

    // The sketch family's point-frequency member: per-day Count-Min
    // partials (4x512 cells) -> cell-wise sum -> whole-range frequency
    // estimates for the top-20 users, beside their exact counts. The
    // oracle derives every cell directly from the raw corpus (never
    // sees the day partials); cell-sum associativity makes the two
    // equal, and est >= exact is the CM upper-bound guarantee. Buckets
    // are poly_hash64(md5(j ':' user)) % 512, replayed verbatim below.
    "q49_cms_freq_rollup" -> Q(
      """WITH uc AS (SELECT user_id, count(*) AS exact FROM events GROUP BY 1),
        |js AS (SELECT unnest([1, 2, 3, 4]) AS j),
        |tb AS (
        |  SELECT user_id, exact, j,
        |         (list_reduce(list_transform(
        |              string_split(md5(CAST(j AS VARCHAR) || ':' ||
        |                               CAST(user_id AS VARCHAR)), ''),
        |              c -> CAST(ascii(c) AS BIGINT)),
        |            (acc, x) -> (acc * 31 + x) % 1073741789) * 1073741824 +
        |          list_reduce(list_transform(
        |              string_split(md5(CAST(j AS VARCHAR) || ':' ||
        |                               CAST(user_id AS VARCHAR)), ''),
        |              c -> CAST(ascii(c) AS BIGINT)),
        |            (acc, x) -> (acc * 131 + x) % 1073741783)) % 512 AS bucket
        |  FROM uc, js),
        |cells AS (SELECT j, bucket, CAST(sum(exact) AS BIGINT) AS c
        |          FROM tb GROUP BY 1, 2),
        |top AS (SELECT user_id, exact FROM uc
        |        ORDER BY exact DESC, user_id LIMIT 20),
        |est AS (SELECT tb.user_id, min(cells.c) AS est
        |        FROM tb JOIN cells USING (j, bucket)
        |        WHERE tb.user_id IN (SELECT user_id FROM top)
        |        GROUP BY 1)
        |SELECT t.user_id, t.exact, e.est
        |FROM top t JOIN est e USING (user_id)
        |ORDER BY t.exact DESC, t.user_id""".stripMargin) { (s, d) =>
      import graft.functions.Cms
      val ev = Tables.events(s, d)
      val day = Cms.sketch(ev.withColumn("day", to_date(col("ts"))),
        Seq("day"), col("user_id"), d = 4, w = 512)
      // range query: drop the day key, sum cells — the stored-partials path
      val merged = day.groupBy("j", "bucket").agg(sum("c").as("c"))
      val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("user_id")).limit(20)
      Cms.estimate(merged, top, col("user_id"), d = 4, w = 512)
        .select("user_id", "exact", "est")
        .orderBy(col("exact").desc, col("user_id"))
    },

    // damped PageRank (3 fixed rounds) over the part<->supplier
    // co-occurrence graph from lineitem — the iterative WEIGHTED
    // propagation pattern (ConnectedComponents is its unweighted
    // sibling). Ranks are integer pico-units end to end (see
    // operators/PageRank.scala), so the oracle replays the identical
    // rounds (the BPE-learner replay idiom) with zero float alignment
    // and the top-25 is exact by construction.
    "q51_pagerank" -> Q(pagerankOracle(3)) { (s, d) =>
      import graft.operators.PageRank
      import org.apache.spark.sql.expressions.Window
      // respread (guide §2.5): the edge-list aggregation's map side is
      // a 600k-row partial agg that a single-row-group input runs
      // one-task
      val li = graft.functions.Spread.across(Tables.lineitem(s, d))
      // long node ids (part = 2k, supplier = 2k+1): the edge list
      // shuffles every round, so keys stay fixed-width; labels are
      // rendered only on the final 25 rows
      val eb = li.groupBy(
          (col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .agg(count(lit(1)).as("w"))
      val e = eb.union(eb.select(col("dst"), col("src"), col("w")))
      val top = PageRank.ranks(e, iters = 3)
        .orderBy(col("r").desc, col("node")).limit(25)
      top
        .withColumn("rk", row_number().over(
          Window.orderBy(col("r").desc, col("node"))))
        .select(col("rk"),
          concat(when(col("node") % 2 === 0, lit("p")).otherwise(lit("s")),
            expr("node div 2")).as("node"),
          col("r").as("score_pico"))
        .orderBy("rk")
    },

    // ordered-sequence funnel: users reaching view -> click -> purchase,
    // each step strictly after the previous one's FIRST occurrence and
    // within a 1-day conversion window of it (the canonical
    // product-analytics conversion query). Each step is one
    // aggregate + one key join on user_id — co-partitioned after the
    // first shuffle, no per-user sorting or driver state, so the chain
    // is O(events) at any scale. Conversion rates are integer ppm
    // (count * 1e6 div previous) — no float anywhere. Timestamps
    // compare at second grain on both engines (the repo's epoch idiom),
    // so the step semantics are engine-identical.
    "q52_funnel" -> Q(
      """WITH s1 AS (
        |  SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click'
        |    AND CAST(floor(epoch(e.ts)) AS BIGINT) > s1.t1
        |    AND CAST(floor(epoch(e.ts)) AS BIGINT) <= s1.t1 + 86400
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND CAST(floor(epoch(e.ts)) AS BIGINT) > s2.t2
        |    AND CAST(floor(epoch(e.ts)) AS BIGINT) <= s2.t2 + 86400
        |  GROUP BY 1),
        |n1 AS (SELECT count(*) AS n FROM s1),
        |n2 AS (SELECT count(*) AS n FROM s2),
        |n3 AS (SELECT count(*) AS n FROM s3)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS event_type, n AS n_users,
        |         1000000 AS conv_ppm FROM n1
        |  UNION ALL
        |  SELECT 2, 'click', n2.n, (n2.n * 1000000) // n1.n
        |  FROM n2 CROSS JOIN n1
        |  UNION ALL
        |  SELECT 3, 'purchase', n3.n, (n3.n * 1000000) // n2.n
        |  FROM n3 CROSS JOIN n2)
        |ORDER BY step""".stripMargin) { (s, d) =>
      // NOTE (r18): a respread form (events projected to the three
      // funnel columns, then Spread.across) was measured at 0.59 ->
      // 0.68-0.84 s across clean windows and reverted: the three step
      // scans' map work (filter + partial min) is lighter than the
      // exchange that would parallelize it (OPTIMIZATION_r18.md,
      // Finding 4).
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_s"))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_s").as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("ts_s") > col("t1") && col("ts_s") <= col("t1") + 86400)
        .groupBy("user_id").agg(min("ts_s").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("ts_s") > col("t2") && col("ts_s") <= col("t2") + 86400)
        .groupBy("user_id").agg(min("ts_s").as("t3"))
      val n1 = s1.agg(count(lit(1)).as("n1"))
      val n2 = s2.agg(count(lit(1)).as("n2"))
      val n3 = s3.agg(count(lit(1)).as("n3"))
      val r1 = n1.select(lit(1).as("step"), lit("view").as("event_type"),
        col("n1").as("n_users"), lit(1000000L).as("conv_ppm"))
      val r2 = n2.crossJoin(n1).select(lit(2).as("step"),
        lit("click").as("event_type"), col("n2").as("n_users"),
        expr("(n2 * 1000000) div n1").as("conv_ppm"))
      val r3 = n3.crossJoin(n2).select(lit(3).as("step"),
        lit("purchase").as("event_type"), col("n3").as("n_users"),
        expr("(n3 * 1000000) div n2").as("conv_ppm"))
      r1.union(r2).union(r3).orderBy("step")
    },

    // Triangle counting over the part co-purchase graph (parts that
    // appear in the same order), restricted to a one-year ship window
    // so graph density stays sf-proportional. Uses the FORWARD
    // algorithm with degree-ordered orientation (Chiba–Nishizeki):
    // every undirected edge is directed from its (degree, id)-smaller
    // endpoint, which bounds every out-degree by O(sqrt(m)) and hence
    // the wedge set by O(m^1.5) REGARDLESS of hub skew — the property
    // that keeps this join-only plan alive at 100 TB where naive
    // id-orientation lets one popular part generate a quadratic wedge
    // explosion. Three hash joins, all on bounded keys; all integers.
    "q53_triangles" -> Q(
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01'),
        |ecan AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        |  WHERE x.l_partkey < y.l_partkey),
        |deg AS (
        |  SELECT node, count(*) AS dg FROM (
        |    SELECT a AS node FROM ecan
        |    UNION ALL SELECT b FROM ecan) GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND ecan.a < ecan.b)
        |              THEN ecan.a ELSE ecan.b END AS src,
        |         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND ecan.a < ecan.b)
        |              THEN ecan.b ELSE ecan.a END AS dst,
        |         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND ecan.a < ecan.b)
        |              THEN db.dg ELSE da.dg END AS ddst
        |  FROM ecan JOIN deg da ON ecan.a = da.node
        |            JOIN deg db ON ecan.b = db.node),
        |w AS (
        |  SELECT o1.dst AS b, o2.dst AS c
        |  FROM o o1 JOIN o o2 ON o1.src = o2.src
        |  WHERE o1.ddst < o2.ddst
        |     OR (o1.ddst = o2.ddst AND o1.dst < o2.dst)),
        |tri AS (
        |  SELECT count(*) AS n_triangles FROM w
        |  WHERE EXISTS (SELECT 1 FROM o
        |                WHERE o.src = w.b AND o.dst = w.c))
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |       (SELECT count(*) FROM ecan) AS n_edges,
        |       (SELECT count(*) FROM w) AS n_wedges,
        |       n_triangles,
        |       CASE WHEN (SELECT count(*) FROM w) = 0 THEN 0
        |            ELSE (n_triangles * 1000000) // (SELECT count(*) FROM w)
        |       END AS closure_ppm
        |FROM tri""".stripMargin) { (s, d) =>
      // NOTE (r18): a respread form (ship-window filter + 2-column
      // projection below the exchange, then Spread.across before the
      // distinct) was measured at 1.80 -> 1.86-2.40 s across clean
      // windows and reverted: the scan is not this query's bottleneck
      // (the wedge-join pipeline is — no single dominant stage in the
      // profile), so the extra exchange only adds cost
      // (OPTIMIZATION_r18.md, Finding 4).
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_partkey").distinct()
      val ecan = li.as("x").join(li.as("y"), Seq("l_orderkey"))
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .distinct()
      val deg = ecan.select(col("a").as("node"))
        .union(ecan.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
      val lt = (col("da") < col("db")) ||
        (col("da") === col("db") && col("a") < col("b"))
      val o = ecan
        .join(deg.select(col("node").as("a"), col("dg").as("da")), Seq("a"))
        .join(deg.select(col("node").as("b"), col("dg").as("db")), Seq("b"))
        .select(
          when(lt, col("a")).otherwise(col("b")).as("src"),
          when(lt, col("b")).otherwise(col("a")).as("dst"),
          when(lt, col("db")).otherwise(col("da")).as("ddst"))
      val w = o.as("o1").join(o.as("o2"), col("o1.src") === col("o2.src"))
        .filter(col("o1.ddst") < col("o2.ddst") ||
          (col("o1.ddst") === col("o2.ddst") && col("o1.dst") < col("o2.dst")))
        .select(col("o1.dst").as("b"), col("o2.dst").as("c"))
      val tri = w.join(o.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"), "left_semi")
      val stats = deg.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(ecan.agg(count(lit(1)).as("n_edges")))
        .crossJoin(w.agg(count(lit(1)).as("n_wedges")))
        .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
      stats.select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") === 0, lit(0L))
          .otherwise(expr("(n_triangles * 1000000) div n_wedges"))
          .as("closure_ppm"))
    },

    // Item-item co-occurrence similarity (the classic collaborative-
    // filtering "customers who bought A also bought B"): Jaccard over
    // customer baskets, integer ppm. The basket self-join is keyed on
    // customer and guarded by a basket-size cap (HAVING <= 100 distinct
    // parts) — the standard hub guard that keeps per-key pair fan-out
    // bounded at any corpus size; one market segment keeps density
    // sf-proportional. co >= 2 prunes the noise tail before the top-k.
    "q54_item_similarity" -> Q(
      """WITH cp AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |  FROM orders o
        |  JOIN customer cu ON o.o_custkey = cu.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE cu.c_mktsegment = 'BUILDING'),
        |ok AS (SELECT c FROM cp GROUP BY c HAVING count(*) <= 100),
        |cpk AS (SELECT cp.c, cp.p FROM cp JOIN ok ON cp.c = ok.c),
        |np AS (SELECT p, count(*) AS n FROM cpk GROUP BY 1),
        |co AS (
        |  SELECT x.p AS pa, y.p AS pb, count(*) AS co
        |  FROM cpk x JOIN cpk y ON x.c = y.c AND x.p < y.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT co.pa, co.pb, co.co, na.n AS na, nb.n AS nb,
        |       (co.co * 1000000) // (na.n + nb.n - co.co) AS jaccard_ppm
        |FROM co JOIN np na ON co.pa = na.p
        |        JOIN np nb ON co.pb = nb.p
        |ORDER BY jaccard_ppm DESC, pa, pb LIMIT 25""".stripMargin) { (s, d) =>
      // respread (guide §2.5): the broadcast-join map side over the
      // orders/lineitem scans is single-task on single-row-group
      // inputs; all downstream aggregates are exact counts
      val cp = graft.functions.Spread.across(Tables.orders(s, d))
        .join(Tables.customer(s, d)
            .filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .join(graft.functions.Spread.across(Tables.lineitem(s, d)),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
      val ok = cp.groupBy("c").agg(count(lit(1)).as("sz"))
        .filter(col("sz") <= 100).select("c")
      val cpk = cp.join(ok, Seq("c"), "left_semi")
      val np = cpk.groupBy("p").agg(count(lit(1)).as("n"))
      val co = cpk.as("x").join(cpk.as("y"), Seq("c"))
        .filter(col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("pa"), col("y.p").as("pb"))
        .agg(count(lit(1)).as("co"))
        .filter(col("co") >= 2)
      co.join(np.select(col("p").as("pa"), col("n").as("na")), Seq("pa"))
        .join(np.select(col("p").as("pb"), col("n").as("nb")), Seq("pb"))
        .select(col("pa"), col("pb"), col("co"), col("na"), col("nb"),
          expr("(co * 1000000) div (na + nb - co)").as("jaccard_ppm"))
        .orderBy(col("jaccard_ppm").desc, col("pa"), col("pb"))
        .limit(25)
    },

    // 3-sigma outlier detection per event type with ZERO floating
    // point: values become exact integer cents via the proven
    // DECIMAL(20,2) cast, and |x - mean| > 3*sigma is evaluated in its
    // squared form (n*x - s)^2 > 9*(n*ss - s^2) — pure integer algebra,
    // no sqrt, no division. The big products run in bounded DECIMAL(18)
    // multiplications (36-digit results, inside both engines' exact
    // range). Plan shape: one hash-agg for the 5-row moment table, then
    // a broadcast join back over the scan — the two-pass z-score shape
    // that works unchanged at 100 TB because pass two is map-side.
    "q56_outliers" -> Q(
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |st AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(c) AS BIGINT) AS s,
        |         CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM e GROUP BY 1),
        |m AS (
        |  SELECT event_type, n, s,
        |         CAST(n AS DECIMAL(18,0)) * CAST(ss AS DECIMAL(18,0))
        |           - CAST(s AS DECIMAL(18,0)) * CAST(s AS DECIMAL(18,0))
        |           AS m2
        |  FROM st)
        |SELECT m.event_type, m.n,
        |       CAST(sum(CASE WHEN
        |           CAST(m.n * e.c - m.s AS DECIMAL(18,0))
        |             * CAST(m.n * e.c - m.s AS DECIMAL(18,0)) > 9 * m.m2
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
        |       max(CASE WHEN
        |           CAST(m.n * e.c - m.s AS DECIMAL(18,0))
        |             * CAST(m.n * e.c - m.s AS DECIMAL(18,0)) > 9 * m.m2
        |         THEN e.c END) AS max_out_cents
        |FROM e JOIN m ON e.event_type = m.event_type
        |GROUP BY 1, 2 ORDER BY m.event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val e = Tables.events(s, d).select(col("event_type"),
        (col("value").cast(DecimalType(20, 2)) * 100).cast("long").as("c"))
      val st = e.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("ss"))
      val m = st.select(col("event_type"), col("n"), col("s"),
        (col("n").cast(DecimalType(18, 0)) * col("ss").cast(DecimalType(18, 0))
          - col("s").cast(DecimalType(18, 0)) *
            col("s").cast(DecimalType(18, 0))).as("m2"))
      val dev = (col("n") * col("c") - col("s")).cast(DecimalType(18, 0))
      val isOut = dev * dev > lit(9) * col("m2")
      e.join(broadcast(m), Seq("event_type"))
        .groupBy("event_type", "n")
        .agg(sum(when(isOut, 1).otherwise(0)).as("n_out"),
          max(when(isOut, col("c"))).as("max_out_cents"))
        .orderBy("event_type")
    },

    // OLAP CUBE: every grouping-set combination (type x day, per-type,
    // per-day, grand total) in ONE pass — Spark expands the sets inside
    // a single Expand + hash aggregate, where the reference's report
    // notebooks run one query per subtotal level. grouping_id()
    // disambiguates a rolled-up NULL from a data NULL cross-engine.
    // NOTE (r18): DECIMAL-sum + respread measured ~2x vs the r17
    // driver time and reverted — see OPTIMIZATION_r18.md, Finding 4.
    "q58_cube" -> Q(
      """SELECT coalesce(event_type,'ALL') AS event_type,
        |       coalesce(datestamp,'ALL') AS datestamp,
        |       CAST(GROUPING_ID(event_type, datestamp) AS BIGINT) AS gid,
        |       count(*) AS n, round(sum(value),2) AS total
        |FROM (SELECT event_type, strftime(ts,'%Y-%m-%d') AS datestamp, value
        |      FROM events)
        |GROUP BY CUBE(event_type, datestamp)
        |ORDER BY gid, event_type, datestamp""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("datestamp", graft.functions.Fns.datestamp(col("ts")))
        .cube("event_type", "datestamp")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(sum("value"), 2).as("total"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("datestamp"), lit("ALL")).as("datestamp"),
          col("gid"), col("n"), col("total"))
        .orderBy("gid", "event_type", "datestamp")
    },

    // PIVOT — the inverse of J3's Name/Value unpivot: one wide row per
    // user with a column per event type. The value list is EXPLICIT
    // (no driver-side distinct-collect job to discover it), so the
    // whole pivot is a single map-side conditional projection + hash
    // aggregate — shuffle bounded by |users|, not |events|.
    // NOTE (r18): DECIMAL-sum + respread measured at 3.0x (0.14 ->
    // 0.43 s) and reverted — see OPTIMIZATION_r18.md, Finding 4.
    "q59_pivot" -> Q(
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type='click' THEN value END),2) AS click,
        |  round(sum(CASE WHEN event_type='error' THEN value END),2) AS error,
        |  round(sum(CASE WHEN event_type='purchase' THEN value END),2) AS purchase,
        |  round(sum(CASE WHEN event_type='signup' THEN value END),2) AS signup,
        |  round(sum(CASE WHEN event_type='view' THEN value END),2) AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum("value"), 2))
        .orderBy("user_id")
    },

    // cohort retention: users keyed by their FIRST active day, distinct
    // active users per (cohort, day offset) — the canonical retention
    // triangle. Both aggregates and the join key on user_id, so after
    // the first shuffle everything is co-partitioned (no second wide
    // exchange for the join); the cohort dim never needs a driver pass.
    "q60_cohort_retention" -> Q(
      """WITH f AS (SELECT user_id, min(strftime(ts,'%Y-%m-%d')) AS cohort
        |           FROM events GROUP BY 1)
        |SELECT cohort,
        |       CAST(date_diff('day', CAST(cohort AS DATE), CAST(d AS DATE))
        |            AS BIGINT) AS day_offset,
        |       count(DISTINCT e.user_id) AS active
        |FROM (SELECT user_id, strftime(ts,'%Y-%m-%d') AS d FROM events) e
        |JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"),
        graft.functions.Fns.datestamp(col("ts")).as("d"))
      val firstDay = ev.groupBy("user_id").agg(min("d").as("cohort"))
      ev.join(firstDay, "user_id")
        .groupBy(col("cohort"),
          datediff(to_date(col("d")), to_date(col("cohort")))
            .cast("long").as("day_offset"))
        .agg(countDistinct("user_id").as("active"))
        .orderBy("cohort", "day_offset")
    }
  )
}
