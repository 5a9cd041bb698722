package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over a weighted directed edge list — the iterative
  * WEIGHTED propagation pattern complementing [[ConnectedComponents]]'s
  * unweighted min-label: authority/importance scoring over entity
  * graphs a datalake derives (co-purchase, co-occurrence, citation),
  * e.g. ranking suppliers/parts by lineitem co-occurrence mass.
  *
  * Ranks are INTEGER PICO-UNITS (1e12 = total mass 1.0) and every step
  * is integer arithmetic with explicit truncating division — no
  * floating point anywhere, so the result is a pure function of the
  * input: independent of partitioning and aggregation order, and
  * bit-exact across engines (a float contribution chain is NOT — the
  * all-rational products land on round() boundaries where binary and
  * decimal-string rounding disagree). Each truncation discards < 1
  * pico; a FIXED iteration count (not convergence-to-epsilon) keeps
  * the replay finite.
  *
  * Scale shape: each round is one join of the edge list against the
  * (node, rank) table — both hashable on src — plus one partial-
  * aggregated sum by dst; no driver state, no collect. The plan grows
  * linearly with the (small, fixed) iteration count; callers looping
  * to convergence should localCheckpoint between rounds as
  * [[ConnectedComponents]] does. Dangling mass is NOT redistributed
  * (nodes without out-edges keep only their base rank inflow): fine
  * for mutualized edge lists (every node has out-edges by
  * construction), documented for everything else. Overflow bound: the
  * per-edge product (rank * dampNum / dampDen) * w stays in a long for
  * per-edge weights up to ~1e7; pre-scale heavier weights.
  */
object PageRank {

  /** Total rank mass, in pico-units. */
  val Unit = 1000000000000L

  /** @param edges   (src, dst, w) weighted directed edges; parallel
    *                edges should be pre-aggregated
    * @param iters   fixed propagation rounds
    * @param dampNum damping factor numerator (default 17/20 = 0.85)
    * @param dampDen damping factor denominator
    * @return (node, r) for every node appearing as src or dst; r is
    *         the pico-unit rank (BIGINT), summing to ~Unit minus
    *         truncation and dangling leakage
    */
  def ranks(edges: DataFrame, iters: Int = 3, dampNum: Int = 17,
      dampDen: Int = 20): DataFrame = {
    val missing = Seq("src", "dst", "w").filterNot(edges.columns.contains)
    require(missing.isEmpty,
      s"PageRank.ranks: edges is missing column(s) ${missing.mkString(", ")} " +
        "(expected src, dst, w)")
    require(iters >= 1, s"PageRank.ranks: iters must be >= 1, got $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"PageRank.ranks: damping must satisfy 0 < num < den, " +
        s"got $dampNum/$dampDen")
    // every round references the edge list, and the node/out-weight
    // tables derive from it — persist once (hashed on src, the
    // partitioning every per-round join and the wsum aggregation
    // reuse) or each round re-evaluates the caller's upstream (a graph
    // derivation pipeline) per reference
    val e = edges.repartition(col("src")).persist()
    // one pass over the edge list (not a union of two scans)
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().persist()
    // |nodes| is ONE bounded driver long, read once: the former
    // per-round `crossJoin(broadcast(n))` re-ran a broadcast-exchange
    // job every round for a value that never changes (guide §1.2).
    // The count also materializes `nodes` and `e` before the loop.
    val n = nodes.count()
    if (n == 0) { // empty graph: empty (node, r) frame, as before
      e.unpersist(); nodes.unpersist()
      return nodes.select(col("node"), lit(0L).as("r"))
    }
    // out-weight attached to the edge ONCE: the former per-round
    // `join(wsum, "src")` re-joined (and under AQE re-broadcast) the
    // same static table every round; (src, dst, w, wsum) is the same
    // width class as the edge list and both joins are on src, so the
    // fused frame costs nothing extra to hold. No exchange: e and the
    // aggregation over it share the src hash partitioning.
    val ew = e.join(e.groupBy("src").agg(sum("w").as("wsum")), "src")
      .persist()
    // teleport inflow (1-d) * Unit / N, received every round — all
    // operands positive, so Scala's truncating / matches SQL div
    val base = ((Unit * (dampDen - dampNum)) / dampDen) / n
    var r = nodes.select(col("node"), lit(Unit / n).as("r"))
    (1 to iters).foreach { _ =>
      val contrib = ew
        .join(r.select(col("node").as("src"), col("r")), "src")
        .withColumn("c", expr(s"(((r * $dampNum) div $dampDen) * w) div wsum"))
        .groupBy(col("dst").as("node")).agg(sum("c").as("inflow"))
      // truncate lineage each round (as ConnectedComponents does): the
      // rank table is |nodes| rows — materializing it is cheap, while
      // the untruncated alternative re-plans and re-executes a plan
      // whose depth grows with the round count
      r = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("r"))
        .localCheckpoint(true)
    }
    // the returned rank table is checkpointed — the caches only served
    // the loop, and a leaked persist would pollute the session (the
    // bench runs hundreds of queries in one JVM)
    e.unpersist(); ew.unpersist(); nodes.unpersist()
    r
  }
}
