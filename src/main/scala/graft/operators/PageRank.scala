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
    // tables bracket it — persist once or each round re-evaluates the
    // caller's upstream (a graph derivation pipeline) per reference
    val e = edges.persist()
    // one pass over the edge list (not a union of two scans)
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().persist()
    val wsum = e.groupBy("src").agg(sum("w").as("wsum")).persist()
    val n = nodes.agg(count(lit(1)).as("n"))
    // teleport inflow (1-d) * Unit / N, received every round
    val base = expr(s"(($Unit * ${dampDen - dampNum}) div $dampDen) div n")
    var r = nodes.crossJoin(broadcast(n))
      .select(col("node"), expr(s"$Unit div n").as("r"))
    (1 to iters).foreach { _ =>
      val contrib = e
        .join(r.select(col("node").as("src"), col("r")), "src")
        .join(wsum, "src")
        .withColumn("c", expr(s"(((r * $dampNum) div $dampDen) * w) div wsum"))
        .groupBy(col("dst").as("node")).agg(sum("c").as("inflow"))
      // truncate lineage each round (as ConnectedComponents does): the
      // rank table is |nodes| rows — materializing it is cheap, while
      // the untruncated alternative re-plans and re-executes a plan
      // whose depth grows with the round count
      r = nodes.crossJoin(broadcast(n))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (base + coalesce(col("inflow"), lit(0L))).as("r"))
        .localCheckpoint(true)
    }
    r
  }
}
