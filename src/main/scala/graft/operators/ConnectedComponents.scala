package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list by iterative
  * min-label propagation — the step that turns near-duplicate PAIRS
  * (graft.text.Dedup output) into duplicate CLUSTERS, so a corpus
  * pipeline can keep one canonical document per cluster instead of
  * dropping both ends of every pair.
  *
  * Algorithm: every node starts labeled with its own id; each round,
  * every node takes the minimum label among itself and its neighbors;
  * converged when no label changes. The final label of a node is the
  * minimum node id of its component — a deterministic canonical
  * representative.
  *
  * Scale shape: each round is one co-partitioned join (edges x labels,
  * both hashed on node id) + one partial-aggregated min, followed by a
  * POINTER-JUMPING shortcut (each node also adopts the label of the
  * node its label points to — the "shortcutting" step of
  * Shiloach–Vishkin-style CC, the same doubling idea as
  * large-star/small-star in Kiveris et al. 2014): label reach roughly
  * DOUBLES per round instead of growing by one hop, so rounds are
  * O(log diameter), not O(diameter). No driver state, label frontier
  * only. Near-dup clusters are dense and shallow (diameter 2–4) and
  * converge in a handful of rounds either way; the doubling is what
  * keeps a CHAIN-shaped duplicate topology (doc A ~ B ~ C ~ ...,
  * diameter = n) from turning the one-bounded-action-per-round loop
  * into n driver round-trips — measured in the `cc_chain_probe` row: a
  * 4096-node chain converges in ~11 rounds, not ~4096. The jump join
  * touches only the |nodes|-row label table (small vs the edge join),
  * so dense shallow graphs pay one cheap extra hash join per round for
  * the logarithmic worst-case guarantee. Lineage is truncated every
  * round with lazy localCheckpoints whose partitions the convergence
  * probe materializes — ONE driver action per round — so the plan
  * doesn't grow with iterations (swap in `checkpoint()` with a
  * reliable checkpoint dir when running on a real cluster where
  * executor loss must be survivable mid-computation).
  */
object ConnectedComponents {

  /** @param pairs undirected edges, one row per pair (self-loops and
    *              duplicates are tolerated)
    * @return (node, label) — every node appearing in `pairs`, labeled
    *         with the min node id of its component. Isolated documents
    *         (no pair) do not appear; union them back with label =
    *         their own id if the caller needs full coverage.
    */
  def run(pairs: DataFrame, a: String = "a", b: String = "b",
      maxIter: Int = 50): DataFrame =
    runWithRounds(pairs, a, b, maxIter)._1

  /** [[run]] plus the number of rounds it took to converge — the
    * measurable the chain-topology probe gates on (rounds must grow
    * logarithmically with chain length, never linearly). */
  def runWithRounds(pairs: DataFrame, a: String = "a", b: String = "b",
      maxIter: Int = 50): (DataFrame, Int) = {
    // Symmetrized edges PLUS a self-loop per endpoint, built in ONE
    // pass over the pair list (guide §1.2): each input pair explodes
    // row-locally into its four directed forms — (a,b), (b,a), (a,a),
    // (b,b) — so the upstream (e.g. a near-dup candidate pipeline) is
    // evaluated exactly once and needs no eager checkpoint, and the
    // former three setup shuffles (sym distinct, node distinct,
    // repartition) collapse into one: the explode repartitions by src
    // FIRST, and because hash-on-src co-locates every (src, dst)
    // group, the distinct that follows reuses that exchange (subset
    // partitioning satisfies the aggregation's clustering) — the
    // persisted frame keeps the src partitioning the per-round join
    // needs. Self-loops make min-over-neighbors include the node's own
    // label, so each round is exactly ONE join + ONE min aggregation;
    // the per-round join reuses the cached edge partitioning and
    // shuffles only the (smaller) label table.
    val und = pairs
      .select(col(a).cast("long").as("s"), col(b).cast("long").as("d"))
      // input self-loops contribute no connectivity; dropping them
      // here (nulls too) preserves the pre-fusion node set exactly
      .filter(col("s") =!= col("d"))
      .select(explode(array(
        struct(col("s").as("src"), col("d").as("dst")),
        struct(col("d").as("src"), col("s").as("dst")),
        struct(col("s").as("src"), col("s").as("dst")),
        struct(col("d").as("src"), col("d").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
      .repartition(col("src"))
      .distinct()
      .persist()
    // Labels are per-node monotone non-increasing (min always includes
    // the node's own label via the self-loop), so the exact-decimal sum
    // of labels is strictly decreasing until the fixpoint: an unchanged
    // sum IS convergence, with no join against the previous round.
    // decimal(38,0) keeps the check exact where sum(BIGINT) could wrap.
    // The checkpoint is LAZY and the sum is the round's ONE driver
    // action: the agg job both materializes the checkpointed partitions
    // (truncating lineage for the next round's join) and delivers the
    // convergence probe — not two jobs per round.
    // sum() over ZERO rows is null — an empty graph (no pairs at all,
    // e.g. a corpus with no near-dups) must converge on the first
    // probe instead of NPE-ing on the null decimal
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    // `und` is distinct and carries one (n, n) self-loop per node, so
    // the initial label table is a FILTER over the persisted frame —
    // no node-distinct shuffle, no checkpoint (the lineage is one
    // cached scan)
    var labels = und.filter(col("src") === col("dst"))
      .select(col("src").as("node"), col("src").as("label"))
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // hop: min label over neighbors (self-loop includes own label)
      val prop = und
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min("label").as("label"))
        .localCheckpoint(false)
      // jump (pointer doubling): also adopt the label of the node the
      // label points to. Labels are always ids of same-component nodes
      // (own id at start; mins of neighbors' labels thereafter), so the
      // jump stays inside the component and only ever lowers labels —
      // monotonicity, the sum convergence probe and the final
      // min-id-per-component labels are all unchanged; only the ROUND
      // COUNT drops from O(diameter) to O(log diameter). The self-join
      // reads prop twice, but prop is lazily checkpointed: the round's
      // one action computes its partitions once and both sides reuse
      // them. An unchanged sum still implies a hop fixpoint (the jump
      // can only change labels the hop would eventually change), which
      // is exactly component-min convergence.
      val next = prop
        .join(prop.select(col("node").as("jn"), col("label").as("jl")),
          col("label") === col("jn"), "left")
        .select(col("node"),
          coalesce(least(col("label"), col("jl")), col("label"))
            .as("label"))
        .localCheckpoint(false)
      val s = labelSum(next)
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    und.unpersist()
    require(converged,
      s"connected components did not converge in $maxIter rounds - " +
        "the graph has longer chains than doubling min-label " +
        s"propagation should serve (diameter > ~2^$maxIter); raise maxIter")
    (labels, iter)
  }
}
