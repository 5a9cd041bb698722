package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-bucket guard for LSH candidate generation.
  *
  * Every LSH scheme here (MinHash bands, SimHash bands, hyperplane
  * buckets) generates candidate pairs via a self-join on a bucket key,
  * so one degenerate bucket of size B contributes O(B²) pairs — on a
  * near-duplicate-heavy corpus (or all-zero vectors) a single hot
  * bucket becomes the whole job's straggler. Capping trades a bounded,
  * *surfaced* recall loss for a hard bound on per-bucket work.
  */
object Buckets {

  /** Fixed legacy cap, kept ONLY for explicitly-labeled contrast
    * registrations (d06-default, s12) that price the unsized
    * anti-pattern. Every production entry point now derives its cap
    * from the corpus via [[capFor]] when the caller passes None — the
    * round-8 100x probe proved this constant is a disk-spill hazard:
    * corpus-size-agnostic, it let ~5 000-member buckets (50x expected
    * occupancy) through and their candidate self-join spilled ~80 GB. */
  val DefaultMaxBucketSize = 10000

  /** Effective band bits for the hash-band LSH schemes when deriving a
    * default cap: SimHash bands are exactly 16 bits; MinHash md5 bands
    * are far sparser (effectively unbounded value space), so treating
    * them as 16-bit is a conservative over-estimate of expected
    * occupancy — the derived cap errs generous, never drop-happy. */
  val BandBits = 16

  /** Occupancy-scaled cap: `slack` × the EXPECTED bucket size
    * (corpus / 2^planes), floored at 1000. The fixed default above is
    * corpus-size-agnostic, and the round-8 100x probe showed why that
    * matters: on a duplicate-saturated corpus the hyperplane buckets
    * grew to ~5 000 members — 50x expected, yet still under the 10 000
    * constant — and the candidate self-join inflated to ~10^9 pairs
    * whose distinct() spilled past the disk. A cap pegged to expected
    * occupancy drops exactly those statistically-impossible buckets
    * (and the drop counter surfaces it); buckets within slack of the
    * expectation are untouched, so normal corpora see no recall
    * change. The [[graft.vector.Ann.planesFor]] companion: planesFor
    * sizes the bucket COUNT to the corpus, capFor sizes the tolerated
    * bucket POPULATION to the same geometry. */
  def capFor(corpusSize: Long, planesPerTable: Int, slack: Int = 16): Int = {
    require(planesPerTable >= 1 && planesPerTable < 63,
      s"planesPerTable out of range: $planesPerTable")
    val expected = corpusSize / (1L << planesPerTable)
    math.max(1000L, slack * expected).min(Int.MaxValue).toInt
  }

  /** Drop all rows of buckets larger than `maxBucketSize`.
    *
    * The drop is never silent: the number of dropped rows is published
    * as an `observe` metric under `metricName` (readable through a
    * `QueryExecutionListener` / `Observation`), costing no extra job.
    *
    * Occupancy is counted with `groupBy(bucket).count()` joined back —
    * NOT `count(...).over(Window.partitionBy(bucket))`. The two are
    * semantically identical, but the window form plans as a full
    * shuffle plus a WindowExec that BUFFERS each bucket's rows in a
    * single task: the exact degenerate mega-bucket this cap exists to
    * neutralize (say 10⁹ rows of all-zero vectors at 100 TB) would be
    * serialized through one straggler task at O(B) spill cost *before*
    * the filter discards it — a scale-killer sitting inside the
    * defense. The aggregate form lets map-side partial aggregation
    * absorb the hot key (each task emits one partial count per bucket
    * it sees), the sizes table is |distinct buckets| rows, and the
    * join back shuffles on the same bucket key the candidate self-join
    * uses, so AQE can skew-split the hot bucket's join rows across
    * tasks instead of funneling them through one.
    *
    * `metricName` must be unique within a single query (Spark requires
    * distinct observation names); each operator passes its own.
    *
    * COST NOTE: `buckets` is read twice (the sizes aggregate + the
    * join probe side). Callers whose bucket subtree is expensive to
    * recompute — the hyperplane paths, where bucket derivation is the
    * dot-product hashing itself — must persist the input first (and
    * release it through their Managed handle); the dedup paths explode
    * from already-persisted signature frames, so their recompute is
    * one cheap projection.
    */
  def cap(buckets: DataFrame, bucketCol: String, maxBucketSize: Int,
      metricName: String): DataFrame = {
    val sizes = buckets.groupBy(bucketCol)
      .agg(count(lit(1)).as("__bucket_size"))
      .withColumnRenamed(bucketCol, "__bucket_key")
    // NULL-SAFE join key (<=>): groupBy treats NULL as its own group,
    // but a plain equi-join would silently drop every NULL-bucket row
    // on the way back — the old Window.partitionBy form kept them as
    // their own partition, and a cap must never change membership for
    // rows it didn't cap. (All current bucket keys are non-null
    // expressions; this guards the future nullable one.) EqualNullSafe
    // is still an equi-join key, so the plan stays a hashed/sort-merge
    // join that AQE can skew-split.
    buckets.join(sizes, col(bucketCol) <=> col("__bucket_key"))
      .drop("__bucket_key")
      .observe(metricName,
        sum(when(col("__bucket_size") > maxBucketSize, 1L).otherwise(0L))
          .as("dropped_rows"))
      .filter(col("__bucket_size") <= maxBucketSize)
      .drop("__bucket_size")
  }
}
