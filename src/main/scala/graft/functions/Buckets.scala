package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Default bucket-size cap. Generous enough that legitimate buckets
    * at test scale are never touched; production callers should size it
    * so cap² pairs fit one task comfortably. */
  val DefaultMaxBucketSize = 10000

  /** Drop all rows of buckets larger than `maxBucketSize`.
    *
    * The drop is never silent: the number of dropped rows is published
    * as an `observe` metric under `metricName` (readable through a
    * `QueryExecutionListener` / `Observation`), costing no extra job.
    * The size count shuffles on the bucket column — the same key the
    * candidate self-join shuffles on, so the exchange is reusable.
    *
    * `metricName` must be unique within a single query (Spark requires
    * distinct observation names); each operator passes its own.
    */
  def cap(buckets: DataFrame, bucketCol: String, maxBucketSize: Int,
      metricName: String): DataFrame = {
    val w = Window.partitionBy(bucketCol)
    buckets
      .withColumn("__bucket_size", count(lit(1)).over(w))
      .observe(metricName,
        sum(when(col("__bucket_size") > maxBucketSize, 1L).otherwise(0L))
          .as("dropped_rows"))
      .filter(col("__bucket_size") <= maxBucketSize)
      .drop("__bucket_size")
  }
}
