package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: heavy keys are split across
  * `nSalts` sub-keys for the partial aggregation, then the salted
  * partials combine in a second (tiny) aggregation. Turns one
  * straggler partition into `nSalts` parallel ones; AQE's skew-join
  * handling covers joins, this covers aggregations whose partials
  * are themselves too hot.
  *
  * The salt is derived from deterministic columns (not rand()), so
  * results are reproducible and oracle-checkable; any row-level
  * column works since the salt only affects placement, never values.
  */
object Salt {

  /** Deterministic salt in [0, nSalts) from `entropy` columns. */
  def saltCol(nSalts: Int, entropy: Column*): Column =
    pmod(xxhash64(entropy: _*), lit(nSalts.toLong))

  /** Two-stage salted sum/count aggregation: equivalent to
    * `df.groupBy(keys).agg(sum(valueCol), count(*))` for any data, but
    * the first stage spreads each key over `nSalts` partitions. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      nSalts: Int, entropy: Column): DataFrame = {
    val stage1 = df
      .withColumn("__salt", saltCol(nSalts, entropy))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pn"))
    stage1
      .groupBy(keys.map(col): _*)
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pn").as("n"))
  }
}
