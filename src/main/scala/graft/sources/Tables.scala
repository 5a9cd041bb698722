package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch table readers over the driver-generated parquet testdata
  * (TESTDATA.md). Mirrors the reference's S3 Delta/Parquet batch scan
  * (`Gold state/Step 04-04b - Gold Phase Raw and custom metric.scala:20-32`)
  * with plain parquet in place of Delta.
  *
  * All readers are thin: schema comes from parquet footers, so Catalyst
  * gets full column-pruning + predicate-pushdown on every scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos as a
    * long (SPARK-40819 `nanosAsLong`) and convert to a µs TimestampType
    * column — exact integer µs truncation, matching DuckDB's ns handling
    * for every derived bucket/epoch value. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    // integer division: ns epochs (~1.7e18) exceed double's 53-bit
    // mantissa, so `/ 1000` would round ~12% of rows by 1us and can
    // cross second boundaries near *.999999999 ns
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
