package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Non-parquet batch sources (SURVEY.md S4–S7). */
object FileSources {

  /** S6 CSV scan with header; schema explicit (never inferSchema at
    * scale — a second full pass over the data). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S4 JSON-lines scan with declared schema. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S5 text scan over a glob (the blob-archive backfill pattern
    * "year=&#42;/month=&#42;" — one reader over the whole glob instead
    * of the reference's per-month union loop). */
  def textGlob(spark: SparkSession, glob: String): DataFrame =
    spark.read.text(glob)

  /** S7 REST snapshot: a JSON payload string (fetched driver-side)
    * parallelized into a DataFrame — the `Seq(json).toDS` pattern the
    * reference uses for API-backed dims
    * (`Set Up Delta Tables/Set up Delta tables ...scala:144-153`). */
  def jsonString(spark: SparkSession, payload: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(payload).toDS)
  }
}
