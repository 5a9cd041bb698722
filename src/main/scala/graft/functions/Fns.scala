package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the whole engine.
  *
  * These replicate the reference's scalar layer with codegen-friendly
  * built-ins instead of string round-trips:
  *  - time buckets: the reference derives hour/day/month buckets via
  *    `unix_timestamp(from_unixtime(ts,"yyyy-MM-dd HH"),...)` string
  *    round-trips (`Gold Aggregation/Step 05 ...scala:84,133,186`); we use
  *    `date_trunc` + `unix_timestamp`, identical semantics, no strings.
  *  - composite keys: sha1-of-concat dedup fingerprints
  *    (`Bronze-Silver/Part1 ...scala:55`) and the pipe-delimited serving
  *    `id` (`Gold Aggregation/Step 05 ...scala:93`).
  */
object Fns {

  /** Epoch-second start of the hour containing `ts` (a timestamp col). */
  def hourBucket(ts: Column): Column =
    unix_timestamp(date_trunc("hour", ts)).as("bucket_ts")

  /** Epoch-second start of the day. */
  def dayBucket(ts: Column): Column =
    unix_timestamp(date_trunc("day", ts)).as("bucket_ts")

  /** Epoch-second start of the month. */
  def monthBucket(ts: Column): Column =
    unix_timestamp(date_trunc("month", ts)).as("bucket_ts")

  /** `yyyy-MM-dd` partition column, like the reference's `Datestamp`
    * (`Bronze-Silver/Part1 ...scala:47`). */
  def datestamp(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** Composite dedup fingerprint: sha1 over tag + columns, null-safe.
    * Mirrors `sha1(concat(lit(tag), cols...))` at Part1:55 but uses
    * `concat_ws` so a single null column doesn't null the whole key. */
  def dedupKey(tag: String, cols: Column*): Column =
    sha1(concat_ws("|", (lit(tag) +: cols).map(_.cast("string")): _*))

  /** Same fingerprint with md5 (DuckDB's oracle lacks sha1). */
  def dedupKeyMd5(tag: String, cols: Column*): Column =
    md5(concat_ws("|", (lit(tag) +: cols).map(_.cast("string")): _*))

  /** Pipe-delimited serving id "remoteId|ts|metricId|providerId|categoryId"
    * (`Gold Aggregation/Step 05 ...scala:93`). */
  def servingId(cols: Column*): Column =
    concat_ws("|", cols.map(_.cast("string")): _*)

  /** Name/Value unpivot: N wide columns -> N narrow (name, value) rows.
    * The reference builds a JSON string and re-parses it
    * (`Bronze-Silver/Part1 ...scala:169-180`); the idiomatic plan is a
    * single Generate over an inline array of structs — no string
    * round-trip, stays inside whole-stage codegen. */
  def nameValueExplode(pairs: (String, Column)*): Column =
    explode(array(pairs.map { case (n, c) =>
      struct(lit(n).as("name"), c.cast("string").as("value"))
    }: _*))
}
