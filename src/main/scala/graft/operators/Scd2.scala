package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension, type 2) maintenance: apply a batch
  * of attribute changes to a validity-interval dimension — the MERGE
  * behind the reference's device-history dim ([SU] serial→remote
  * validity intervals, `added_on`/`removed_on`), generalized to any
  * (key, attrs) dimension.
  *
  * Semantics per key, changes applied in (ts, seq) order:
  *  - attrs differ from the current open row → close it
  *    (`valid_to` = change ts) and open a new row (`valid_from` = ts);
  *  - attrs identical to the current open row → no-op (consecutive
  *    duplicate changes create no interval);
  *  - no open row → open one.
  * Already-closed history rows pass through untouched. Zero-length
  * intervals (two changes at the same ts — the later `seq` wins) are
  * dropped, matching what a point-in-time join could ever observe.
  *
  * The operation is INCREMENTAL-EQUALS-BATCH by construction: applying
  * a change log in any time-ordered batch split yields the same
  * dimension as one application of the whole log (p20 gates this
  * against a one-shot oracle).
  *
  * Scale shape: one window per key over (open rows + this batch's
  * changes) — state is the change log per key, never the fact table;
  * closed history is a pass-through union, not rewritten. Store the
  * result behind [[graft.sinks.KeyedUpsert]] keyed on (key,
  * valid_from) for versioned dimension tables.
  */
object Scd2 {

  /** Seed frame with the dimension schema and zero rows. */
  def emptyDim(changes: DataFrame, keys: Seq[String], attrs: Seq[String],
      tsCol: String): DataFrame =
    changes.limit(0).select(
      (keys ++ attrs).map(col) :+
        col(tsCol).as("valid_from") :+ col(tsCol).as("valid_to"): _*)

  /** @param dim     current dimension: keys ++ attrs ++ (valid_from,
    *                valid_to); open rows have valid_to NULL
    * @param changes change log: keys ++ attrs ++ (tsCol, seqCol);
    *                seqCol totally orders same-ts changes
    * @return the merged dimension, same schema as `dim` */
  def applyChanges(dim: DataFrame, changes: DataFrame, keys: Seq[String],
      attrs: Seq[String], tsCol: String, seqCol: String): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty,
      "Scd2.applyChanges: keys and attrs must be non-empty")
    val outCols = (keys ++ attrs).map(col) :+
      col("valid_from") :+ col("valid_to")
    val closed = dim.filter(col("valid_to").isNotNull).select(outCols: _*)
    // the open row re-enters the fold as the earliest pseudo-change of
    // its key (Long.MinValue seq sorts it before any real change at
    // the same ts, so a real change at valid_from supersedes it)
    val open = dim.filter(col("valid_to").isNull).select(
      (keys ++ attrs).map(col) :+ col("valid_from").as(tsCol) :+
        lit(Long.MinValue).as(seqCol): _*)
    val all = open.unionByName(changes.select(
      (keys ++ attrs).map(col) :+ col(tsCol) :+ col(seqCol): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
    val attrStruct: Column = struct(attrs.map(col): _*)
    // consecutive-duplicate collapse BEFORE interval building: a
    // change that changes nothing must not split an interval
    val deduped = all
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> attrStruct))
      .drop("__prev")
    val w2 = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
    val merged = deduped
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .filter(col("valid_to").isNull || col("valid_to") > col("valid_from"))
      .select(outCols: _*)
    closed.unionByName(merged)
  }
}
