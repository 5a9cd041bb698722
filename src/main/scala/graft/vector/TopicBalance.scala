package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFns

/** Topic-balanced corpus mixing (the SemDeDup/DCLM-style rebalance
  * stage, s15): given a topic assignment (doc → cluster id, from the
  * IVF k-means machinery) and per-doc token counts, derive a
  * deterministic per-topic keep rate that targets an EQUAL token share
  * per topic — head topic downsampled, tail topics keep everything
  * (rate clamps at 10^6 ppm) — and report the 16-row per-topic plan
  * (sizes, rate, kept sizes), integer-exact in both engines.
  *
  * Scale shape: two |topics|-row aggregates broadcast back over the
  * assignment frame, keep decision per-row hash arithmetic — no
  * window, no per-topic sort, no RNG. The joined (doc_id, cid, n_tok)
  * frame feeds BOTH the stats leg and the keep leg, so
  * [[planManaged]] persists it — the corpus×centroid assignment pass
  * behind it is the expensive subtree and used to compute twice (the
  * round-11 two-pass trade, now closed with the same persist + release
  * contract every LSH entry point has).
  */
object TopicBalance {

  /** See [[graft.functions.SessionRelease]]: the unmanaged [[plan]]
    * keeps at most one cached assignment frame alive per session. */
  private val lastUnmanagedRelease = new graft.functions.SessionRelease

  /** The per-topic balance plan plus a release handle for the cached
    * (idCol, cid, n_tok) frame. Release strictly AFTER materializing
    * the result; safe to call twice. `assign` must carry (idCol, cid),
    * `tok` (idCol, n_tok). */
  def planManaged(assign: DataFrame, tok: DataFrame,
      idCol: String = "doc_id"): (DataFrame, () => Unit) = {
    // same fixed-name contract as Dsir.resample, checked loudly up
    // front: a stray n_tok on `assign` (or cid on `tok`) would only
    // surface as an ambiguous-reference error deep in the plan
    require(!assign.columns.contains("n_tok"),
      "TopicBalance.plan: `assign` must carry exactly (idCol, cid) — " +
        "it already has an 'n_tok' column, which belongs on `tok`")
    require(!tok.columns.contains("cid"),
      "TopicBalance.plan: `tok` must carry exactly (idCol, n_tok) — " +
        "it already has a 'cid' column, which belongs on `assign`")
    // persisted: the assignment join feeds both the stats leg and the
    // keep leg, and the corpus×16 centroid assignment upstream of it
    // is the expensive subtree a two-pass plan evaluates twice
    val j = assign.join(tok, idCol).persist()
    val stats = j.groupBy("cid")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    val tot = stats.agg(sum("n_tokens").as("total_tokens"),
      count(lit(1)).as("n_clusters"))
    val rates = stats.crossJoin(broadcast(tot))
      .withColumn("rate_ppm", least(lit(1000000L),
        floor(lit(1000000.0) *
          (col("total_tokens").cast("double") /
            col("n_clusters").cast("double")) /
          col("n_tokens").cast("double")).cast("long")))
      .select("cid", "n_docs", "n_tokens", "rate_ppm")
    val kept = j.join(broadcast(rates.select("cid", "rate_ppm")), "cid")
      .where(TextFns.keepPpm(col(idCol), col("cid").cast("string"),
        col("rate_ppm")))
      .groupBy("cid")
      .agg(count(lit(1)).as("kept_docs"), sum("n_tok").as("kept_tokens"))
    val out = rates.join(kept, Seq("cid"), "left")
      .select(col("cid"), col("n_docs"), col("n_tokens"), col("rate_ppm"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
    (out, () => { j.unpersist(); () })
  }

  /** Unmanaged convenience: one live cached assignment frame per
    * session (the registered s15 path — a one-shot query must not leak
    * an unmanaged cache; repeated callers in one session release the
    * predecessor on the next call). */
  def plan(assign: DataFrame, tok: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val (out, release) = planManaged(assign, tok, idCol)
    lastUnmanagedRelease.swap(assign.sparkSession, release)
    out
  }
}
