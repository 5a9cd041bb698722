package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** BM25 ranked retrieval over the corpus (Okapi k1=1.2, b=0.75): the
  * t23 query surface, factored out so scale probes can drive it with
  * adversarial (hot-term) query sets.
  *
  * Cross-engine determinism: each (doc, term) contribution is one
  * fixed dag of IEEE ops, rounded to 6 dp and summed as
  * DECIMAL(18,6) — exact and order-independent, so float addition
  * order can never flip a rank between engines; ranks tie-break on
  * doc_id.
  *
  * Scale shape: dl/tf are corpus-scan hash aggs; the query-term table,
  * df and corpus stats stay broadcast-sized (term-count rows). The
  * final per-query ranking is the bounded-heap [[TopKAgg]], NOT a
  * `row_number` window: a query term hot enough to match most of the
  * corpus makes the per-query candidate set corpus-sized, and a window
  * would shuffle and sort ALL of it in one partition per query — the
  * heap ships at most k rows per query per map task and merges
  * partials (SkewProbe measures the delta on exactly that corpus).
  */
object Bm25 {

  /** Per-(query, doc) BM25 scores `(query, doc_id, s)` — the candidate
    * set topDocs ranks; exposed so the skew probe can price the
    * window-ranking alternative on the identical scores. */
  def scores(docs: DataFrame, searches: Seq[(String, Seq[String])])
      : DataFrame = {
    val spark = docs.sparkSession
    val dl = docs.select(col("doc_id"),
      TextFns.tokenCount(col("text")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val qt = spark.createDataFrame(searches.flatMap {
      case (q, ts) => ts.map(t => (q, t))
    }).toDF("query", "term")
    val allTerms = searches.flatMap(_._2).distinct
    val tf = docs
      .select(col("doc_id"), explode(TextFns.words(col("text"))).as("term"))
      .filter(col("term").isin(allTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(qt), "term")
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", round(
        log(lit(1) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) *
            (lit(1) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))),
        6).cast("decimal(18,6)"))
    contrib.groupBy("query", "doc_id").agg(sum("contrib").as("s"))
  }

  /** Top-k docs per query: (query, rank, doc_id, bm25), rank 1-based
    * by score DESC then doc_id ASC. `searches` = (query, terms). */
  def topDocs(docs: DataFrame, searches: Seq[(String, Seq[String])],
      k: Int = 5): DataFrame = {
    // ORDER BY s DESC, doc_id ASC LIMIT k per query, as a bounded heap
    scores(docs, searches).groupBy("query")
      .agg(TopKAgg.topK(struct(col("s"), col("doc_id")), k,
        asc = Seq(false, true)).as("top"))
      .select(col("query"), posexplode(col("top")))
      .select(col("query"), (col("pos") + 1).cast("int").as("rank"),
        col("col.doc_id").as("doc_id"),
        round(col("col.s").cast("double"), 4).as("bm25"))
  }
}
