package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition diagnostics per document: fraction of the
  * corpus-forming tokens taken by the single most frequent word /
  * word-bigram, and the type-token ratio. High top-gram fractions and
  * low type-token ratios flag boilerplate and degenerate generations —
  * the standard pre-training quality gates that complement
  * [[TextFns.qualityScore]]'s length/stopword/punctuation signal.
  *
  * Shape: explode → two-level hash aggregation ((doc, gram) counts,
  * then per-doc max/sum/count). Both aggregations combine map-side and
  * shuffle only (doc_id, gram) partials, so the pass stays scan-bound
  * at corpus scale — no per-document state beyond the hash-agg entries,
  * no window over the full corpus.
  *
  * Ratios are emitted as exact parts-per-million longs
  * (`floor(1e6 * num / den)`): integer inputs, one double divide, one
  * floor — bit-identical across engines, immune to decimal-rendering
  * drift in round().
  */
object Repetition {

  private def ppm(num: Column, den: Column): Column =
    floor(num.cast("double") * 1000000.0 / den.cast("double")).cast("long")

  /** Per-gram occurrence profile: (doc_id, top_c, n, n_distinct) from a
    * (doc_id, gram) exploded frame. */
  private def gramProfile(grams: DataFrame): DataFrame =
    grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        max(col("c")).as("top_c"),
        sum(col("c")).as("n"),
        count(lit(1)).as("n_distinct"))

  /** Word bigrams of a word array (empty when fewer than 2 words —
    * guarded: Spark's `sequence(1, 0)` would descend). */
  def bigrams(words: Column): Column =
    when(size(words) >= 2,
      transform(sequence(lit(1), size(words) - 1),
        i => concat(element_at(words, i), lit(" "),
          element_at(words, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Repetition metrics per document: `top_word_ppm` (share of the most
    * frequent word), `top_bigram_ppm` (share of the most frequent word
    * bigram; 0 when the doc has fewer than 2 words), `distinct_word_ppm`
    * (type-token ratio). */
  def metrics(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(TextFns.words(col(textCol))).as("gram"))
    val wordStats = gramProfile(words)
    val bi = docs.select(col(idCol).as("doc_id"),
      explode(bigrams(TextFns.words(col(textCol)))).as("gram"))
    val biStats = gramProfile(bi)
      .select(col("doc_id"), col("top_c").as("bi_top_c"), col("n").as("bi_n"))
    wordStats.join(biStats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        ppm(col("top_c"), col("n")).as("top_word_ppm"),
        coalesce(ppm(col("bi_top_c"), col("bi_n")), lit(0L))
          .as("top_bigram_ppm"),
        ppm(col("n_distinct"), col("n")).as("distinct_word_ppm"))
  }
}
