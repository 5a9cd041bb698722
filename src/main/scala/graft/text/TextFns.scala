package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column layer for large-scale corpus pipelines:
  * tokenization, quality scoring, keyword-profile language-ID and
  * content fingerprinting. All pure `Column` expressions (codegen'd,
  * no UDFs), so they run map-side at full scan speed — the property
  * that matters when the documents table is 100 TB.
  */
object TextFns {

  /** Whitespace-normalized text: lowercase, collapsed internal
    * whitespace, trimmed. The canonical form for fingerprints/dedup. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace word tokens over normalized text. */
  def words(text: Column): Column = split(normalize(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * punctuation marks each count as one token — the standard cheap
    * proxy for LLM token accounting. */
  val BpeTokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(normalize(text), lit(BpeTokenRe), lit(0)))
      .cast("long")

  /** Count of tokens that appear in `vocab`. */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(words(text), w => w.isin(vocab.map(lit(_)): _*))).cast("long")

  /** Punctuation character count (anything outside [a-z0-9 ] after
    * normalization). */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(normalize(text), lit("[^a-z0-9 ]"), lit(0)))
      .cast("long")

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  /** Composite document quality score in [0,1]: length credit (capped),
    * stopword-rate credit (natural prose has stopwords), punctuation
    * penalty. Weights mirror common corpus-quality heuristics; the
    * DuckDB oracle reproduces the formula verbatim. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val stopRatio = vocabHits(text, Stopwords).cast("double") / n
    val punctRatio = punctCount(text).cast("double") /
      length(normalize(text)).cast("double")
    round(least(n / lit(50.0), lit(1.0)) * 0.5 + stopRatio * 0.3 +
      (lit(1.0) - punctRatio) * 0.2, 4)
  }

  /** Keyword-profile language/domain ID: score each profile by marker
    * hits, pick the argmax (ties resolved by profile order). */
  def profileId(text: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val scores = profiles.map { case (name, vocab) =>
      name -> vocabHits(text, vocab)
    }
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestName, bestScore), (name, score)) =>
        (when(score > bestScore, lit(name)).otherwise(bestName),
          greatest(score, bestScore))
    }._1
  }

  /** Content fingerprint: md5 of the normalized text. */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  private val RollMod = 1000000007L

  /** Polynomial rolling hash over the character codes of the
    * normalized text: h_1 = code(c_1); h_i = (31*h_{i-1} + code(c_i))
    * mod 1e9+7. Seeded from the first element (not zero) so DuckDB's
    * `list_reduce` reproduces it exactly. */
  def fingerprintRolling(text: Column): Column = {
    val codes = transform(split(normalize(text), ""), c => ascii(c).cast("long"))
    aggregate(
      slice(codes, lit(2), size(codes) - 1),
      element_at(codes, 1),
      (acc, x) => pmod(acc * lit(31L) + x, lit(RollMod)))
  }
}
