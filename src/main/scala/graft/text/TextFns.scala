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

  /** Merge table for [[bpeMergeTokenCount]] — a real (small) BPE merge
    * list in learned-rank order, English-bigram shaped. Invariant the
    * list maintains BY CONSTRUCTION: a merge that consumes a composite
    * symbol ("th"+"e") appears after the merge that creates it, and no
    * merge's output enables a pair of EARLIER rank — so one ordered
    * pass over the table equals the iterative min-rank BPE encode
    * (property-pinned against a reference implementation in
    * TextFnsSpec). Swap in a learned table of the same shape for a
    * production vocabulary. */
  val BpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("h", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("s", "t"), ("th", "e"), ("an", "d"), ("in", "g"),
    ("o", "u"), ("i", "t"), ("i", "s"), ("a", "l"), ("a", "r"))

  /** Symbol separator for the BPE working encoding; U+0001 never occurs
    * in corpus text. */
  val BpeSep = "\u0001"

  /** True merge-table BPE token count: every character of the
    * normalized text starts as a symbol, each merge rule rewrites its
    * symbol pair (applied globally, left-to-right, in rank order — see
    * [[BpeMerges]] for why that equals iterative min-rank encoding),
    * and the count is the surviving non-whitespace symbols. Merges
    * never contain the space symbol, so pairs cannot span words —
    * doc-level application is identical to per-word application.
    * Pure codegen'd string passes (one `replace` per rule), map-side at
    * scan speed; the DuckDB oracle replays the identical replace chain. */
  def bpeMergeTokenCount(text: Column,
      merges: Seq[(String, String)] = BpeMerges): Column = {
    val norm = normalize(text)
    val chars = regexp_replace(norm, "(.)", "$1" + BpeSep)
    val enc = merges.foldLeft(chars) { case (acc, (a, b)) =>
      call_function("replace", acc, lit(a + BpeSep + b + BpeSep),
        lit(a + b + BpeSep))
    }
    val nSymbols = length(enc) - length(translate(enc, BpeSep, ""))
    val nSpaces = length(norm) - length(translate(norm, " ", ""))
    (nSymbols - nSpaces).cast("long")
  }

  /** Ordered unigrams-then-bigrams feature list of a TOKEN ARRAY — the
    * one feature definition the whole hashed-ngram family shares
    * ([[graft.text.QualityClassifier]] scoring, [[graft.text.Dsir]]
    * LMs, [[graft.text.ClassifierTrain]] gradients) and the same
    * `list_concat(ws, bigrams)` every DuckDB oracle folds. Spark's
    * `sequence(1, 0)` counts DOWN, so the bigram leg guards
    * single-token docs explicitly. */
  def ngramFeatures(ws: Column): Column = {
    val bigrams = transform(sequence(lit(1), size(ws) - 1),
      i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1)))
    concat(ws, when(size(ws) >= 2, bigrams)
      .otherwise(array().cast("array<string>")))
  }

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
    * DuckDB oracle reproduces the formula verbatim.
    *
    * The punct ratio is guarded for an EMPTY normalized text (chars =
    * 0, e.g. a whitespace-only document): unguarded, Spark's Divide
    * yields NULL on 0/0 while DuckDB yields IEEE NaN — t02 merely
    * emits the divergent value, but t40/t41 BRANCH on `quality >= 0.5`
    * and DuckDB orders NaN above everything, so the same doc would
    * gain a vote in one engine and not the other. Both engines now
    * pin the ratio to 0 when chars = 0 (full punct credit — an empty
    * doc already scores ~0 through the length and stopword terms). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val stopRatio = vocabHits(text, Stopwords).cast("double") / n
    val chars = length(normalize(text)).cast("double")
    val punctRatio = when(chars === 0.0, lit(0.0))
      .otherwise(punctCount(text).cast("double") / chars)
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

  /** Polynomial char fold (h_1 = code(c_1); h_i = 31*h_{i-1} + code(c_i)
    * mod 1e9+7), seeded from the first element (not zero) so DuckDB's
    * `list_reduce` reproduces it exactly. */
  private def charFold(s: Column): Column = {
    val codes = transform(split(s, ""), c => ascii(c).cast("long"))
    aggregate(
      slice(codes, lit(2), size(codes) - 1),
      element_at(codes, 1),
      (acc, x) => pmod(acc * lit(31L) + x, lit(RollMod)))
  }

  /** Polynomial rolling hash over the character codes of the
    * normalized text. */
  def fingerprintRolling(text: Column): Column = charFold(normalize(text))

  /** Deterministic train/validation assignment: fold the md5 hex of the
    * id (md5 decorrelates sequential ids; the char fold maps the hex to
    * an integer both engines reproduce) and take `% 100 < trainPct`.
    * Stable across runs, partitioning and engines — the property a
    * reproducible corpus split needs; no RNG state to ship. */
  def splitAssign(id: Column, trainPct: Int = 80): Column =
    when(pmod(charFold(md5(id.cast("string"))), lit(100L)) < trainPct,
      lit("train")).otherwise(lit("val"))

  /** Deterministic stratified-sampling predicate: keep a row when the
    * folded md5 of `id:stratum` lands below `pct` (0–100, may be a per-
    * row Column — typically a CASE over the stratum). The stratum salt
    * decorrelates the keep decision from [[splitAssign]], so sampling
    * composes with the train/val split instead of biasing it. Same
    * engine-portability story as splitAssign: pure map-side, no RNG
    * state, identical row set on every run, partitioning and engine —
    * what corpus-mixture rebalancing (downsample the head language,
    * keep the tail) needs to be reproducible. */
  def stratifiedKeep(id: Column, stratum: Column, pct: Column): Column =
    hashGate(id, stratum, 100L) < pct

  /** Shared salted hash gate behind [[stratifiedKeep]] and [[keepPpm]]:
    * the folded md5 of `id:stratum` reduced mod `mod` — ONE definition
    * of the fold+salt contract the DuckDB oracles mirror. */
  private def hashGate(id: Column, stratum: Column, mod: Long): Column =
    pmod(charFold(md5(concat(id.cast("string"), lit(":"), stratum))),
      lit(mod))

  /** Parts-per-million variant of [[stratifiedKeep]] for DERIVED keep
    * rates (temperature mixing computes fractional per-source rates a
    * 0–100 integer gate would quantize to death): keep when the folded
    * md5 of `id:stratum` lands below `ratePpm` out of 1 000 000. Same
    * decorrelation salt, same zero-RNG engine portability. */
  def keepPpm(id: Column, stratum: Column, ratePpm: Column): Column =
    hashGate(id, stratum, 1000000L) < ratePpm

  /** Systematic PPS (probability-proportional-to-size) inclusion
    * predicate: with rows laid on a weight line in `orderCol` order,
    * keep the ones whose cumulative-weight interval crosses one of `k`
    * evenly spaced stride boundaries. Textbook PPS systematic sampling
    * — inclusion probability is exactly `k * w / total` (rows heavier
    * than a stride are certainty inclusions), and everything is integer
    * arithmetic (`cw * k` stays far under 2^63 for character weights),
    * so any engine replays the same sample: no RNG, no floats.
    *
    * `cw` must be the INCLUSIVE running sum of the weight and `tw` the
    * stratum total (both from one window pass over the stratum — see
    * t20). Weight-0 rows can never cross a boundary and are never kept.
    * Scale note: the running sum serializes per stratum; at extreme
    * per-stratum cardinality, pre-bucket `orderCol` ranges and sample
    * within buckets. */
  def ppsKeep(cw: Column, weight: Column, tw: Column, k: Int): Column = {
    require(k >= 1, s"ppsKeep: sample size k must be >= 1, got $k")
    // floor((cw*k)/tw) > floor((pw*k)/tw), written without division:
    // a - a%t and b - b%t are the floors scaled back by t (a >= b >= 0)
    val a = cw * k
    val b = (cw - weight) * k
    (a - pmod(a, tw)) > (b - pmod(b, tw))
  }

  /** PII patterns for corpus scrubbing: conservative regexes that favor
    * precision (a false positive destroys training text; a rare miss is
    * caught by downstream filters). */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe =
    "(?:\\+?[0-9]{1,3}[- .])?\\(?[0-9]{3}\\)?[- .]?[0-9]{3}[- .]?[0-9]{4}"
  val IpRe = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact emails, phone numbers and IPs with typed placeholder tags.
    * Pure codegen'd regexp_replace chain — map-side at scan speed; the
    * standard pre-training scrub pass. Order matters: emails first
    * (their local parts can contain digit runs a phone pattern would
    * shred mid-address). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Count of PII matches per category, for scrub audits. */
  def piiCounts(text: Column): Column =
    struct(
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")
        .as("emails"),
      size(regexp_extract_all(text, lit(IpRe), lit(0))).cast("long")
        .as("ips"),
      size(regexp_extract_all(regexp_replace(text, EmailRe, " "),
        lit(PhoneRe), lit(0))).cast("long").as("phones"))
}
