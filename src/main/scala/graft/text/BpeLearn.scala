package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE vocabulary induction — the learning half of the tokenizer story
  * (TextFns.bpeMergeTokenCount applies a merge table; this builds one
  * from the corpus): repeatedly count adjacent symbol pairs over the
  * word-frequency table and merge the globally most frequent pair,
  * GPT-2-learner style.
  *
  * Engine-portable state encoding: a word's symbol sequence is the
  * bracketed string `<c><a><t>`. Applying merge (a,b) is then plain
  * substring replacement of `<a><b>` with `<ab>` — unambiguous (the
  * brackets delimit whole symbols, so a pattern can never match a
  * symbol suffix) and leftmost-non-overlapping in both Spark and
  * DuckDB's `replace`, which is exactly BPE's greedy scan. No regex,
  * no lookarounds, so the oracle replays every round verbatim.
  * Pair counts weight by word frequency and count overlapping
  * adjacents (both occurrences in `aaa`) — consistent on both engines.
  *
  * Scale shape: each round is one map-side pair explode + hash agg
  * over the DISTINCT-word table (vocabulary-sized, orders of magnitude
  * smaller than the corpus) and a 1-row driver collect — bounded
  * driver coordination like the IVF Lloyd loop, `rounds` times.
  */
object BpeLearn {

  /** Bracketed adjacent-pair patterns of a symbol array. */
  private def pairPatterns(sy: Column): Column =
    when(size(sy) >= 2,
      transform(sequence(lit(1), size(sy) - 1), i =>
        concat(lit("<"), element_at(sy, i), lit("><"),
          element_at(sy, i + 1), lit(">"))))
      .otherwise(array().cast("array<string>"))

  /** Learn the top `rounds` merges: (rank, merge pattern, weighted
    * pair count) in learning order. Ties break to the lexicographically
    * smallest pattern so any engine picks the same merge. */
  def learnMerges(docs: DataFrame, rounds: Int = 5,
      textCol: String = "text"): Seq[(Int, String, Long)] = {
    require(rounds >= 1 && rounds <= 64,
      s"BpeLearn: rounds must be 1..64, got $rounds")
    val wc = docs
      .select(explode(TextFns.words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .persist()
    var state = wc.select(col("cnt"),
      regexp_replace(col("word"), "(.)", "<$1>").as("state"))
    val merges = Seq.newBuilder[(Int, String, Long)]
    for (r <- 1 to rounds) {
      val sy = split(regexp_replace(col("state"), "^<|>$", ""), "><")
      val best = state
        .select(col("cnt"), explode(pairPatterns(sy)).as("pat"))
        .groupBy("pat").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pat"))
        .limit(1).collect()
      require(best.nonEmpty,
        s"BpeLearn: no adjacent pairs left after round ${r - 1}")
      val (pat, c) = (best(0).getString(0), best(0).getLong(1))
      merges += ((r, pat, c))
      state = state.withColumn("state",
        call_function("replace", col("state"), lit(pat),
          lit(pat.replace("><", ""))))
    }
    merges.result()
  }
}
