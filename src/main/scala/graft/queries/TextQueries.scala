package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextFns

/** Text-analysis suite over the documents table: token accounting,
  * quality scoring, keyword-profile language-ID and fingerprinting —
  * the per-document scan layer of a training-data pipeline. Every query
  * is a pure map over the corpus (no shuffles except the final
  * presentation sort), so throughput is scan-bound at any scale.
  */
object TextQueries {

  /** Oracle mirror of TextFns.normalize. */
  private val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** The production PII regexes, embedded verbatim in the oracle SQL —
    * RE2-safe (no lookarounds/backrefs) so DuckDB replays them exactly. */
  private val EmailReSql = TextFns.EmailRe
  private val IpReSql = TextFns.IpRe
  private val PhoneReSql = TextFns.PhoneRe

  /** DuckDB replay of TextFns.bpeMergeTokenCount: the IDENTICAL merge
    * chain generated from the same TextFns.BpeMerges table (one
    * replace() per rule, chr(1) as the symbol separator), so the two
    * engines cannot drift apart rule-by-rule. */
  private val bpeChainSql: String =
    TextFns.BpeMerges.foldLeft(
      "regexp_replace(norm, '(.)', '\\1' || chr(1), 'g')") {
      case (acc, (a, b)) =>
        s"replace($acc, '$a'||chr(1)||'$b'||chr(1), '$a$b'||chr(1))"
    }

  private[queries] val stopList =
    TextFns.Stopwords.map(w => s"'$w'").mkString("(", ",", ")")

  /** DuckDB mirror of [[graft.functions.PolyHash64]] over a SQL string
    * expression — the documented two-fold hash every shingle oracle
    * replays; shared by t31/t33/d15. TOTAL on the empty string: the
    * JVM side returns 0 for "", but DuckDB's list_reduce ERRORS on the
    * empty char list — and unlike the shingle oracles (guarded by
    * `len(ws) >= 3`), the classifier oracles hash every word of every
    * document, including the one empty token a whitespace-only text
    * normalizes to. The CASE arm keeps both engines at hash("") = 0. */
  private[queries] def polyHashSql(v: String): String =
    s"""CASE WHEN $v = '' THEN 0 ELSE
       |         list_reduce(list_transform(string_split($v, ''),
       |             c -> CAST(ascii(c) AS BIGINT)),
       |           (acc, x) -> (acc * 31 + x) % 1073741789) * 1073741824 +
       |         list_reduce(list_transform(string_split($v, ''),
       |             c -> CAST(ascii(c) AS BIGINT)),
       |           (acc, x) -> (acc * 131 + x) % 1073741783) END""".stripMargin

  /** DuckDB mirror of [[graft.text.QualityClassifier.score]] over a
    * `ws` word-list column: ordered unigrams-then-bigrams weight sum
    * (list_reduce = left-to-right), mean, round(6) — shared by t31's
    * scoring CTE and d15's quality-keep oracle. */
  private[queries] def classifierScoreSql: String = {
    import graft.text.QualityClassifier.{Dim, weightsSqlList}
    s"""round(list_reduce(list_transform(
       |          list_concat(ws, list_transform(range(1, len(ws)),
       |            i -> ws[i] || ' ' || ws[i+1])), t ->
       |          (CAST($weightsSqlList AS DOUBLE[]))[1 + CAST((
       |         ${polyHashSql("t")}
       |          ) % $Dim AS BIGINT)]),
       |          (a, b) -> a + b) / (len(ws) * 2 - 1), 6)""".stripMargin
  }

  /** Profiles for t03: argmax over marker-vocab hit counts. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "storage" -> Seq("table", "scan", "merge", "part", "batch", "row"),
    "query" -> Seq("join", "filter", "group", "sort", "window", "order"),
    "stream" -> Seq("stream", "fast", "slow", "value", "key", "data"))

  /** Oracle for t22: replay `rounds` BPE-learning rounds — pair counts
    * over the bracketed symbol states, pick max (ties to the smaller
    * pattern), apply via plain `replace` (leftmost-non-overlapping in
    * both engines), repeat. Generated per round to keep the SQL and
    * the Spark loop structurally identical. */
  private def bpeLearnOracle(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"s${r - 1}"
      val apply =
        if (r < rounds)
          s""",
             |s$r AS (SELECT cnt, replace(state, (SELECT pat FROM m$r),
             |          replace((SELECT pat FROM m$r), '><', '')) AS state
             |        FROM $prev)""".stripMargin
        else ""
      s"""p$r AS (
         |  SELECT cnt, unnest(list_transform(range(1, len(sy)), i ->
         |    '<' || sy[i] || '><' || sy[i+1] || '>')) AS pat
         |  FROM (SELECT cnt, string_split(trim(state, '<>'), '><') AS sy
         |        FROM $prev) q$r),
         |c$r AS (SELECT pat, SUM(cnt) AS c FROM p$r GROUP BY 1),
         |m$r AS (SELECT pat, CAST(c AS BIGINT) AS c FROM c$r
         |        ORDER BY c DESC, pat LIMIT 1)$apply""".stripMargin
    }.mkString(",\n")
    val finals = (1 to rounds)
      .map(r => s"SELECT $r AS mrank, pat AS merge_pat, c AS pair_count FROM m$r")
      .mkString("\n  UNION ALL ")
    s"""WITH w AS (SELECT unnest(string_split($norm, ' ')) AS word
       |           FROM documents),
       |wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY 1),
       |s0 AS (SELECT cnt, regexp_replace(word, '(.)', '<\\1>', 'g') AS state
       |       FROM wc),
       |$roundCtes
       |SELECT mrank, merge_pat, pair_count FROM (
       |  $finals)
       |ORDER BY mrank""".stripMargin
  }

  /** The chained-CTE replay of `iters` full-batch perceptron
    * iterations, shared by t35's and t37's oracles: per-doc bucket
    * counts once (`fx`, the same PolyHash64 fold +
    * list_concat(ws, bigrams) every hashed-ngram oracle folds), then
    * per iteration score → misclassified set → summed gradient →
    * weight update, ALL integer arithmetic (sums CAST from DuckDB's
    * HUGEINT back to BIGINT). Generated per iteration so the SQL and
    * the Spark loop stay structurally identical (the t22
    * bpeLearnOracle pattern). `poolWhere` restricts the training pool
    * (t35 trains on the whole corpus, t37 on the t05 train split);
    * final weights live in CTE `<prefix>w<iters>`. Ends WITHOUT a
    * trailing comma — the caller's tail adds its own. The `prefix`
    * namespaces every CTE so one oracle can replay SEVERAL fits over
    * different pools (st20 replays one chain per model version). */
  private[queries] def perceptronCtes(iters: Int, poolWhere: String,
      prefix: String = ""): String = {
    val D = graft.text.ClassifierTrain.Dim
    val p = prefix
    val iterCtes = (1 to iters).map { r =>
      s"""${p}sc$r AS (SELECT fx.doc_id, CAST(sum(w.w * fx.x) AS BIGINT) AS s
         |         FROM ${p}fx fx JOIN ${p}w${r - 1} w USING (bucket) GROUP BY 1),
         |${p}m$r AS (SELECT p.doc_id FROM ${p}pool p
         |        LEFT JOIN ${p}sc$r s ON s.doc_id = p.doc_id
         |        WHERE p.y * coalesce(s.s, 0) <= 0),
         |${p}g$r AS (SELECT fx.bucket, CAST(sum(fx.y * fx.x) AS BIGINT) AS g
         |        FROM ${p}fx fx JOIN ${p}m$r m ON m.doc_id = fx.doc_id GROUP BY 1),
         |${p}w$r AS (SELECT w.bucket, CAST(w.w + coalesce(g.g, 0) AS BIGINT) AS w
         |        FROM ${p}w${r - 1} w LEFT JOIN ${p}g$r g ON g.bucket = w.bucket)"""
        .stripMargin
    }.mkString(",\n")
    s"""${p}pool AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
       |         string_split($norm, ' ') AS ws
       |  FROM documents WHERE text IS NOT NULL$poolWhere),
       |${p}fx AS (
       |  SELECT doc_id, y, bucket, CAST(count(*) AS BIGINT) AS x FROM (
       |    SELECT doc_id, y, unnest(list_transform(
       |        list_concat(ws, list_transform(range(1, len(ws)),
       |          i -> ws[i] || ' ' || ws[i+1])),
       |        t -> CAST((${polyHashSql("t")}) % $D AS BIGINT))) AS bucket
       |    FROM ${p}pool) GROUP BY 1, 2, 3),
       |${p}w0 AS (SELECT CAST(g.range AS BIGINT) AS bucket,
       |              CAST(0 AS BIGINT) AS w FROM range($D) g),
       |$iterCtes""".stripMargin
  }

  /** Oracle for t35: the perceptron replay over the full pool, tailed
    * with final-weight scoring and integer train accuracy. */
  private def classifierTrainOracle(iters: Int): String =
    s"""WITH ${perceptronCtes(iters, "")},
       |scf AS (SELECT fx.doc_id, CAST(sum(w.w * fx.x) AS BIGINT) AS s
       |        FROM fx JOIN w$iters w USING (bucket) GROUP BY 1),
       |acc AS (SELECT CAST(count(*) FILTER (
       |                 WHERE p.y * coalesce(s.s, 0) > 0) AS BIGINT)
       |                 AS n_correct,
       |               CAST(count(*) AS BIGINT) AS n_total
       |        FROM pool p LEFT JOIN scf s ON s.doc_id = p.doc_id)
       |SELECT w.bucket, w.w AS weight, acc.n_correct, acc.n_total
       |FROM w$iters w, acc ORDER BY w.bucket""".stripMargin

  /** t41's token budget in ppm-token units (15 000 tokens · 10^6) and
    * the marginal-tier keep clamp: at sf0.01 the 15k budget leaves a
    * remainder whose integer division lands ABOVE the clamp, so the
    * clamp binds — the branch a slack budget never exercises. */
  private val TierMixBudgetPpm = 15000L * 1000000L
  private val MarginalCapPpm = 250000L

  /** See [[graft.functions.SessionRelease]]: t41 keeps at most one
    * cached tier frame alive per session. */
  private val tierMixUnmanagedRelease = new graft.functions.SessionRelease

  /** t41's exact-integer budget waterfall, factored out so the
    * PropertySpec invariants (never overspends, caps respected, no
    * budget left on the table while a tier is damped) test the SAME
    * arithmetic the registered query ships: tier → keep rate in ppm.
    * All Long arithmetic; `/` is integer division, mirroring the
    * oracle's `//`. */
  private[graft] def tierWaterfall(tokOf: Map[String, Long],
      budgetPpm: Long = TierMixBudgetPpm,
      marginalCap: Long = MarginalCapPpm): Map[String, Long] = {
    def tok(t: String) = tokOf.getOrElse(t, 0L)
    def rate(rem: Long, tk: Long, cap: Long): Long =
      if (tk == 0L) cap else math.min(cap, rem / tk)
    val rP = rate(budgetPpm, tok("premium"), 1000000L)
    val rem1 = budgetPpm - tok("premium") * rP
    val rS = rate(rem1, tok("standard"), 1000000L)
    val rem2 = rem1 - tok("standard") * rS
    val rM = rate(rem2, tok("marginal"), marginalCap)
    Map("premium" -> rP, "standard" -> rS, "marginal" -> rM,
      "reject" -> 0L)
  }

  /** t41's LIBRARY form (the TopicBalance/ClassifierTrain precedent):
    * the quality-tier-aware mixing plan plus an explicit release for
    * the persisted tier frame — (kept DataFrame, release). The tier
    * projection MUST be persisted: its expression inlines two native
    * product kernels + the classifier scorer + the heuristic, and
    * Catalyst substitutes it into every downstream reference (the
    * rate when-chain, the keep gate, the output columns) — the
    * unpersisted plan re-evaluated the kernels ~10x per row (9.5 s vs
    * t40's 0.94 s, measured). A library caller embedding this shape
    * in a longer pipeline releases the cache deterministically;
    * release is safe to call twice. */
  private[graft] def tierMixManaged(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame, () => Unit) =
    tierMixManaged(ensembleTiers(s, d))

  /** The same Managed pair over an ALREADY-BUILT tier frame (columns
    * doc_id, n_tok, votes, tier) — the form a composing pipeline
    * (graft.CurationPipeline) uses after its own upstream gates. */
  private[graft] def tierMixManaged(tierFrame: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    val tiers = tierFrame.persist()
    // bounded driver fold (≤ 4 rows): the waterfall is SEQUENTIAL —
    // each tier's spend defines the next tier's remainder — so it is
    // driver arithmetic on exact Longs, never a float in the plan.
    // The collect is an ACTION before the caller ever sees the release
    // — on failure the cache must be dropped here or it leaks for the
    // session (no one else holds a handle to it yet).
    val tokOf = try tiers.groupBy("tier")
        .agg(sum("n_tok").cast("long").as("tok")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      catch { case t: Throwable => tiers.unpersist(); throw t }
    val rates = tierWaterfall(tokOf)
    val out = tiers
      .withColumn("rate_ppm",
        when(col("tier") === "premium", rates("premium"))
          .when(col("tier") === "standard", rates("standard"))
          .when(col("tier") === "marginal", rates("marginal"))
          .otherwise(0L).cast("long"))
      .where(TextFns.keepPpm(col("doc_id"), col("tier"),
        col("rate_ppm")))
      .select("doc_id", "n_tok", "votes", "tier", "rate_ppm")
      .orderBy("doc_id")
    (out, () => { tiers.unpersist(); () })
  }

  /** t28's manifest tail, shared with [[graft.CurationPipeline]]: a
    * train set of (doc_id, n_tok) → deterministic shuffle (RangeRank
    * over md5(doc_id) — a range exchange, never a SinglePartition
    * window) → fixed 64-doc shards → 2048-token packing in shuffle
    * order WITHIN each shard (window state bounded per shard) → the
    * shard manifest a data-loader resumes from. */
  private[graft] def shardManifest(train: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    manifestOf(shardAssignments(train))

  /** The per-document half of the manifest tail: (doc_id, n_tok, pos,
    * shard) in deterministic shuffle order — what a caller writing the
    * actual sharded corpus (graft.CurationPipeline --out) partitions
    * by. `shardSize` defaults to t28's pinned 64 docs; a production
    * run sizes it so the shard COUNT stays O(10^4–10^5) (64-doc shards
    * at web scale mean tens of millions of partition directories —
    * a filesystem-metadata bug, not a Spark one). */
  private[graft] def shardAssignments(train: org.apache.spark.sql.DataFrame,
      shardSize: Int = 64): org.apache.spark.sql.DataFrame = {
    val ranked = graft.operators.RangeRank.withGlobalRank(
      train.select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"), col("n_tok")),
      Seq(col("h"), col("doc_id")), "pos")
    ranked.withColumn("shard",
      floor((col("pos") - 1) / shardSize.toDouble).cast("long"))
  }

  /** Scale-safe DEFAULT shard size for a train set of `nTrain` docs
    * (the [[graft.vector.Ann]].planesFor precedent — corpus-derived
    * sizing as the default, the pinned constant behind an explicit
    * argument): keeps the shard COUNT ≈ min(max(nTrain/64, 1), 10^5),
    * so testdata-sized corpora keep t28's pinned 64-doc shards while
    * a web-scale corpus caps at 10^5 shards with the size growing
    * instead — 64-doc shards at web scale mean tens of millions of
    * partition directories, a filesystem-metadata bug the front
    * door's doc used to merely warn about. */
  private[graft] def derivedShardSize(nTrain: Long): Int = {
    val shards = math.min(math.max(nTrain / 64L, 1L), 100000L)
    math.max(64L, (nTrain + shards - 1L) / shards).toInt
  }

  /** The aggregation half: shard assignments → the manifest a
    * data-loader resumes from. */
  private[graft] def manifestOf(sharded: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").cast("long").as("n_tokens"),
        (max(floor(col("cum_before") / 2048.0)) + 1).cast("long")
          .as("n_packs"),
        min("pos").as("pos_lo"),
        max("pos").as("pos_hi"))
      .orderBy("shard")
  }

  /** The t40 ensemble chain shared by the t40 and t41 oracles: the
    * three quality signals (t02 heuristic, t31 trained score, t39 LM
    * bucket) → integer vote → tier, ending in CTE `tv` of (doc_id,
    * n_tok, quality, score, lm_bucket, votes, tier). Ends WITHOUT a
    * trailing comma — the caller's tail adds its own. */
  private def ensembleCtes: String = {
    import graft.text.LmQuality.{Dim, HeadGm, TailGm}
    import graft.text.QualityClassifier.Threshold
    s"""w AS (SELECT doc_id, source,
       |             string_split($norm, ' ') AS ws,
       |             len(string_split($norm, ' ')) AS n,
       |             len(list_filter(string_split($norm, ' '),
       |                 w -> w IN $stopList)) AS stop_n,
       |             len(regexp_extract_all($norm, '[^a-z0-9 ]', 0))
       |               AS punct_n,
       |             len($norm) AS chars
       |           FROM documents WHERE text IS NOT NULL),
       |f AS (SELECT doc_id, ws, n, stop_n, punct_n, chars, source,
       |        list_concat(ws, list_transform(range(1, len(ws)),
       |          i -> ws[i] || ' ' || ws[i+1])) AS fs
       |      FROM w),
       |rb AS (SELECT unnest(list_transform(fs, t ->
       |         CAST((${polyHashSql("t")}) % $Dim AS BIGINT))) AS bucket
       |       FROM f WHERE source IN ('src0', 'src1')),
       |c AS (SELECT bucket, count(*) AS c FROM rb GROUP BY 1),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM c),
       |lm AS (SELECT g.range AS bucket,
       |         CAST(coalesce(c.c, 0) + 1 AS DOUBLE)
       |           / CAST(tot.tot + $Dim AS DOUBLE) * $Dim.0 AS r
       |       FROM range($Dim) g LEFT JOIN c ON c.bucket = g.range, tot),
       |pl AS (SELECT list(r / $HeadGm ORDER BY bucket) AS rh,
       |              list(r / $TailGm ORDER BY bucket) AS rt FROM lm),
       |sig AS (SELECT doc_id, n,
       |          round(least(n::DOUBLE / 50.0, 1.0) * 0.5 +
       |                (stop_n::DOUBLE / n::DOUBLE) * 0.3 +
       |                (1.0 - CASE WHEN chars = 0 THEN 0.0 ELSE punct_n::DOUBLE / chars::DOUBLE END) * 0.2, 4)
       |            AS quality,
       |          $classifierScoreSql AS score,
       |          CASE WHEN list_reduce(list_transform(fs, t ->
       |                 pl.rh[1 + CAST((${polyHashSql("t")})
       |                   % $Dim AS BIGINT)]), (a, b) -> a * b) >= 1.0
       |               THEN 'head'
       |               WHEN list_reduce(list_transform(fs, t ->
       |                 pl.rt[1 + CAST((${polyHashSql("t")})
       |                   % $Dim AS BIGINT)]), (a, b) -> a * b) >= 1.0
       |               THEN 'middle'
       |               ELSE 'tail' END AS lm_bucket
       |        FROM f, pl),
       |v AS (SELECT doc_id, n, quality, score, lm_bucket,
       |        CAST(CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END +
       |             CASE WHEN score > $Threshold THEN 1 ELSE 0 END +
       |             CASE WHEN lm_bucket = 'head' THEN 1 ELSE 0 END
       |          AS BIGINT) AS votes
       |      FROM sig),
       |tv AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tok, quality,
       |         score, lm_bucket, votes,
       |         CASE votes WHEN 3 THEN 'premium' WHEN 2 THEN 'standard'
       |              WHEN 1 THEN 'marginal' ELSE 'reject' END AS tier
       |       FROM v)""".stripMargin
  }

  /** The Spark side of [[ensembleCtes]], shared by t40 and t41: the
    * fused map-side ensemble scan (two native codegen kernels + a
    * projection, LM ratio tables as plan reference objects — zero
    * joins/windows) with the vote and tier appended. */
  private def ensembleTiers(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    ensembleTiers(Tables.documents(s, d))

  /** The ensemble over an arbitrary documents frame (doc_id, text,
    * source, …) — the composing-pipeline form. */
  private[graft] def ensembleTiers(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import graft.text.{LmQuality, QualityClassifier}
    LmQuality.scored(docs,
        col("source").isin("src0", "src1"))
      .select(col("doc_id"),
        TextFns.qualityScore(col("text")).as("quality"),
        QualityClassifier.score(col("text")).as("score"),
        col("lm_bucket"),
        TextFns.tokenCount(col("text")).as("n_tok"))
      .withColumn("votes",
        (col("quality") >= 0.5).cast("long") +
          (col("score") > QualityClassifier.Threshold).cast("long") +
          (col("lm_bucket") === "head").cast("long"))
      .withColumn("tier",
        when(col("votes") === 3, "premium")
          .when(col("votes") === 2, "standard")
          .when(col("votes") === 1, "marginal")
          .otherwise("reject"))
  }

  /** Ranked-retrieval query set for t23 (terms from the corpus's
    * marker vocabulary, so every query matches real documents). */
  val Searches: Seq[(String, Seq[String])] = Seq(
    "storage_scan" -> Seq("table", "merge", "batch"),
    "query_shape" -> Seq("join", "filter", "window"),
    "stream_kv" -> Seq("stream", "key", "value"))

  val all: Map[String, Q] = Map(

    // BPE vocabulary INDUCTION (t17 applies a merge table; this learns
    // one): five rounds of count-adjacent-pairs -> merge-the-max over
    // the word-frequency table, the GPT-2 learner loop. Both engines
    // replay identical rounds because merge application is plain
    // substring replacement on bracketed symbol states (no regex, no
    // boundary ambiguity) and ties break lexicographically.
    "t22_bpe_learn" -> Q(bpeLearnOracle(5)) { (s, d) =>
      import s.implicits._
      graft.text.BpeLearn.learnMerges(Tables.documents(s, d), rounds = 5)
        .toDF("mrank", "merge_pat", "pair_count")
        .orderBy("mrank")
    },

    // token accounting: whitespace words + BPE-ish subword proxy.
    "t01_token_stats" -> Q(
      s"""SELECT doc_id,
         |       len(string_split($norm, ' ')) AS n_words,
         |       len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS n_bpe,
         |       len($norm) AS n_chars_norm
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.tokenCount(col("text")).as("n_words"),
          TextFns.bpeTokenCount(col("text")).as("n_bpe"),
          length(TextFns.normalize(col("text"))).cast("long").as("n_chars_norm"))
        .orderBy("doc_id")
    },

    // corpus quality scoring: length credit + stopword credit − punct.
    "t02_quality" -> Q(
      s"""SELECT doc_id,
         |       round(least(n::DOUBLE / 50.0, 1.0) * 0.5 +
         |             (stop_n::DOUBLE / n::DOUBLE) * 0.3 +
         |             (1.0 - CASE WHEN chars = 0 THEN 0.0 ELSE punct_n::DOUBLE / chars::DOUBLE END) * 0.2, 4) AS quality
         |FROM (
         |  SELECT doc_id,
         |         len(string_split($norm, ' ')) AS n,
         |         len(list_filter(string_split($norm, ' '),
         |             w -> w IN $stopList)) AS stop_n,
         |         len(regexp_extract_all($norm, '[^a-z0-9 ]', 0)) AS punct_n,
         |         len($norm) AS chars
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    // trained quality-classifier GATE (fastText-style serving): linear
    // score over hashed unigram+bigram features, ONE native codegen
    // expression with the checked-in weight vector shipped as a plan
    // reference object — scan -> project -> filter, zero shuffles
    // (PlanSpec-pinned). The oracle replays the IDENTICAL arithmetic:
    // same PolyHash64 fold per feature, same 1-based weight lookup into
    // the same literal weight list (exact integer-thousandth decimals),
    // same left-to-right unigrams-then-bigrams summation order via
    // list_reduce, same mean + round(6) + threshold.
    "t31_classifier_gate" -> Q {
      import graft.text.QualityClassifier.Threshold
      s"""WITH w AS (SELECT doc_id, string_split($norm, ' ') AS ws
         |           FROM documents),
         |s AS (SELECT doc_id, CAST(len(ws) * 2 - 1 AS BIGINT) AS n_feat,
         |        $classifierScoreSql AS score
         |      FROM w)
         |SELECT doc_id, n_feat, score FROM s
         |WHERE score > $Threshold ORDER BY doc_id""".stripMargin
    } { (s, d) =>
      import graft.text.QualityClassifier
      Tables.documents(s, d)
        .select(col("doc_id"),
          QualityClassifier.nFeatures(col("text")).as("n_feat"),
          QualityClassifier.score(col("text")).as("score"))
        .filter(col("score") > QualityClassifier.Threshold)
        .orderBy("doc_id")
    },

    // classifier threshold CALIBRATION — the operational step between
    // training a quality model and gating on it: the score
    // distribution per source, as fixed-width histogram buckets
    // (floor(score*50): 0.02-wide, the gate threshold is exactly one
    // bucket edge). Buckets + counts + per-bucket min/max are all
    // integer or order-independent arithmetic over the bit-identical
    // t31 scores, so the report is cross-engine exact (no avg — a
    // float SUM's addend order differs between engines). Map-side
    // scan + one partial-aggregated groupBy; no row survives to the
    // driver but the histogram.
    "t33_score_calibration" -> Q(
      s"""WITH w AS (SELECT doc_id, source, string_split($norm, ' ') AS ws
         |           FROM documents),
         |q AS (SELECT doc_id, source, $classifierScoreSql AS score FROM w)
         |SELECT source, CAST(floor(score * 50) AS BIGINT) AS bucket,
         |       count(*) AS n_docs,
         |       min(score) AS min_score, max(score) AS max_score
         |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import graft.text.QualityClassifier
      Tables.documents(s, d)
        .select(col("source"),
          QualityClassifier.score(col("text")).as("score"))
        .groupBy(col("source"),
          floor(col("score") * 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min("score").as("min_score"), max("score").as("max_score"))
        .orderBy("source", "bucket")
    },

    // DSIR-style importance RESAMPLING (Xie et al. 2023) — the
    // corpus-curation family's third knob after the quality gate (t31)
    // and topic balance (s15): reshape the multilingual pool toward
    // the English-domain hashed n-gram distribution. Per-bucket
    // add-one-smoothed probability ratios come from ONE linear
    // feature-count scan (target membership is a predicate, so both
    // LMs are 64-cell partial aggs of the same explode); the per-doc
    // importance weight is the ORDERED product of per-feature ratios
    // (one native codegen expression, left-to-right IEEE multiply —
    // the oracle's seedless list_reduce replays it bit-for-bit); the
    // keep decision is min(1, budget·w/Σw) through the deterministic
    // ppm hash gate. The Σw normalizer caps then sums DECIMAL(30,15)
    // — order-independent, never raw doubles (the t29 lesson).
    "t34_dsir_resample" -> Q {
      import graft.text.Dsir.{Budget, Dim}
      s"""WITH w AS (SELECT doc_id, lang, string_split($norm, ' ') AS ws
         |           FROM documents WHERE text IS NOT NULL),
         |f AS (SELECT doc_id, lang,
         |        list_concat(ws, list_transform(range(1, len(ws)),
         |          i -> ws[i] || ' ' || ws[i+1])) AS fs
         |      FROM w),
         |b AS (SELECT lang, unnest(list_transform(fs, t ->
         |        CAST((${polyHashSql("t")}) % $Dim AS BIGINT))) AS bucket
         |      FROM f),
         |cr AS (SELECT bucket, count(*) AS c FROM b GROUP BY 1),
         |ct AS (SELECT bucket, count(*) AS c FROM b WHERE lang = 'en'
         |       GROUP BY 1),
         |tr AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM cr),
         |tt AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM ct),
         |rt AS (SELECT g.range AS bucket,
         |         (CAST(coalesce(ct.c, 0) + 1 AS DOUBLE)
         |            / CAST(tt.tot + $Dim AS DOUBLE)) /
         |         (CAST(coalesce(cr.c, 0) + 1 AS DOUBLE)
         |            / CAST(tr.tot + $Dim AS DOUBLE)) AS ratio
         |       FROM range($Dim) g
         |       LEFT JOIN ct ON ct.bucket = g.range
         |       LEFT JOIN cr ON cr.bucket = g.range, tt, tr),
         |rl AS (SELECT list(ratio ORDER BY bucket) AS rl FROM rt),
         |dw AS (SELECT doc_id, lang, CAST(len(fs) AS BIGINT) AS n_feat,
         |         list_reduce(list_transform(fs, t ->
         |           rl.rl[1 + CAST((${polyHashSql("t")}) % $Dim AS BIGINT)]),
         |           (a, b) -> a * b) AS w
         |       FROM f, rl),
         |tw AS (SELECT CAST(sum(CAST(least(w, 1000000.0)
         |                 AS DECIMAL(30,15))) AS DOUBLE) AS tw FROM dw),
         |r AS (SELECT doc_id, lang, n_feat, w,
         |        CAST(floor(least(1.0, $Budget * w / tw.tw)
         |          * 1000000.0) AS BIGINT) AS rate_ppm
         |      FROM dw, tw)
         |SELECT doc_id, lang, n_feat, round(w, 6) AS weight, rate_ppm
         |FROM r
         |WHERE list_reduce(list_transform(
         |        string_split(md5(CAST(doc_id AS VARCHAR) || ':dsir'), ''),
         |        c -> CAST(ascii(c) AS BIGINT)),
         |        (acc, x) -> (acc * 31 + x) % 1000000007) % 1000000
         |      < rate_ppm
         |ORDER BY doc_id""".stripMargin
    } { (s, d) =>
      graft.text.Dsir.resample(Tables.documents(s, d), col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("n_feat"),
          round(col("w"), 6).as("weight"), col("rate_ppm"))
        .orderBy("doc_id")
    },

    // in-engine classifier TRAINING (the curation arc's last verb —
    // t31/t33/d15/t34 SERVE checked-in weights; this FITS them):
    // deterministic full-batch perceptron over Dim=64 hashed
    // unigram+bigram buckets, k=3 fixed iterations, label = lang='en'.
    // Every quantity is exact integer arithmetic (features, gradients,
    // weights, scores — w0=0 + constant rate makes the learning rate
    // irrelevant to the decision sequence, so BIGINT weights ARE the
    // canonical model), and the oracle unrolls the k iterations as
    // chained CTEs over the same PolyHash64 fold. Per iteration: one
    // scan of the persisted pool (misclassification = the native
    // HashedNgramScore expression, weights as a plan reference
    // object), explode -> <=64-cell agg, bounded <=64-row collect.
    // Output = the trained 64-row weight table x the 1-row integer
    // train-accuracy aggregate.
    "t35_classifier_train" -> Q(
      classifierTrainOracle(graft.text.ClassifierTrain.Iters)) { (s, d) =>
      graft.text.ClassifierTrain.train(
        Tables.documents(s, d), col("lang") === "en")
    },

    // fit -> serve OUT OF SAMPLE — the classifier lifecycle closed
    // end-to-end: t35's deterministic perceptron fits on the t05
    // TRAIN split only, then the VAL split is gated with the trained
    // weights (the t31 serving shape: map-side native expression,
    // weights as a plan reference object, no weight-table join). The
    // held-out docs never influence the fit — t26's leakage-safety
    // property, for the model instead of the split. Margins are exact
    // BIGINTs; the oracle replays the train-split fit with the shared
    // perceptron CTE chain and scores the val split under w_k.
    "t37_trained_gate" -> Q {
      val iters = graft.text.ClassifierTrain.Iters
      val D = graft.text.ClassifierTrain.Dim
      val splitFold =
        """list_reduce(list_transform(
          |              string_split(md5(CAST(doc_id AS VARCHAR)), ''),
          |              c -> CAST(ascii(c) AS BIGINT)),
          |              (acc, x) -> (acc * 31 + x) % 1000000007) % 100"""
          .stripMargin
      s"""WITH ${perceptronCtes(iters, s"\n    AND $splitFold < 80")},
         |vd AS (SELECT doc_id, lang, string_split($norm, ' ') AS ws
         |       FROM documents WHERE text IS NOT NULL
         |         AND $splitFold >= 80),
         |vx AS (
         |  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS x FROM (
         |    SELECT doc_id, unnest(list_transform(
         |        list_concat(ws, list_transform(range(1, len(ws)),
         |          i -> ws[i] || ' ' || ws[i+1])),
         |        t -> CAST((${polyHashSql("t")}) % $D AS BIGINT))) AS bucket
         |    FROM vd) GROUP BY 1, 2),
         |sv AS (SELECT vx.doc_id, CAST(sum(w.w * vx.x) AS BIGINT) AS margin
         |       FROM vx JOIN w$iters w USING (bucket) GROUP BY 1)
         |SELECT vd.doc_id, vd.lang, sv.margin,
         |       CAST(CASE WHEN sv.margin > 0 THEN 1 ELSE 0 END AS BIGINT)
         |         AS pred
         |FROM vd JOIN sv USING (doc_id)
         |ORDER BY vd.doc_id""".stripMargin
    } { (s, d) =>
      graft.text.ClassifierTrain.trainedGate(
          Tables.documents(s, d), col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("margin"), col("pred"))
        .orderBy("doc_id")
    },

    // the LEARNING CURVE — train AND held-out accuracy after EVERY
    // perceptron iteration, the evidence that picks k (still improving
    // out of sample, or only memorizing?). ONE fit yields all k weight
    // snapshots (fitHistory); ONE aggregate scan per split evaluates
    // every snapshot side by side (k scoring expressions in one
    // projection — never k passes); the 2k-row curve assembles from
    // two bounded 1-row collects. The oracle reuses the shared
    // perceptron CTE chain (w1..wk are already all there) and tails a
    // per-iteration FILTER count for each split.
    "t38_learning_curve" -> Q {
      val iters = graft.text.ClassifierTrain.Iters
      val D = graft.text.ClassifierTrain.Dim
      val splitFold =
        """list_reduce(list_transform(
          |              string_split(md5(CAST(doc_id AS VARCHAR)), ''),
          |              c -> CAST(ascii(c) AS BIGINT)),
          |              (acc, x) -> (acc * 31 + x) % 1000000007) % 100"""
          .stripMargin
      val accCtes = (1 to iters).map { r =>
        s"""st$r AS (SELECT CAST(count(*) FILTER (
           |           WHERE p.y * coalesce(s.s, 0) > 0) AS BIGINT) AS c
           |         FROM pool p LEFT JOIN (
           |           SELECT fx.doc_id, CAST(sum(w.w * fx.x) AS BIGINT) AS s
           |           FROM fx JOIN w$r w USING (bucket) GROUP BY 1) s
           |           ON s.doc_id = p.doc_id),
           |sv$r AS (SELECT CAST(count(*) FILTER (
           |           WHERE v.y * coalesce(s.s, 0) > 0) AS BIGINT) AS c
           |         FROM vd v LEFT JOIN (
           |           SELECT vx.doc_id, CAST(sum(w.w * vx.x) AS BIGINT) AS s
           |           FROM vx JOIN w$r w USING (bucket) GROUP BY 1) s
           |           ON s.doc_id = v.doc_id)""".stripMargin
      }.mkString(",\n")
      val unions = (1 to iters).flatMap { r =>
        Seq(
          s"""SELECT CAST($r AS BIGINT) AS iter, 'train' AS split,
             |         st$r.c AS n_correct, tn.n AS n_total FROM st$r, tn"""
            .stripMargin,
          s"""SELECT CAST($r AS BIGINT), 'val', sv$r.c, vn.n
             |  FROM sv$r, vn""".stripMargin)
      }.mkString("\n  UNION ALL ")
      s"""WITH ${perceptronCtes(iters, s"\n    AND $splitFold < 80")},
         |vd AS (SELECT doc_id,
         |         CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
         |         string_split($norm, ' ') AS ws
         |       FROM documents WHERE text IS NOT NULL
         |         AND $splitFold >= 80),
         |vx AS (
         |  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS x FROM (
         |    SELECT doc_id, unnest(list_transform(
         |        list_concat(ws, list_transform(range(1, len(ws)),
         |          i -> ws[i] || ' ' || ws[i+1])),
         |        t -> CAST((${polyHashSql("t")}) % $D AS BIGINT))) AS bucket
         |    FROM vd) GROUP BY 1, 2),
         |tn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pool),
         |vn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vd),
         |$accCtes
         |SELECT iter, split, n_correct, n_total FROM (
         |  $unions)
         |ORDER BY iter, split""".stripMargin
    } { (s, d) =>
      graft.text.ClassifierTrain.learningCurve(
        Tables.documents(s, d), col("lang") === "en")
    },

    // vocabulary-coverage curve — the tokenizer/vocab sizing evidence
    // that pairs with t22's BPE learner: rank distinct tokens by exact
    // corpus frequency and report the rank (= vocab size) at which
    // cumulative token mass first crosses 50/90/99% coverage. The
    // running sum comes from RangeRank.withRankAndPrefixSum (X65: the
    // zipWithIndex two-job pattern generalized to prefix sums — NO
    // `Exchange SinglePartition` window at any vocabulary size; the
    // grand total falls out of the same bounded per-partition offsets
    // collect, so the thresholds are literals, not an extra scan or a
    // 1-row join). Crossing test is integer cross-multiplied:
    // (cum - cnt)·100 < pct·total <= cum·100 — exactly one row per
    // threshold, no floats anywhere.
    "t36_vocab_coverage" -> Q(
      s"""WITH tok AS (SELECT unnest(string_split($norm, ' ')) AS term
         |            FROM documents),
         |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
         |       FROM tok GROUP BY 1),
         |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM tc),
         |r AS (SELECT term, cnt,
         |        CAST(row_number() OVER (ORDER BY cnt DESC, term)
         |          AS BIGINT) AS rank,
         |        CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |      FROM tc)
         |SELECT CAST(p.pct AS BIGINT) AS pct, r.rank, r.term,
         |       r.cum AS cum_tokens, t.tot AS total_tokens
         |FROM r, t, (VALUES (50), (90), (99)) p(pct)
         |WHERE (r.cum - r.cnt) * 100 < p.pct * t.tot
         |  AND r.cum * 100 >= p.pct * t.tot
         |ORDER BY pct""".stripMargin) { (s, d) =>
      import graft.operators.RangeRank
      val tc = Tables.documents(s, d)
        .select(explode(TextFns.words(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      val (ranked, total) = RangeRank.withRankAndPrefixSum(tc,
        Seq(col("cnt").desc, col("term")), "cnt", "rank", "cum")
      ranked
        .select(explode(array(lit(50L), lit(90L), lit(99L))).as("pct"),
          col("rank"), col("term"), col("cnt"), col("cum"))
        .filter((col("cum") - col("cnt")) * 100 < col("pct") * total &&
          col("cum") * 100 >= col("pct") * total)
        .select(col("pct"), col("rank"), col("term"),
          col("cum").as("cum_tokens"), lit(total).as("total_tokens"))
        .orderBy("pct")
    },

    // LABEL-FREE LM quality scoring — the CCNet/Gopher-class
    // perplexity filter (Wenzek et al. 2020), the curation step real
    // pipelines run FIRST: fit an add-one-smoothed hashed-ngram bucket
    // LM on a clean REFERENCE corpus (provenance-selected — the two
    // trusted providers — no labels anywhere), then bucket every
    // document head/middle/tail by its geometric-mean likelihood
    // under that model. NO log/exp (transcendentals are not bit-exact
    // cross-engine — the t34 lesson): "gm ≥ θ·uniform" is restated as
    // the ordered product Π p[h(f)]·Dim/θ ≥ 1 — one native
    // HashedNgramProduct per threshold, ratio table as a plan
    // reference object, left-to-right IEEE multiply that DuckDB's
    // seedless list_reduce replays bit-for-bit. lm_mass anchors the
    // hash gate on exact integers (Σ smoothed counts, the t35
    // integer-valued-double bound); thresholds are exact binary
    // fractions (5/4, 19/16). Fit = one bounded ≤64-row collect;
    // scoring = pure map-side scan, zero shuffles (PlanSpec-pinned).
    "t39_lm_quality" -> Q {
      import graft.text.LmQuality.{Dim, HeadGm, TailGm}
      s"""WITH w AS (SELECT doc_id, lang, source,
         |             string_split($norm, ' ') AS ws
         |           FROM documents WHERE text IS NOT NULL),
         |f AS (SELECT doc_id, lang, source,
         |        list_concat(ws, list_transform(range(1, len(ws)),
         |          i -> ws[i] || ' ' || ws[i+1])) AS fs
         |      FROM w),
         |rb AS (SELECT unnest(list_transform(fs, t ->
         |         CAST((${polyHashSql("t")}) % $Dim AS BIGINT))) AS bucket
         |       FROM f WHERE source IN ('src0', 'src1')),
         |c AS (SELECT bucket, count(*) AS c FROM rb GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM c),
         |lm AS (SELECT g.range AS bucket,
         |         CAST(coalesce(c.c, 0) + 1 AS BIGINT) AS num,
         |         CAST(coalesce(c.c, 0) + 1 AS DOUBLE)
         |           / CAST(tot.tot + $Dim AS DOUBLE) * $Dim.0 AS r
         |       FROM range($Dim) g LEFT JOIN c ON c.bucket = g.range, tot),
         |pl AS (SELECT list(r / $HeadGm ORDER BY bucket) AS rh,
         |              list(r / $TailGm ORDER BY bucket) AS rt,
         |              list(num ORDER BY bucket) AS ml FROM lm),
         |dw AS (SELECT doc_id, lang, CAST(len(fs) AS BIGINT) AS n_feat,
         |         CAST(list_reduce(list_transform(fs, t ->
         |           pl.ml[1 + CAST((${polyHashSql("t")}) % $Dim AS BIGINT)]),
         |           (a, b) -> a + b) AS BIGINT) AS lm_mass,
         |         list_reduce(list_transform(fs, t ->
         |           pl.rh[1 + CAST((${polyHashSql("t")}) % $Dim AS BIGINT)]),
         |           (a, b) -> a * b) AS wh,
         |         list_reduce(list_transform(fs, t ->
         |           pl.rt[1 + CAST((${polyHashSql("t")}) % $Dim AS BIGINT)]),
         |           (a, b) -> a * b) AS wt
         |       FROM f, pl)
         |SELECT doc_id, lang, n_feat, lm_mass,
         |       round(least(wh, 1000000000000.0), 6) AS lm_score,
         |       CASE WHEN wh >= 1.0 THEN 'head'
         |            WHEN wt >= 1.0 THEN 'middle'
         |            ELSE 'tail' END AS lm_bucket
         |FROM dw ORDER BY doc_id""".stripMargin
    } { (s, d) =>
      graft.text.LmQuality.scored(Tables.documents(s, d),
          col("source").isin("src0", "src1"))
        .select(col("doc_id"), col("lang"), col("n_feat"), col("lm_mass"),
          col("lm_score"), col("lm_bucket"))
        .orderBy("doc_id")
    },

    // multi-signal quality ENSEMBLE (the FineWeb/Dolma production
    // shape): no single quality signal is trusted alone — the tier is
    // a VOTE over the three independent families the engine now has,
    // heuristic (t02 length/stopword/punctuation credit), trained
    // classifier (t31 hashed n-gram linear score), and label-free LM
    // (t39 head bucket). votes ∈ {0..3} is exact integer arithmetic
    // over three signals that are each individually bit-exact
    // cross-engine, so the tier assignment ('premium' 3 / 'standard' 2
    // / 'marginal' 1 / 'reject' 0) can never sit on a rounding edge
    // the component queries don't already pin. ONE scan: all three
    // scores are map-side expressions (two native codegen kernels +
    // a projection), the LM ratio tables ride as plan reference
    // objects — zero joins, zero windows (PlanSpec-pinned), the
    // three-gate pipeline fused into a single pass over the corpus
    // instead of three materialized filter stages.
    "t40_quality_ensemble" -> Q {
      s"""WITH $ensembleCtes
         |SELECT doc_id, quality, score, lm_bucket, votes, tier
         |FROM tv ORDER BY doc_id""".stripMargin
    } { (s, d) =>
      ensembleTiers(s, d)
        .select("doc_id", "quality", "score", "lm_bucket", "votes",
          "tier")
        .orderBy("doc_id")
    },

    // quality-TIER-aware mixing (t41 — the FineWeb/Dolma ENDGAME: the
    // ensemble exists to DRIVE sampling, not just label): t40's tiers
    // meet t29's budget machinery. A fixed token budget is spent down
    // a priority WATERFALL — premium keeps everything the budget
    // allows, standard gets what remains, marginal is additionally
    // CLAMPED (never more than 25% even under a slack budget — low-
    // quality data stops helping before it stops fitting), reject
    // keeps nothing. All rate arithmetic is exact BIGINT ppm: rate =
    // min(cap, remaining_ppm_tokens DIV tok_tier) with integer
    // division on BOTH engines (Spark folds the ≤ 4-row tier totals
    // driver-side in Longs; DuckDB uses //), so no float ever touches
    // a keep decision. Per-doc inclusion is the t29 zero-RNG ppm hash
    // gate salted by tier. At sf0.01 the waterfall exercises every
    // branch class: premium+standard at the full rate, marginal at
    // the binding 250000 clamp (the budget remainder divides to
    // ~332k), reject at 0. Scale shape: the tier scan (t40's fused
    // map-side pass) + one ≤ 4-row aggregate + one gated scan — the
    // rates never join, they ride as literals.
    "t41_tier_mixing" -> Q {
      val keepFold =
        """list_reduce(list_transform(
          |          string_split(md5(CAST(doc_id AS VARCHAR) || ':' || tier), ''),
          |          c -> CAST(ascii(c) AS BIGINT)),
          |          (acc, x) -> (acc * 31 + x) % 1000000007) % 1000000"""
          .stripMargin
      s"""WITH $ensembleCtes,
         |tt AS (SELECT
         |    CAST(coalesce(sum(CASE WHEN tier = 'premium' THEN n_tok END),
         |      0) AS BIGINT) AS tok_p,
         |    CAST(coalesce(sum(CASE WHEN tier = 'standard' THEN n_tok END),
         |      0) AS BIGINT) AS tok_s,
         |    CAST(coalesce(sum(CASE WHEN tier = 'marginal' THEN n_tok END),
         |      0) AS BIGINT) AS tok_m
         |  FROM tv),
         |w1 AS (SELECT tok_s, tok_m,
         |    CASE WHEN tok_p = 0 THEN CAST(1000000 AS BIGINT)
         |         ELSE least(CAST(1000000 AS BIGINT),
         |           CAST($TierMixBudgetPpm // tok_p AS BIGINT)) END AS r_p,
         |    tok_p FROM tt),
         |w2 AS (SELECT *, $TierMixBudgetPpm - tok_p * r_p AS rem1 FROM w1),
         |w3 AS (SELECT *,
         |    CASE WHEN tok_s = 0 THEN CAST(1000000 AS BIGINT)
         |         ELSE least(CAST(1000000 AS BIGINT),
         |           CAST(rem1 // tok_s AS BIGINT)) END AS r_s FROM w2),
         |w4 AS (SELECT *, rem1 - tok_s * r_s AS rem2 FROM w3),
         |w5 AS (SELECT *,
         |    CASE WHEN tok_m = 0 THEN CAST($MarginalCapPpm AS BIGINT)
         |         ELSE least(CAST($MarginalCapPpm AS BIGINT),
         |           CAST(rem2 // tok_m AS BIGINT)) END AS r_m FROM w4),
         |k AS (SELECT tv.doc_id, CAST(tv.n_tok AS BIGINT) AS n_tok,
         |        tv.votes, tv.tier,
         |        CASE tv.tier WHEN 'premium' THEN w5.r_p
         |             WHEN 'standard' THEN w5.r_s
         |             WHEN 'marginal' THEN w5.r_m
         |             ELSE CAST(0 AS BIGINT) END AS rate_ppm
         |      FROM tv, w5)
         |SELECT doc_id, n_tok, votes, tier, rate_ppm
         |FROM k
         |WHERE $keepFold < rate_ppm
         |ORDER BY doc_id""".stripMargin
    } { (s, d) =>
      // unmanaged registry wrapper over the Managed library form: the
      // cache holds 7 narrow columns (never the text); the
      // one-live-frame SessionRelease bounds it per session
      val (out, release) = tierMixManaged(s, d)
      tierMixUnmanagedRelease.swap(s, release)
      out
    },

    // keyword-profile language/domain ID: left-fold argmax, first
    // profile wins ties — fold mirrored literally in SQL.
    "t03_profile_id" -> Q(
      s"""SELECT doc_id,
         |       CASE WHEN s3 > greatest(s1, s2)
         |              THEN 'stream'
         |            WHEN s2 > s1 THEN 'query'
         |            ELSE 'storage' END AS profile
         |FROM (
         |  SELECT doc_id,
         |         len(list_filter(string_split($norm, ' '),
         |             w -> w IN ('table','scan','merge','part','batch','row'))) AS s1,
         |         len(list_filter(string_split($norm, ' '),
         |             w -> w IN ('join','filter','group','sort','window','order'))) AS s2,
         |         len(list_filter(string_split($norm, ' '),
         |             w -> w IN ('stream','fast','slow','value','key','data'))) AS s3
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.profileId(col("text"), Profiles).as("profile"))
        .orderBy("doc_id")
    },

    // deterministic train/val split: md5-decorrelated id hash % 100 —
    // stable across runs/partitioning/engines, no RNG state.
    "t05_train_val_split" -> Q(
      """SELECT doc_id,
        |       CASE WHEN list_reduce(list_transform(
        |              string_split(md5(CAST(doc_id AS VARCHAR)), ''),
        |              c -> CAST(ascii(c) AS BIGINT)),
        |              (acc, x) -> (acc * 31 + x) % 1000000007) % 100 < 80
        |            THEN 'train' ELSE 'val' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.splitAssign(col("doc_id")).as("split"))
        .orderBy("doc_id")
    },

    // sequence packing plan (concat-and-chunk): docs are concatenated
    // in id order within a shard and chunked into 2048-token context
    // windows; a doc's pack is where its first token lands. Sharding
    // bounds the ordered-cumsum state per partition — packing state
    // never crosses shards, so the window scales horizontally instead
    // of forcing a global single-partition sort.
    "t06_sequence_pack" -> Q(
      s"""SELECT doc_id, n_tok,
         |       shard * 1000000 +
         |         CAST(floor(cum_before / 2048.0) AS BIGINT) AS pack_id,
         |       cum_before % 2048 AS pack_offset
         |FROM (
         |  SELECT doc_id, n_tok, shard,
         |         coalesce(CAST(sum(n_tok) OVER (PARTITION BY shard
         |           ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           AS BIGINT), 0) AS cum_before
         |  FROM (
         |    SELECT doc_id,
         |           len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))
         |             AS n_tok,
         |           doc_id % 8 AS shard
         |    FROM documents))
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextFns.bpeTokenCount(col("text")).as("n_tok"),
          pmod(col("doc_id"), lit(8L)).as("shard"))
        .withColumn("cum_before",
          coalesce(sum("n_tok").over(w), lit(0L)))
        .select(col("doc_id"), col("n_tok"),
          (col("shard") * 1000000 +
            floor(col("cum_before") / 2048.0).cast("long")).as("pack_id"),
          pmod(col("cum_before"), lit(2048L)).as("pack_offset"))
        .orderBy("doc_id")
    },

    // Gopher-style repetition diagnostics: share of the most frequent
    // word / bigram and the type-token ratio, as exact ppm longs.
    // explode -> two-level hash-agg; scan-bound at corpus scale.
    "t07_repetition" -> Q(
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split($norm, ' ')) AS gram
         |  FROM documents),
         |wc AS (SELECT doc_id, gram, count(*) AS c FROM w GROUP BY 1, 2),
         |ws AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n,
         |              count(*) AS n_distinct
         |       FROM wc GROUP BY 1),
         |bl AS (SELECT doc_id, string_split($norm, ' ') AS wl FROM documents),
         |b AS (SELECT doc_id, unnest(list_transform(range(1, len(wl)),
         |             i -> wl[i] || ' ' || wl[i+1])) AS gram
         |      FROM bl),
         |bc AS (SELECT doc_id, gram, count(*) AS c FROM b GROUP BY 1, 2),
         |bs AS (SELECT doc_id, max(c) AS bi_top_c, sum(c) AS bi_n
         |       FROM bc GROUP BY 1)
         |SELECT ws.doc_id,
         |       CAST(floor(CAST(top_c AS DOUBLE) * 1000000.0 /
         |            CAST(n AS DOUBLE)) AS BIGINT) AS top_word_ppm,
         |       coalesce(CAST(floor(CAST(bi_top_c AS DOUBLE) * 1000000.0 /
         |            CAST(bi_n AS DOUBLE)) AS BIGINT), 0) AS top_bigram_ppm,
         |       CAST(floor(CAST(n_distinct AS DOUBLE) * 1000000.0 /
         |            CAST(n AS DOUBLE)) AS BIGINT) AS distinct_word_ppm
         |FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
         |ORDER BY ws.doc_id""".stripMargin) { (s, d) =>
      graft.text.Repetition.metrics(Tables.documents(s, d))
        .orderBy("doc_id")
    },

    // deterministic corpus shuffle: global order by md5(doc_id) —
    // reproducible across runs/engines/partitionings, which a training
    // data-loader needs for resumable epochs. The rank is
    // graft.operators.RangeRank, NOT a no-partition row_number window:
    // that window plans `Exchange SinglePartition` (WindowExec demands
    // AllTuples) and an epoch shuffle runs over the ENTIRE corpus by
    // definition — every row through one task. RangeRank ranks on the
    // plan a global sort actually uses: range-partitioned exchange +
    // partition-local sort + cumulative partition offsets
    // (RangeRankSpec pins both the equivalence and the plan shape).
    "t08_corpus_shuffle" -> Q(
      """SELECT doc_id,
        |       row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
        |                          doc_id) AS shuffle_pos
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // shuffle_pos stays the rank's native BIGINT (DuckDB row_number
      // is BIGINT too): a cast to int would silently wrap past 2^31
      // rows — exactly the corpus scale RangeRank exists for
      graft.operators.RangeRank.withGlobalRank(
          Tables.documents(s, d)
            .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h")),
          Seq(col("h"), col("doc_id")), "shuffle_pos")
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy("doc_id")
    },

    // epoch-shard manifest: the export step after t08's shuffle — docs
    // land in fixed-size shards BY SHUFFLE POSITION (shard = pos div
    // 64), and the manifest a data-loader resumes from records each
    // shard's doc count, token budget and position range. Composes
    // RangeRank (second consumer) with the BPE token proxy; the
    // aggregation is a hash-agg over the rank output — no second sort,
    // no window. A writer would partitionBy(shard) on exactly this
    // frame.
    "t27_epoch_shards" -> Q(
      s"""WITH r AS (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
         |                            doc_id) AS pos,
         |         len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))
         |           AS n_tok
         |  FROM documents)
         |SELECT CAST(floor((pos - 1) / 64.0) AS BIGINT) AS shard,
         |       count(*) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |       CAST(min(pos) AS BIGINT) AS pos_lo,
         |       CAST(max(pos) AS BIGINT) AS pos_hi
         |FROM r GROUP BY 1 ORDER BY shard""".stripMargin) { (s, d) =>
      graft.operators.RangeRank.withGlobalRank(
          Tables.documents(s, d)
            .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"),
              TextFns.bpeTokenCount(col("text")).as("n_tok")),
          Seq(col("h"), col("doc_id")), "pos")
        .groupBy(floor((col("pos") - 1) / 64.0).cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").cast("long").as("n_tokens"),
          min("pos").as("pos_lo"),
          max("pos").as("pos_hi"))
        .orderBy("shard")
    },

    // salient-term extraction: top-3 terms per doc ranked by term
    // frequency, rarity (document frequency asc) breaking ties, then
    // the term itself — an integer-only TF-IDF surrogate that is exact
    // across engines (float idf products rank differently per libm).
    // Shape: explode -> (doc, term) counts; df as a second hash-agg
    // over distinct (doc, term); broadcast-join df back; window top-3.
    "t09_salient_terms" -> Q(
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split($norm, ' ')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |r AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |         row_number() OVER (PARTITION BY tf.doc_id
         |           ORDER BY tf.tf DESC, df.df, tf.term) AS rank
         |  FROM tf JOIN df ON tf.term = df.term)
         |SELECT doc_id, rank, term, tf, df
         |FROM r WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val terms = Tables.documents(s, d).select(col("doc_id"),
        explode(TextFns.words(col("text"))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df"), col("term"))
      // no broadcast hint: a 100 TB corpus vocabulary outgrows a
      // broadcast; AQE picks broadcast itself while df stays small
      tf.join(df, Seq("term"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("doc_id", "rank", "term", "tf", "df")
        .orderBy("doc_id", "rank")
    },

    // heavy-hitters sketch in its EXACT regime: capacity exceeds the
    // distinct-value count, so Misra-Gries never evicts and the sketch
    // degenerates to exact per-value counts — deterministic, hence
    // oracle-checkable here; the approximate regime is bound-checked in
    // HeavyHittersSpec. Still one map-side-combined pass either way.
    "t10_heavy_hitters" -> Q(
      """SELECT event_type AS item, count(*) AS cnt
        |FROM events GROUP BY 1
        |ORDER BY cnt DESC, item""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .agg(graft.functions.HeavyHittersAgg
          .heavyHitters(col("event_type"), 16).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("item"), col("e.count").as("cnt"))
        .orderBy(col("cnt").desc, col("item"))
    },

    // corpus gate composition — the "training-ready subset" pass a real
    // pipeline runs before packing: exact-dedup keeper (lowest doc_id
    // per content fingerprint survives) AND quality threshold. One
    // fingerprint hash-agg + a semi join + the map-side quality filter.
    "t11_corpus_gate" -> Q(
      s"""WITH fp AS (
         |  SELECT doc_id, md5($norm) AS fp FROM documents),
         |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
         |q AS (
         |  SELECT doc_id,
         |         round(least(n::DOUBLE / 50.0, 1.0) * 0.5 +
         |               (stop_n::DOUBLE / n::DOUBLE) * 0.3 +
         |               (1.0 - CASE WHEN chars = 0 THEN 0.0 ELSE punct_n::DOUBLE / chars::DOUBLE END) * 0.2, 4)
         |           AS quality
         |  FROM (
         |    SELECT doc_id,
         |           len(string_split($norm, ' ')) AS n,
         |           len(list_filter(string_split($norm, ' '),
         |               w -> w IN $stopList)) AS stop_n,
         |           len(regexp_extract_all($norm, '[^a-z0-9 ]', 0)) AS punct_n,
         |           len($norm) AS chars
         |    FROM documents))
         |SELECT q.doc_id, q.quality
         |FROM q JOIN keep ON q.doc_id = keep.doc_id
         |WHERE q.quality >= 0.5
         |ORDER BY q.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val keep = docs
        .select(col("doc_id"), TextFns.fingerprintMd5(col("text")).as("fp"))
        .groupBy("fp").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      docs.join(keep, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), TextFns.qualityScore(col("text")).as("quality"))
        .filter(col("quality") >= 0.5)
        .orderBy("doc_id")
    },

    // content fingerprints: md5 of normalized text + polynomial rolling
    // hash (engine-neutral: seeded from the first char code).
    "t04_fingerprint" -> Q(
      s"""SELECT doc_id,
         |       md5($norm) AS fp_md5,
         |       list_reduce(list_transform(string_split($norm, ''),
         |                   c -> CAST(ascii(c) AS BIGINT)),
         |                   (acc, x) -> (acc * 31 + x) % 1000000007) AS fp_roll
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.fingerprintMd5(col("text")).as("fp_md5"),
          TextFns.fingerprintRolling(col("text")).as("fp_roll"))
        .orderBy("doc_id")
    },

    // deterministic stratified corpus rebalance: downsample the head
    // language to 40%, keep the tail languages at 90%
    // (TextFns.stratifiedKeep — hash-gated, no RNG state, identical
    // row set on both engines and at any partitioning).
    "t13_stratified_sample" -> Q(
      """SELECT doc_id, lang
        |FROM documents
        |WHERE list_reduce(list_transform(
        |        string_split(md5(CAST(doc_id AS VARCHAR) || ':' || lang), ''),
        |        c -> CAST(ascii(c) AS BIGINT)),
        |        (acc, x) -> (acc * 31 + x) % 1000000007) % 100
        |      < CASE lang WHEN 'en' THEN 40 ELSE 90 END
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val rate = when(col("lang") === "en", lit(40)).otherwise(lit(90))
      Tables.documents(s, d)
        .where(TextFns.stratifiedKeep(col("doc_id"), col("lang"), rate))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // systematic PPS weighted sampling: per source, lay documents on a
    // character-count weight line (doc_id order) and keep the ones
    // whose interval crosses one of 25 even stride boundaries —
    // inclusion probability exactly proportional to n_chars, zero RNG,
    // pure integer arithmetic, so the sample is byte-identical across
    // engines, runs and partitionings. The weighted complement to
    // t13's equal-probability stratified gate (sampling by length is
    // how token-budget subcorpora get drawn without length bias).
    "t20_pps_sample" -> Q(
      """WITH c AS (
        |  SELECT doc_id, source, n_chars,
        |         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |                            ROWS UNBOUNDED PRECEDING) AS cw,
        |         sum(n_chars) OVER (PARTITION BY source) AS tw
        |  FROM documents)
        |SELECT doc_id, source, n_chars
        |FROM c
        |WHERE (cw * 25) // tw > ((cw - n_chars) * 25) // tw
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val run = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy("source")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          sum("n_chars").over(run).as("cw"),
          sum("n_chars").over(tot).as("tw"))
        .where(TextFns.ppsKeep(col("cw"), col("n_chars"), col("tw"), 25))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },

    // Unicode-canonical text normalization: NFC composition (native
    // codegen expression graft.functions.NfcNormalize — Spark has no
    // built-in) before the case/whitespace pass, so precomposed and
    // decomposed spellings of the same text produce one canonical form
    // (and therefore one dedup fingerprint). Pure map over the corpus.
    "t14_normalize_nfc" -> Q(
      """SELECT doc_id,
        |       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
        |         AS text_norm,
        |       len(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ',
        |           'g'))) AS n_chars_norm
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val norm = trim(regexp_replace(
        lower(graft.functions.NfcNormalize(col("text"))), "\\s+", " "))
      Tables.documents(s, d).select(col("doc_id"),
          norm.as("text_norm"),
          length(norm).cast("long").as("n_chars_norm"))
        .orderBy("doc_id")
    },

    // token-budget corpus mix: each source contributes a greedy doc_id-
    // ordered prefix until its 1500-token budget is crossed — the
    // budget-based counterpart of rate-based t13 (a pretraining mixture
    // is usually specified in tokens per domain, not keep-rates). One
    // window cumsum per source; a doc is in while the tokens BEFORE it
    // are under budget, so every source takes at least one doc.
    "t15_token_budget_mix" -> Q(
      s"""WITH t AS (
         |  SELECT doc_id, source, len(string_split($norm, ' ')) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tok,
         |         coalesce(CAST(sum(n_tok) OVER (PARTITION BY source
         |           ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           AS BIGINT), 0) AS cum_before
         |  FROM t)
         |SELECT doc_id, source, n_tok, cum_before
         |FROM c WHERE cum_before < 1500
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextFns.tokenCount(col("text")).as("n_tok"))
        .withColumn("cum_before",
          coalesce(sum("n_tok").over(w), lit(0L)))
        .filter(col("cum_before") < 1500)
        .orderBy("doc_id")
    },

    // PII scrub (TextFns.redactPii + piiCounts) over a deterministic
    // synthetic-PII fixture: the corpus carries no real PII, so each
    // doc gets an email, an IPv4 and a phone number derived from its
    // doc_id (same derivation on both engines), prefixed to a fragment
    // of the real text. The scrub itself is the production regex chain
    // — a pure codegen'd map at scan speed, the shape a 100 TB
    // pre-training scrub pass needs.
    "t16_pii_redact" -> Q(
      s"""WITH f AS (
         |  SELECT doc_id,
         |         'User ' || CAST(doc_id AS VARCHAR)
         |           || ' <user' || CAST(doc_id AS VARCHAR)
         |           || '@mail' || CAST(doc_id % 7 AS VARCHAR)
         |           || '.example.com> from '
         |           || CAST(doc_id % 256 AS VARCHAR) || '.'
         |           || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
         |           || CAST((doc_id * 13) % 256 AS VARCHAR) || '.'
         |           || CAST(doc_id % 100 AS VARCHAR)
         |           || ' call +' || CAST(1 + doc_id % 9 AS VARCHAR)
         |           || ' (' || CAST(200 + doc_id % 700 AS VARCHAR)
         |           || ') ' || CAST(300 + doc_id % 600 AS VARCHAR)
         |           || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
         |           || ' :: ' || substr(text, 1, 48) AS pii
         |  FROM documents)
         |SELECT doc_id,
         |       regexp_replace(regexp_replace(regexp_replace(pii,
         |         '$EmailReSql', '<EMAIL>', 'g'),
         |         '$IpReSql', '<IP>', 'g'),
         |         '$PhoneReSql', '<PHONE>', 'g') AS redacted,
         |       len(regexp_extract_all(pii, '$EmailReSql', 0)) AS emails,
         |       len(regexp_extract_all(pii, '$IpReSql', 0)) AS ips,
         |       len(regexp_extract_all(
         |         regexp_replace(pii, '$EmailReSql', ' ', 'g'),
         |         '$PhoneReSql', 0)) AS phones
         |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      val id = col("doc_id")
      def str(c: org.apache.spark.sql.Column) = c.cast("string")
      val pii = concat(
        lit("User "), str(id), lit(" <user"), str(id),
        lit("@mail"), str(id % 7), lit(".example.com> from "),
        str(id % 256), lit("."), str((id * 7) % 256), lit("."),
        str((id * 13) % 256), lit("."), str(id % 100),
        lit(" call +"), str(id % 9 + 1),
        lit(" ("), str(id % 700 + 200),
        lit(") "), str(id % 600 + 300),
        lit("-"), str(id % 9000 + 1000),
        lit(" :: "), substring(col("text"), 1, 48))
      Tables.documents(s, d)
        .select(col("doc_id"), pii.as("pii"))
        .select(col("doc_id"),
          TextFns.redactPii(col("pii")).as("redacted"),
          TextFns.piiCounts(col("pii")).as("pc"))
        .select(col("doc_id"), col("redacted"),
          col("pc.emails").as("emails"), col("pc.ips").as("ips"),
          col("pc.phones").as("phones"))
        .orderBy("doc_id")
    },

    // true merge-table BPE token accounting (vs t01's regex proxy):
    // rank-ordered merges over character symbols, the real budget-math
    // tokenizer shape. The oracle runs the generated-from-the-same-
    // table replace chain, so a merge-table edit breaks the hash
    // instead of silently skewing counts.
    "t17_bpe_tokens" -> Q(
      s"""WITH n AS (SELECT doc_id, $norm AS norm FROM documents),
         |e AS (SELECT doc_id, norm, $bpeChainSql AS enc FROM n)
         |SELECT doc_id,
         |       len(string_split(norm, ' ')) AS n_words,
         |       length(enc) - length(replace(enc, chr(1), ''))
         |         - (length(norm) - length(replace(norm, ' ', ''))) AS n_bpe
         |FROM e ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.tokenCount(col("text")).as("n_words"),
          TextFns.bpeMergeTokenCount(col("text")).as("n_bpe"))
        .orderBy("doc_id")
    },

    // cross-document boilerplate detection: 8-word passages that repeat
    // across >= 3 distinct documents are template/boilerplate text (the
    // C4-style cleanup pass at passage granularity, complementing t07's
    // INTRA-doc repetition and t12's overlap vs a fixed eval set).
    // Shape: window explode -> hash-agg passage frequencies -> semi
    // join back; every stage is passage/doc-keyed shuffle work with
    // map-side partials, no driver state — scan-bound at 100 TB.
    "t18_boilerplate" -> Q(
      s"""WITH w AS (SELECT doc_id, string_split($norm, ' ') AS ws
         |           FROM documents),
         |p AS (
         |  SELECT doc_id,
         |         unnest(list_transform(
         |           range(1, greatest(len(ws) - 7, 0) + 1),
         |           i -> array_to_string(list_slice(ws, i, i + 7), ' ')))
         |           AS passage
         |  FROM w),
         |f AS (SELECT passage FROM p
         |      GROUP BY passage HAVING count(DISTINCT doc_id) >= 3)
         |SELECT doc_id, count(*) AS n_passages,
         |       count(CASE WHEN passage IN (SELECT passage FROM f)
         |             THEN 1 END) AS n_boiler
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val k = 8
      val passages = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.words(col("text")).as("ws"))
        .select(col("doc_id"), explode(
          // guard: sequence(1, 0) counts DOWN in Spark, so short docs
          // must yield an empty window list, not a reversed one
          when(size(col("ws")) >= k, transform(
            sequence(lit(1), size(col("ws")) - (k - 1)),
            i => concat_ws(" ", slice(col("ws"), i, lit(k)))))
            .otherwise(array().cast("array<string>"))).as("passage"))
      val boiler = passages.groupBy("passage")
        .agg(countDistinct("doc_id").as("n_docs"))
        .filter(col("n_docs") >= 3)
        .select("passage")
      val flagged = passages.join(boiler, Seq("passage"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
      passages.groupBy("doc_id").agg(count(lit(1)).as("n_passages"))
        .join(flagged, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_passages"),
          coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
        .orderBy("doc_id")
    },

    // BM25 ranked retrieval (k1=1.2, b=0.75) — real Robertson IDF
    // scoring where t09 is the integer-only surrogate: top-5 docs per
    // query from the Searches set, via graft.text.Bm25 — hash-agg
    // scoring, broadcast-sized dimensions, and the per-query rank as a
    // TopKAgg bounded heap instead of a row_number window (a hot query
    // term makes the candidate set corpus-sized; the heap ships <= k
    // rows per query per task — PlanSpec asserts no ranking window,
    // SkewProbe measures the hot-term corpus).
    "t23_bm25" -> Q(
      s"""WITH qt AS (SELECT * FROM (VALUES ${Searches.flatMap {
            case (q, ts) => ts.map(t => s"('$q','$t')")
          }.mkString(", ")}) AS v(query, term)),
         |dl AS (SELECT doc_id, len(string_split($norm, ' ')) AS dl
         |       FROM documents),
         |stats AS (SELECT count(*) AS n,
         |                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
         |          FROM dl),
         |w AS (SELECT doc_id, unnest(string_split($norm, ' ')) AS term
         |      FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM w
         |       WHERE term IN (SELECT DISTINCT term FROM qt)
         |       GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |sc AS (
         |  SELECT qt.query, tf.doc_id,
         |         CAST(round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
         |             * (tf.tf * 2.2)
         |             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)),
         |           6) AS DECIMAL(18,6)) AS contrib
         |  FROM tf
         |  JOIN qt ON tf.term = qt.term
         |  JOIN df ON tf.term = df.term
         |  JOIN dl ON tf.doc_id = dl.doc_id, stats),
         |agg AS (SELECT query, doc_id, sum(contrib) AS s
         |        FROM sc GROUP BY 1, 2),
         |r AS (SELECT query, doc_id, s,
         |             row_number() OVER (PARTITION BY query
         |                                ORDER BY s DESC, doc_id) AS rank
         |      FROM agg)
         |SELECT query, rank, doc_id, round(CAST(s AS DOUBLE), 4) AS bm25
         |FROM r WHERE rank <= 5
         |ORDER BY query, rank""".stripMargin) { (s, d) =>
      graft.text.Bm25.topDocs(Tables.documents(s, d), Searches, k = 5)
        .orderBy("query", "rank")
    },

    // n-gram LM perplexity scoring, the CCNet-style quality signal: a
    // bigram model with add-1 smoothing is trained ON the corpus (prefix
    // counts + bigram counts + vocab size — three hash aggs), then each
    // document is scored by its average negative log-probability
    // (cross-entropy, nats). Outlier-high CE marks gibberish; outlier-low
    // marks boilerplate. Per-bigram log terms are rounded to 6 dp and
    // summed as DECIMAL(18,6), so the doc score is order-independent and
    // identical cross-engine. Shape: one corpus scan into bigram
    // instances, two bounded count tables joined back by key — no
    // all-pairs anywhere, scan-bound at any corpus size.
    "t24_lm_perplexity" -> Q(
      s"""WITH ws AS (SELECT doc_id, string_split($norm, ' ') AS ws
         |            FROM documents),
         |b AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
         |             unnest(ws[2:len(ws)]) AS w2
         |      FROM ws WHERE len(ws) >= 2),
         |big AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
         |pre AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
         |v AS (SELECT count(DISTINCT w) AS v FROM (
         |        SELECT unnest(ws) AS w FROM ws)),
         |terms AS (
         |  SELECT b.doc_id,
         |         CAST(round(ln(CAST(big.c12 + 1 AS DOUBLE)
         |                       / (pre.c1 + v.v)), 6)
         |           AS DECIMAL(18,6)) AS lp
         |  FROM b JOIN big ON b.w1 = big.w1 AND b.w2 = big.w2
         |         JOIN pre ON b.w1 = pre.w1, v)
         |SELECT doc_id, count(*) AS n_bigrams,
         |       round(-CAST(sum(lp) AS DOUBLE) / count(*), 4) AS ce
         |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ws = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.words(col("text")).as("ws"))
      val b = ws.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val big = b.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val pre = b.groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = ws.select(explode(col("ws")).as("w"))
        .agg(countDistinct("w").as("v"))
      val terms = b
        .join(big, Seq("w1", "w2"))
        .join(pre, Seq("w1"))
        .crossJoin(broadcast(v))
        .withColumn("lp", round(
          log((col("c12") + lit(1)).cast("double") / (col("c1") + col("v"))),
          6).cast("decimal(18,6)"))
      terms.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(-sum("lp").cast("double") / count(lit(1)), 4).as("ce"))
        .orderBy("doc_id")
    },

    // Shannon word-distribution entropy per document — the
    // info-theoretic quality signal (a near-zero entropy doc is a
    // degenerate repeat; near-max is vocabulary-diverse) complementing
    // t02's ratio heuristics and t07's top-share metrics. Per-term
    // contributions -(p ln p) are rounded to 6 decimals and summed as
    // DECIMAL (t23/t24's order-independence pattern), so the per-doc
    // entropy is exact and engine-identical; the ln(k) normalizer
    // divides once, after the sum. The entropy output re-rounds at the
    // SAME scale 6 (a numeric no-op): rounding the 6-decimal sum to a
    // coarser scale can land exactly on a .5 boundary, where Spark
    // (decimal-string HALF_UP) and DuckDB (binary double) disagree.
    "t25_word_entropy" -> Q(
      s"""WITH w AS (SELECT doc_id, unnest(string_split($norm, ' ')) AS word
         |           FROM documents),
         |c AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
         |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS k
         |      FROM c GROUP BY 1),
         |terms AS (
         |  SELECT c.doc_id,
         |         CAST(round(-(c.c * 1.0 / n.n) * ln(c.c * 1.0 / n.n), 6)
         |           AS DECIMAL(18,6)) AS t
         |  FROM c JOIN n USING (doc_id))
         |SELECT t.doc_id, n.n AS n_words, n.k AS n_distinct,
         |       round(CAST(sum(t.t) AS DOUBLE), 6) AS entropy,
         |       round(CASE WHEN n.k > 1
         |               THEN CAST(sum(t.t) AS DOUBLE) / ln(n.k) ELSE 0 END,
         |         6) AS norm_entropy
         |FROM terms t JOIN n USING (doc_id)
         |GROUP BY t.doc_id, n.n, n.k
         |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      val w = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.words(col("text"))).as("word"))
      val c = w.groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      // totals via a doc-partitioned window, not a self-join: one scan
      // and one (doc_id, word) shuffle instead of computing the count
      // subtree twice (DataFrame plans don't share subtrees)
      val wd = Window.partitionBy("doc_id")
      val terms = c
        .withColumn("n", sum("c").over(wd))
        .withColumn("k", count(lit(1)).over(wd))
        .withColumn("t", round(
          -(col("c") / col("n")) * log(col("c") / col("n")),
          6).cast("decimal(18,6)"))
      terms.groupBy("doc_id", "n", "k")
        .agg(sum("t").as("ent"))
        .select(col("doc_id"), col("n").as("n_words"), col("k").as("n_distinct"),
          round(col("ent").cast("double"), 6).as("entropy"),
          round(when(col("k") > 1,
            col("ent").cast("double") / log(col("k").cast("double")))
            .otherwise(lit(0.0)), 6).as("norm_entropy"))
        .orderBy("doc_id")
    },

    // Leakage-safe train/val split: near-duplicate documents MUST land
    // in the same split, or the val set silently contains paraphrases
    // of training docs and every eval number is contaminated. The split
    // key is the near-dup cluster's canonical id (d07 labels) for
    // clustered docs and the doc's own id otherwise, run through the
    // same engine-portable hash gate as t05 — so the split stays
    // deterministic, stratification-composable, and whole-cluster.
    "t26_leakage_safe_split" -> Q(
      DedupQueries.clusterLabelCtes +
        """SELECT d.doc_id,
          |       coalesce(l.cluster_id, d.doc_id) AS split_key,
          |       CASE WHEN list_reduce(list_transform(
          |              string_split(md5(CAST(coalesce(l.cluster_id, d.doc_id)
          |                                    AS VARCHAR)), ''),
          |              c -> CAST(ascii(c) AS BIGINT)),
          |              (acc, x) -> (acc * 31 + x) % 1000000007) % 100 < 80
          |            THEN 'train' ELSE 'val' END AS split
          |FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
          |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val labels = graft.operators.ConnectedComponents.run(
          graft.text.Dedup.ngramJaccardPairs(docs, maxDF = 50, minJaccard = 0.8))
        .withColumnRenamed("node", "doc_id")
      docs.select("doc_id")
        .join(labels, Seq("doc_id"), "left")
        .withColumn("split_key", coalesce(col("label"), col("doc_id")))
        .select(col("doc_id"), col("split_key"),
          TextFns.splitAssign(col("split_key")).as("split"))
        .orderBy("doc_id")
    },

    // THE full training-corpus build, end to end in ONE oracled query —
    // the composition every stage above exists for, certifying that the
    // column contracts actually chain:
    //   gate (t11: exact-dup keeper + quality >= 0.5)
    //     -> near-dup keep (d07/d13: Jaccard pairs + connected
    //        components on the GATED survivors, canonical keeps)
    //     -> decontaminate (t12: kept docs vs the full-corpus held-out
    //        eval subset, drop >= 50% shingle overlap; eval docs never
    //        train)
    //     -> leakage-safe split (t26: whole-cluster hash gate, train)
    //     -> deterministic shuffle + fixed-size shards (t08/t27:
    //        RangeRank over md5(doc_id), shard = pos div 64)
    //     -> sequence packing in shuffle order within each shard (t06:
    //        2048-token contexts, window state bounded per shard).
    // Output is the shard manifest a data-loader resumes from. Scale
    // shape: each stage keeps its own verdict (rare-shingle blocking,
    // one bounded action per cc round, 8-byte shingle joins, range
    // exchange instead of SinglePartition, per-shard packing windows);
    // the composition adds joins on doc_id only.
    "t28_corpus_build" -> Q(
      s"""WITH RECURSIVE
         |nd AS (SELECT doc_id, $norm AS t FROM documents),
         |fp AS (SELECT doc_id, md5(t) AS fp FROM nd),
         |keepx AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
         |q AS (
         |  SELECT doc_id,
         |         round(least(n::DOUBLE / 50.0, 1.0) * 0.5 +
         |               (stop_n::DOUBLE / n::DOUBLE) * 0.3 +
         |               (1.0 - CASE WHEN chars = 0 THEN 0.0 ELSE punct_n::DOUBLE / chars::DOUBLE END) * 0.2, 4)
         |           AS quality
         |  FROM (
         |    SELECT doc_id,
         |           len(string_split(t, ' ')) AS n,
         |           len(list_filter(string_split(t, ' '),
         |               w -> w IN $stopList)) AS stop_n,
         |           len(regexp_extract_all(t, '[^a-z0-9 ]', 0)) AS punct_n,
         |           len(t) AS chars
         |    FROM nd)),
         |gated AS (SELECT q.doc_id FROM q JOIN keepx ON q.doc_id = keepx.doc_id
         |          WHERE q.quality >= 0.5),
         |w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM nd),
         |sh AS (
         |  SELECT doc_id, unnest(list_transform(list_distinct(
         |           list_transform(range(1, len(ws) - 1),
         |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])), s ->
         |           list_reduce(list_transform(string_split(s, ''),
         |               c -> CAST(ascii(c) AS BIGINT)),
         |             (acc, x) -> (acc * 31 + x) % 1073741789) * 1073741824 +
         |           list_reduce(list_transform(string_split(s, ''),
         |               c -> CAST(ascii(c) AS BIGINT)),
         |             (acc, x) -> (acc * 131 + x) % 1073741783))) AS sh
         |  FROM w WHERE len(ws) >= 3),
         |gsh AS (SELECT sh.doc_id, sh.sh FROM sh JOIN gated USING (doc_id)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM gsh GROUP BY 1),
         |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM gsh GROUP BY 1)
         |         WHERE df <= 50),
         |blocked AS (SELECT doc_id, g.sh FROM gsh g JOIN rare USING (sh)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM blocked a JOIN blocked b ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |inter AS (
         |  SELECT c.a, c.b, count(*) AS i
         |  FROM cand c JOIN gsh x ON x.doc_id = c.a
         |  JOIN gsh y ON y.doc_id = c.b AND y.sh = x.sh
         |  GROUP BY 1, 2),
         |prs AS (
         |  SELECT a, b
         |  FROM inter JOIN sizes x ON a = x.doc_id JOIN sizes y ON b = y.doc_id
         |  WHERE round(i * 1.0 / (x.n_sh + y.n_sh - i), 4) >= 0.8),
         |und AS (SELECT a AS src, b AS dst FROM prs
         |        UNION SELECT b, a FROM prs),
         |cc AS (
         |  SELECT src AS node, src AS label FROM und
         |  UNION
         |  SELECT u.dst, cc.label FROM cc JOIN und u ON cc.node = u.src),
         |labels AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY 1),
         |kept AS (SELECT g.doc_id FROM gated g LEFT JOIN labels l
         |           ON g.doc_id = l.node
         |         WHERE l.node IS NULL OR g.doc_id = l.cluster_id),
         |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
         |trn AS (SELECT g.doc_id, g.sh FROM gsh g JOIN kept USING (doc_id)
         |        WHERE g.doc_id % 97 <> 0),
         |tsz AS (SELECT doc_id, count(*) AS n_sh FROM trn GROUP BY 1),
         |shared AS (SELECT doc_id, count(*) AS n_shared
         |           FROM trn JOIN ev USING (sh) GROUP BY 1),
         |contam AS (SELECT t.doc_id FROM tsz t JOIN shared h USING (doc_id)
         |           WHERE h.n_shared * 1.0 / t.n_sh >= 0.5),
         |clean AS (SELECT doc_id FROM kept
         |          WHERE doc_id % 97 <> 0
         |            AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |tr2 AS (
         |  SELECT c.doc_id FROM (
         |    SELECT cl.doc_id, coalesce(l.cluster_id, cl.doc_id) AS split_key
         |    FROM clean cl LEFT JOIN labels l ON cl.doc_id = l.node) c
         |  WHERE list_reduce(list_transform(
         |          string_split(md5(CAST(c.split_key AS VARCHAR)), ''),
         |          ch -> CAST(ascii(ch) AS BIGINT)),
         |          (acc, x) -> (acc * 31 + x) % 1000000007) % 100 < 80),
         |r AS (
         |  SELECT t2.doc_id,
         |         row_number() OVER (ORDER BY md5(CAST(t2.doc_id AS VARCHAR)),
         |                            t2.doc_id) AS pos,
         |         len(regexp_extract_all(nd.t, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))
         |           AS n_tok
         |  FROM tr2 t2 JOIN nd ON t2.doc_id = nd.doc_id),
         |p AS (
         |  SELECT pos, n_tok,
         |         CAST(floor((pos - 1) / 64.0) AS BIGINT) AS shard,
         |         coalesce(CAST(sum(n_tok) OVER (
         |           PARTITION BY CAST(floor((pos - 1) / 64.0) AS BIGINT)
         |           ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           AS BIGINT), 0) AS cum_before
         |  FROM r)
         |SELECT shard, count(*) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |       CAST(max(floor(cum_before / 2048.0)) + 1 AS BIGINT) AS n_packs,
         |       CAST(min(pos) AS BIGINT) AS pos_lo,
         |       CAST(max(pos) AS BIGINT) AS pos_hi
         |FROM p GROUP BY shard ORDER BY shard""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      // 1. gate: exact-dup keeper + quality threshold (t11)
      val keepers = docs
        .select(col("doc_id"), TextFns.fingerprintMd5(col("text")).as("fp"))
        .groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
      val gated = docs.join(keepers, Seq("doc_id"), "left_semi")
        .filter(TextFns.qualityScore(col("text")) >= 0.5)
      // 2. near-dup clusters on the gated survivors (d07/d13)
      val labels = graft.operators.ConnectedComponents.run(
          graft.text.Dedup.ngramJaccardPairs(gated, maxDF = 50,
            minJaccard = 0.8))
        .withColumnRenamed("node", "doc_id")
      val kept = gated.join(labels, Seq("doc_id"), "left")
        .filter(col("label").isNull || col("doc_id") === col("label"))
      // 3. decontaminate (t12): kept docs vs the FULL corpus's held-out
      // subset — eval membership is corpus-wide, not gate-dependent
      val isEval = col("doc_id") % 97 === 0
      val contam = graft.text.Decontaminate.overlapStats(
          docs.filter(isEval).select("doc_id", "text")
            .unionByName(kept.filter(!isEval).select("doc_id", "text")),
          col("doc_id") % 97 === 0)
        .filter(col("n_shared") * 1.0 / col("n_sh") >= 0.5)
        .select(col("id").as("doc_id"))
      val clean = kept.filter(!isEval)
        .join(contam, Seq("doc_id"), "left_anti")
      // 4. leakage-safe split key -> train half (t26/t05)
      val train = clean
        .withColumn("split_key", coalesce(col("label"), col("doc_id")))
        .filter(TextFns.splitAssign(col("split_key")) === "train")
      // 5+6. deterministic shuffle + fixed-size shards + packing —
      // the shared manifest tail (graft.CurationPipeline reuses it)
      shardManifest(train.select(col("doc_id"),
        TextFns.bpeTokenCount(col("text")).as("n_tok")))
    },

    // temperature-based mixture sampling (the multilingual-LM data-mix
    // standard, e.g. mC4/XLM-R's alpha-smoothing): per-source sampling
    // shares follow tok_s^alpha (alpha = 0.5 via sqrt — exactly
    // rounded IEEE, so both engines derive identical doubles)
    // renormalized over sources, a 5000-token target budget converts
    // shares to per-source keep RATES (head sources downsample, tail
    // sources keep everything), and per-doc inclusion is the
    // deterministic ppm hash gate — zero RNG, reproducible at any
    // partitioning. The cross-source normalizer sums DECIMAL(30,15)
    // (order-independent), never raw doubles. Scale shape: two
    // source-level aggregates (|sources| rows) broadcast back over one
    // corpus scan.
    "t29_temperature_mix" -> Q(
      s"""WITH t AS (
         |  SELECT doc_id, source, len(string_split($norm, ' ')) AS n_tok
         |  FROM documents),
         |s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tok_s
         |      FROM t GROUP BY 1),
         |z AS (SELECT CAST(sum(CAST(sqrt(CAST(tok_s AS DOUBLE))
         |                        AS DECIMAL(30,15))) AS DOUBLE) AS z
         |      FROM s),
         |r AS (
         |  SELECT source, tok_s,
         |         CAST(floor(least(1.0,
         |             (5000.0 * (sqrt(CAST(tok_s AS DOUBLE)) / z)) / tok_s)
         |           * 1000000.0) AS BIGINT) AS rate_ppm
         |  FROM s, z)
         |SELECT t.doc_id, t.source, CAST(t.n_tok AS BIGINT) AS n_tok,
         |       r.rate_ppm
         |FROM t JOIN r USING (source)
         |WHERE list_reduce(list_transform(
         |        string_split(md5(CAST(t.doc_id AS VARCHAR) || ':' || t.source), ''),
         |        c -> CAST(ascii(c) AS BIGINT)),
         |        (acc, x) -> (acc * 31 + x) % 1000000007) % 1000000
         |      < r.rate_ppm
         |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val t = Tables.documents(s, d).select(col("doc_id"), col("source"),
        TextFns.tokenCount(col("text")).as("n_tok"))
      val bySrc = t.groupBy("source").agg(sum("n_tok").as("tok_s"))
      val zRow = bySrc
        .agg(sum(sqrt(col("tok_s").cast("double"))
          .cast(DecimalType(30, 15))).as("zd"))
        .select(col("zd").cast("double").as("z"))
      val rates = bySrc.crossJoin(broadcast(zRow))
        .withColumn("share", sqrt(col("tok_s").cast("double")) / col("z"))
        .withColumn("rate_ppm",
          floor(least(lit(1.0), (lit(5000.0) * col("share")) / col("tok_s"))
            * lit(1000000.0)).cast("long"))
        .select("source", "rate_ppm")
      t.join(broadcast(rates), "source")
        .where(TextFns.keepPpm(col("doc_id"), col("source"), col("rate_ppm")))
        .select("doc_id", "source", "n_tok", "rate_ppm")
        .orderBy("doc_id")
    }
  )
}
