package graft.queries

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

  private val stopList =
    TextFns.Stopwords.map(w => s"'$w'").mkString("(", ",", ")")

  /** Profiles for t03: argmax over marker-vocab hit counts. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "storage" -> Seq("table", "scan", "merge", "part", "batch", "row"),
    "query" -> Seq("join", "filter", "group", "sort", "window", "order"),
    "stream" -> Seq("stream", "fast", "slow", "value", "key", "data"))

  val all: Map[String, Q] = Map(

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
         |             (1.0 - punct_n::DOUBLE / chars::DOUBLE) * 0.2, 4) AS quality
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
    }
  )
}
