package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.{Dedup, TextFns}

/** Dedup suite over documents + embeddings, each driver-checked against
  * a DuckDB oracle that rebuilds the same signatures bit-for-bit
  * (md5-hex minima, polynomial word hashes, double-fold cosines).
  */
object DedupQueries {

  private val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Shared oracle CTEs: normalized words + distinct 3-gram shingles.
    * Package-private: st11's streaming ingest-dedup oracle replays the
    * identical signature pipeline. */
  private[queries] val shingleCtes =
    s"""WITH w AS (
       |  SELECT doc_id, string_split($norm, ' ') AS ws FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |           list_transform(range(1, len(ws) - 1),
       |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sh
       |  FROM w WHERE len(ws) >= 3),
       |""".stripMargin

  /** Oracle CTE chain ending in `labels(node, cluster_id)` — the d07
    * near-dup clustering as a recursive CTE. Package-private so
    * cluster-consuming oracles (d13 keep, t26 leakage-safe split)
    * replay the identical clustering. */
  private[queries] lazy val clusterLabelCtes =
    hashedShingleCtes.replaceFirst("WITH w AS", "WITH RECURSIVE w AS") +
      """sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
        |         WHERE df <= 50),
        |blocked AS (SELECT doc_id, s.sh FROM sh s JOIN rare USING (sh)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM blocked a JOIN blocked b ON a.sh = b.sh AND a.doc_id < b.doc_id),
        |inter AS (
        |  SELECT c.a, c.b, count(*) AS i
        |  FROM cand c JOIN sh x ON x.doc_id = c.a
        |  JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a, b
        |  FROM inter JOIN sizes x ON a = x.doc_id JOIN sizes y ON b = y.doc_id
        |  WHERE round(i * 1.0 / (x.n_sh + y.n_sh - i), 4) >= 0.8),
        |und AS (SELECT a AS src, b AS dst FROM pairs
        |        UNION SELECT b, a FROM pairs),
        |cc AS (
        |  SELECT src AS node, src AS label FROM und
        |  UNION
        |  SELECT u.dst, cc.label FROM cc JOIN und u ON cc.node = u.src),
        |labels AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY 1)
        |""".stripMargin

  /** d02 variant of [[shingleCtes]]: shingles carried as the same
    * 60-bit polynomial hash graft.functions.PolyHash64 computes, so the
    * oracle sees the identical key set (collisions included) that the
    * Spark plan shuffles. */
  private[queries] val hashedShingleCtes =
    s"""WITH w AS (
       |  SELECT doc_id, string_split($norm, ' ') AS ws FROM documents),
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
       |""".stripMargin

  val all: Map[String, Q] = Map(

    // exact dedup: corpus-level duplicate accounting on the normalized
    // fingerprint (group detail is exercised in DedupSpec on a corpus
    // with planted exact dups).
    "d01_exact_dedup" -> Q(
      s"""SELECT count(*) AS n_docs,
         |       count(DISTINCT md5($norm)) AS n_distinct,
         |       count(*) - count(DISTINCT md5($norm)) AS n_dup_docs
         |FROM documents""".stripMargin) { (s, d) =>
      val fp = TextFns.fingerprintMd5(col("text"))
      Tables.documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(fp).as("n_distinct"),
        (count(lit(1)) - countDistinct(fp)).as("n_dup_docs"))
    },

    // n-gram Jaccard near-dup: rare-shingle blocking + exact Jaccard,
    // shingle keys hashed to longs on both sides.
    "d02_ngram_jaccard" -> Q(
      hashedShingleCtes +
        """sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
          |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
          |         WHERE df <= 50),
          |blocked AS (SELECT doc_id, s.sh FROM sh s JOIN rare USING (sh)),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          |  FROM blocked a JOIN blocked b ON a.sh = b.sh AND a.doc_id < b.doc_id),
          |inter AS (
          |  SELECT c.a, c.b, count(*) AS i
          |  FROM cand c JOIN sh x ON x.doc_id = c.a
          |  JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
          |  GROUP BY 1, 2)
          |SELECT a, b, round(i * 1.0 / (x.n_sh + y.n_sh - i), 4) AS jaccard
          |FROM inter JOIN sizes x ON a = x.doc_id JOIN sizes y ON b = y.doc_id
          |WHERE round(i * 1.0 / (x.n_sh + y.n_sh - i), 4) >= 0.8
          |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d),
          maxDF = 50, minJaccard = 0.8)
        .orderBy("a", "b")
    },

    // asymmetric containment |A∩B|/|A| over the same rare-shingle
    // blocking as d02 — the near-SUBSET detector (small doc quoted in a
    // large one) that symmetric Jaccard misses once sizes diverge. Both
    // directions emitted; gate on the larger.
    "d09_containment" -> Q(
      hashedShingleCtes +
        """sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
          |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
          |         WHERE df <= 50),
          |blocked AS (SELECT doc_id, s.sh FROM sh s JOIN rare USING (sh)),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          |  FROM blocked a JOIN blocked b ON a.sh = b.sh AND a.doc_id < b.doc_id),
          |inter AS (
          |  SELECT c.a, c.b, count(*) AS i
          |  FROM cand c JOIN sh x ON x.doc_id = c.a
          |  JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
          |  GROUP BY 1, 2)
          |SELECT a, b, round(i * 1.0 / x.n_sh, 4) AS cont_a,
          |       round(i * 1.0 / y.n_sh, 4) AS cont_b
          |FROM inter JOIN sizes x ON a = x.doc_id JOIN sizes y ON b = y.doc_id
          |WHERE greatest(round(i * 1.0 / x.n_sh, 4),
          |               round(i * 1.0 / y.n_sh, 4)) >= 0.8
          |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d),
          maxDF = 50, minContainment = 0.8)
        .orderBy("a", "b")
    },

    // MinHash(12) + LSH(4 bands x 3): candidates sharing any band
    // bucket, estimated Jaccard = signature agreement rate.
    "d03_minhash_lsh" -> Q(
      shingleCtes +
        """sigs AS (
          |  SELECT doc_id,
          |         list_transform(range(0, 12), s ->
          |           list_min(list_transform(shs, x ->
          |             md5(CAST(s AS VARCHAR) || '|' || x)))) AS sig
          |  FROM (SELECT doc_id, list(sh) AS shs FROM sh GROUP BY 1)),
          |buckets AS (
          |  SELECT doc_id, unnest(list_transform(range(0, 4), b ->
          |           md5(CAST(b AS VARCHAR) || '|' || sig[b*3+1] || '|' ||
          |               sig[b*3+2] || '|' || sig[b*3+3]))) AS bucket
          |  FROM sigs),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          |  FROM buckets a JOIN buckets b
          |    ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
          |SELECT a, b,
          |       round(len(list_filter(range(1, 13),
          |             i -> sa.sig[i] = sb.sig[i])) / 12.0, 4) AS est_jaccard
          |FROM cand JOIN sigs sa ON a = sa.doc_id JOIN sigs sb ON b = sb.doc_id
          |WHERE len(list_filter(range(1, 13), i -> sa.sig[i] = sb.sig[i])) / 12.0 >= 0.5
          |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d),
          k = 12, bands = 4, minEst = 0.5)
        .orderBy("a", "b")
    },

    // MinHash calibration: for every d03 candidate pair, the TRUE
    // Jaccard over the full shingle sets next to the 12-hash estimate,
    // plus the absolute estimator error — the QC table a dedup pipeline
    // publishes to justify its signature length before committing to a
    // threshold. The exact pass touches only the LSH candidates (the
    // verify stage of a production near-dup job), never all pairs, so
    // cost is O(candidates x shingles-per-doc) at any corpus size.
    "d10_minhash_calibration" -> Q(
      shingleCtes +
        """sigs AS (
          |  SELECT doc_id,
          |         list_transform(range(0, 12), s ->
          |           list_min(list_transform(shs, x ->
          |             md5(CAST(s AS VARCHAR) || '|' || x)))) AS sig
          |  FROM (SELECT doc_id, list(sh) AS shs FROM sh GROUP BY 1)),
          |buckets AS (
          |  SELECT doc_id, unnest(list_transform(range(0, 4), b ->
          |           md5(CAST(b AS VARCHAR) || '|' || sig[b*3+1] || '|' ||
          |               sig[b*3+2] || '|' || sig[b*3+3]))) AS bucket
          |  FROM sigs),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          |  FROM buckets a JOIN buckets b
          |    ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
          |pairs AS (
          |  SELECT a, b,
          |         round(len(list_filter(range(1, 13),
          |               i -> sa.sig[i] = sb.sig[i])) / 12.0, 4) AS est
          |  FROM cand JOIN sigs sa ON a = sa.doc_id JOIN sigs sb ON b = sb.doc_id
          |  WHERE len(list_filter(range(1, 13), i -> sa.sig[i] = sb.sig[i])) / 12.0 >= 0.5),
          |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
          |inter AS (
          |  SELECT p.a, p.b, count(*) AS i
          |  FROM pairs p JOIN sh x ON x.doc_id = p.a
          |  JOIN sh y ON y.doc_id = p.b AND y.sh = x.sh
          |  GROUP BY 1, 2)
          |SELECT p.a, p.b, p.est AS est_jaccard,
          |       round(COALESCE(i, 0) * 1.0 / (sx.n_sh + sy.n_sh - COALESCE(i, 0)), 4)
          |         AS jaccard,
          |       round(abs(p.est - COALESCE(i, 0) * 1.0
          |                   / (sx.n_sh + sy.n_sh - COALESCE(i, 0))), 6) AS abs_err
          |FROM pairs p
          |LEFT JOIN inter ON p.a = inter.a AND p.b = inter.b
          |JOIN sizes sx ON p.a = sx.doc_id JOIN sizes sy ON p.b = sy.doc_id
          |ORDER BY p.a, p.b""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, k = 12, bands = 4, minEst = 0.5)
        .withColumnRenamed("est_jaccard", "est")
      val sh = Dedup.shingles(docs, "doc_id", "text")
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
      val inter = pairs.select("a", "b")
        .join(sh.select(col("id").as("a"), col("sh")), "a")
        .join(sh.select(col("id").as("b"), col("sh")), Seq("b", "sh"))
        .groupBy("a", "b").agg(count(lit(1)).as("i"))
      val jac = coalesce(col("i"), lit(0L)) /
        (col("na") + col("nb") - coalesce(col("i"), lit(0L)))
      pairs
        .join(inter, Seq("a", "b"), "left")
        .join(sizes.select(col("id").as("a"), col("n_sh").as("na")), "a")
        .join(sizes.select(col("id").as("b"), col("n_sh").as("nb")), "b")
        .select(col("a"), col("b"), col("est").as("est_jaccard"),
          round(jac, 4).as("jaccard"),
          round(abs(col("est") - jac), 6).as("abs_err"))
        .orderBy("a", "b")
    },

    // d03's ingest-time shape: docs with doc_id % 10 = 7 arrive as a
    // NEW batch and are deduped against the stored signature index of
    // everything else — index text never re-shingled, no index-index
    // pairs, delta buckets broadcast. Signatures are per-doc functions
    // of text alone, so the result must equal the full-corpus run
    // restricted to delta-touching pairs — which is what the oracle
    // computes (it never splits the corpus).
    "d08_incremental_lsh" -> Q(
      shingleCtes +
        """sigs AS (
          |  SELECT doc_id,
          |         list_transform(range(0, 12), s ->
          |           list_min(list_transform(shs, x ->
          |             md5(CAST(s AS VARCHAR) || '|' || x)))) AS sig
          |  FROM (SELECT doc_id, list(sh) AS shs FROM sh GROUP BY 1)),
          |buckets AS (
          |  SELECT doc_id, unnest(list_transform(range(0, 4), b ->
          |           md5(CAST(b AS VARCHAR) || '|' || sig[b*3+1] || '|' ||
          |               sig[b*3+2] || '|' || sig[b*3+3]))) AS bucket
          |  FROM sigs),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          |  FROM buckets a JOIN buckets b
          |    ON a.bucket = b.bucket AND a.doc_id < b.doc_id
          |  WHERE a.doc_id % 10 = 7 OR b.doc_id % 10 = 7)
          |SELECT a, b,
          |       round(len(list_filter(range(1, 13),
          |             i -> sa.sig[i] = sb.sig[i])) / 12.0, 4) AS est_jaccard
          |FROM cand JOIN sigs sa ON a = sa.doc_id JOIN sigs sb ON b = sb.doc_id
          |WHERE len(list_filter(range(1, 13), i -> sa.sig[i] = sb.sig[i])) / 12.0 >= 0.5
          |ORDER BY a, b""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val index = Dedup.minhashSignatures(
        docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", 12, 3)
      Dedup.incrementalLshPairs(index,
          docs.filter(col("doc_id") % 10 === 7),
          k = 12, bands = 4, minEst = 0.5)
        .orderBy("a", "b")
    },

    // 64-bit SimHash near-dup (two 32-bit halves from independent
    // polynomial word hashes): 16-bit-band blocking, Hamming <= 6.
    "d04_simhash" -> Q(
      s"""WITH hsx AS (
         |  SELECT doc_id,
         |         list_transform(string_split($norm, ' '), w ->
         |           list_reduce(list_transform(string_split(w, ''),
         |               c -> CAST(ascii(c) AS BIGINT)),
         |             (acc, x) -> (acc * 31 + x) % 4294967291)) AS h1s,
         |         list_transform(string_split($norm, ' '), w ->
         |           list_reduce(list_transform(string_split(w, ''),
         |               c -> CAST(ascii(c) AS BIGINT)),
         |             (acc, x) -> (acc * 131 + x) % 4294967279)) AS h2s
         |  FROM documents),
         |sims AS (
         |  SELECT doc_id,
         |         list_sum(list_transform(range(0, 32), j ->
         |           CASE WHEN list_sum(list_transform(h1s,
         |                  h -> ((h >> j) & 1) * 2 - 1)) > 0
         |                THEN (1::BIGINT << j) ELSE 0 END)) AS sim_lo,
         |         list_sum(list_transform(range(0, 32), j ->
         |           CASE WHEN list_sum(list_transform(h2s,
         |                  h -> ((h >> j) & 1) * 2 - 1)) > 0
         |                THEN (1::BIGINT << j) ELSE 0 END)) AS sim_hi
         |  FROM hsx),
         |bands AS (
         |  SELECT doc_id, sim_lo, sim_hi, unnest([
         |           '0|' || CAST(sim_lo & 65535 AS VARCHAR),
         |           '1|' || CAST((sim_lo >> 16) & 65535 AS VARCHAR),
         |           '2|' || CAST(sim_hi & 65535 AS VARCHAR),
         |           '3|' || CAST((sim_hi >> 16) & 65535 AS VARCHAR)]) AS band
         |  FROM sims),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
         |         a.sim_lo AS loa, a.sim_hi AS hia,
         |         b.sim_lo AS lob, b.sim_hi AS hib
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.doc_id < b.doc_id)
         |SELECT a, b,
         |       CAST(bit_count(xor(loa, lob)) + bit_count(xor(hia, hib))
         |            AS BIGINT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(loa, lob)) + bit_count(xor(hia, hib)) <= 6
         |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), maxHamming = 6)
        .orderBy("a", "b")
    },

    // embedding-cosine near-dup, ALL-PAIRS — LABELED CONTRAST
    // BASELINE, do not ship at scale: the O(n²) cross join exists to
    // price the anti-pattern next to the LSH-blocked d06/d11 (the
    // scale probe excludes it above 10x for exactly that reason).
    // Vectors unit-normalized once, pair cosine a single dot fold —
    // both engines compute the identical sequential sum, so results
    // match bit-for-bit.
    "d05_cosine_neardup" -> Q(
      """WITH n AS (
        |  SELECT vec_id,
        |         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
        |  FROM (SELECT vec_id,
        |               list_transform(embedding, x -> x::DOUBLE) AS v
        |        FROM embeddings))
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |       round(list_dot_product(a.vn, b.vn), 6) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.vn, b.vn), 6) >= 0.4
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.cosineNearDupPairs(Tables.embeddings(s, d), minCos = 0.4)
        .orderBy("a", "b")
    },

    // LSH-blocked variant at a PINNED toy configuration — LABELED
    // CONTRAST BASELINE, do not ship at scale: candidates only from
    // shared hyperplane buckets (8 tables x a FIXED 3 bits, the
    // construction s12_ann_lsh_fixed3 also pins), exact cosine within
    // the candidate set. Per-table occupancy grows linearly with the
    // corpus at fixed planes (BASELINE.md §4 measured the blowup);
    // d11_cosine_lsh_sized is the production-sized registration.
    "d06_cosine_neardup_lsh" -> Q(
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id,
        |         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
        |  FROM e),
        |b AS (
        |  SELECT vec_id,
        |         unnest(list_transform(range(0, 8), t ->
        |           t * 8 + list_sum(list_transform(range(0, 3), j ->
        |             CASE WHEN list_dot_product(v, list_transform(range(0, 64),
        |                    i -> (((t*3+j)*7919 + i*104729 + 12345) % 2001 - 1000) / 1000.0)) > 0
        |                  THEN (1::BIGINT << j) ELSE 0 END)))) AS bucket
        |  FROM e),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
        |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
        |SELECT a, b, round(list_dot_product(p.vn, q.vn), 6) AS cos
        |FROM cand JOIN n p ON a = p.vec_id JOIN n q ON b = q.vec_id
        |WHERE round(list_dot_product(p.vn, q.vn), 6) >= 0.4
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      Dedup.cosineNearDupPairsLsh(Tables.embeddings(s, d), minCos = 0.4,
          planesPerTable = Some(3),
          maxBucketSize = Some(graft.functions.Buckets.DefaultMaxBucketSize))
        .orderBy("a", "b")
    },

    // near-dup pairs -> duplicate CLUSTERS via min-label connected
    // components (graft.operators.ConnectedComponents): the step that
    // lets a pipeline keep ONE canonical doc per cluster. Edges are the
    // d02 Jaccard pairs; cluster_id = min doc_id of the component. The
    // oracle replays the propagation as a recursive CTE.
    "d07_dedup_clusters" -> Q(
      hashedShingleCtes.replaceFirst("WITH w AS", "WITH RECURSIVE w AS") +
        """sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
          |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
          |         WHERE df <= 50),
          |blocked AS (SELECT doc_id, s.sh FROM sh s JOIN rare USING (sh)),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          |  FROM blocked a JOIN blocked b ON a.sh = b.sh AND a.doc_id < b.doc_id),
          |inter AS (
          |  SELECT c.a, c.b, count(*) AS i
          |  FROM cand c JOIN sh x ON x.doc_id = c.a
          |  JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
          |  GROUP BY 1, 2),
          |pairs AS (
          |  SELECT a, b
          |  FROM inter JOIN sizes x ON a = x.doc_id JOIN sizes y ON b = y.doc_id
          |  WHERE round(i * 1.0 / (x.n_sh + y.n_sh - i), 4) >= 0.8),
          |und AS (SELECT a AS src, b AS dst FROM pairs
          |        UNION SELECT b, a FROM pairs),
          |cc AS (
          |  SELECT src AS node, src AS label FROM und
          |  UNION
          |  SELECT u.dst, cc.label FROM cc JOIN und u ON cc.node = u.src),
          |labels AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY 1),
          |csize AS (SELECT cluster_id, count(*) AS cluster_size
          |          FROM labels GROUP BY 1)
          |SELECT node AS doc_id, cluster_id, cluster_size
          |FROM labels JOIN csize USING (cluster_id)
          |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, d),
        maxDF = 50, minJaccard = 0.8)
      val labels = graft.operators.ConnectedComponents.run(pairs)
      val csize = labels.groupBy("label")
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(csize, "label")
        .select(col("node").as("doc_id"), col("label").as("cluster_id"),
          col("cluster_size"))
        .orderBy("doc_id")
    },

    // The APPLY step that d07's clusters exist for: the kept corpus.
    // Every unclustered doc survives as 'unique'; each near-dup cluster
    // keeps exactly its canonical member (min doc_id = the cluster
    // label, the deterministic keeper a reproducible pipeline needs).
    // One left join of the label table against the corpus; the label
    // side is bounded by CLUSTERED docs only, so AQE broadcast-picks it
    // on mostly-unique corpora and shuffles it on dup-heavy ones — no
    // hint, since either regime is legitimate at scale.
    "d13_dedup_keep" -> Q(
      clusterLabelCtes +
        """SELECT d.doc_id,
          |       CASE WHEN l.node IS NULL THEN 'unique'
          |            ELSE 'canonical' END AS reason
          |FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
          |WHERE l.node IS NULL OR d.doc_id = l.cluster_id
          |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = Dedup.ngramJaccardPairs(docs, maxDF = 50, minJaccard = 0.8)
      val labels = graft.operators.ConnectedComponents.run(pairs)
        .withColumnRenamed("node", "doc_id")
      docs.select("doc_id")
        .join(labels, Seq("doc_id"), "left")
        .filter(col("label").isNull || col("doc_id") === col("label"))
        .select(col("doc_id"),
          when(col("label").isNull, lit("unique"))
            .otherwise(lit("canonical")).as("reason"))
        .orderBy("doc_id")
    },

    // benchmark decontamination: every training doc scored by how many
    // of its distinct 3-gram shingles appear anywhere in the held-out
    // eval subset (doc_id % 97 == 0 stands in for the benchmark set);
    // contaminated = more than half its shingles are covered. One
    // map-side shingle pass + one 8-byte-key join, no arrays travel.
    "t12_decontaminate" -> Q(
      hashedShingleCtes +
        """ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
          |tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
          |sizes AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY 1),
          |shared AS (SELECT doc_id, count(*) AS n_shared
          |           FROM tr JOIN ev USING (sh) GROUP BY 1)
          |SELECT s.doc_id, s.n_sh, coalesce(h.n_shared, 0) AS n_shared,
          |       CAST(coalesce(h.n_shared, 0) * 1.0 / s.n_sh >= 0.5 AS BIGINT)
          |         AS contaminated
          |FROM sizes s LEFT JOIN shared h USING (doc_id)
          |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.text.Decontaminate.overlapStats(Tables.documents(s, d),
          col("doc_id") % 97 === 0)
        .select(col("id").as("doc_id"), col("n_sh"), col("n_shared"),
          (col("n_shared") * 1.0 / col("n_sh") >= 0.5).cast("bigint")
            .as("contaminated"))
        .orderBy("doc_id")
    },

    // t12's broadcast-Bloom scale path: the eval set collapses to a
    // 65536-bit filter and the training scan is one map-side agg — no
    // shingle join at all. The oracle rebuilds the SAME filter from
    // bit-position arithmetic (double hashing off the two PolyHash64
    // folds, exact sub-2^33 integers), so Bloom false positives are
    // deterministic and cross-engine: n_bloom must hash-match exactly,
    // not just approximately.
    "t19_bloom_decontam" -> Q(
      hashedShingleCtes +
        """ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
          |bits AS (
          |  SELECT DISTINCT unnest(list_transform(range(0, 3), j ->
          |    ((sh // 1073741824) + j * (1 + sh % 1073741824)) % 65536))
          |    AS pos
          |  FROM ev),
          |tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
          |probes AS (
          |  SELECT doc_id, sh, unnest(list_transform(range(0, 3), j ->
          |    ((sh // 1073741824) + j * (1 + sh % 1073741824)) % 65536))
          |    AS pos
          |  FROM tr),
          |hits AS (SELECT doc_id, sh, count(*) AS nhit
          |         FROM probes JOIN bits USING (pos) GROUP BY 1, 2),
          |bl AS (SELECT doc_id, count(*) AS n_bloom
          |       FROM hits WHERE nhit = 3 GROUP BY 1),
          |sizes AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY 1)
          |SELECT s.doc_id, s.n_sh, coalesce(b.n_bloom, 0) AS n_bloom,
          |       CAST(coalesce(b.n_bloom, 0) * 1.0 / s.n_sh >= 0.5
          |            AS BIGINT) AS contaminated
          |FROM sizes s LEFT JOIN bl b USING (doc_id)
          |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.text.Decontaminate.bloomOverlapStats(Tables.documents(s, d),
          col("doc_id") % 97 === 0, mBits = 1 << 16)
        .select(col("id").as("doc_id"), col("n_sh"), col("n_bloom"),
          (col("n_bloom") * 1.0 / col("n_sh") >= 0.5).cast("bigint")
            .as("contaminated"))
        .orderBy("doc_id")
    },

    // contamination ATTRIBUTION — t12 answers "is this train doc
    // contaminated"; this answers "by WHICH eval doc": per training doc
    // with any eval overlap, the top contributing eval doc (argmax
    // aggregate, no window), its coverage count, the number of distinct
    // eval docs hit, and the total distinct shared shingles. The hit
    // table is bounded by real overlap, orders smaller than the corpus.
    "t30_contamination_attribution" -> Q(
      hashedShingleCtes +
        """ev AS (SELECT doc_id AS eval_id, sh FROM sh WHERE doc_id % 97 = 0),
          |tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
          |hits AS (SELECT t.doc_id, e.eval_id, t.sh
          |         FROM tr t JOIN ev e USING (sh)),
          |contrib AS (SELECT doc_id, eval_id, count(*) AS n_with
          |            FROM hits GROUP BY 1, 2),
          |tot AS (SELECT doc_id, count(DISTINCT eval_id) AS n_evals,
          |               count(DISTINCT sh) AS n_shared
          |        FROM hits GROUP BY 1),
          |best AS (SELECT doc_id, eval_id, n_with,
          |                row_number() OVER (PARTITION BY doc_id
          |                  ORDER BY n_with DESC, eval_id) AS rk
          |         FROM contrib)
          |SELECT b.doc_id, b.eval_id AS top_eval_id,
          |       b.n_with AS n_top_shared, t.n_evals, t.n_shared
          |FROM best b JOIN tot t USING (doc_id)
          |WHERE b.rk = 1
          |ORDER BY b.doc_id""".stripMargin) { (s, d) =>
      graft.text.Decontaminate.attribution(Tables.documents(s, d),
          col("doc_id") % 97 === 0)
        .orderBy("doc_id")
    },

    // frequency-weighted SOFT dedup — hard dedup (d13) keeps exactly
    // one copy per duplicate group, erasing natural-abundance signal;
    // the soft policy keeps the canonical plus a deterministic ~sqrt(k)
    // sample of a k-duplicated group, so duplication survives at damped
    // weight. The keep decision is the ppm hash gate (zero RNG,
    // engine-replayable), NOT a per-group rank window: a 10^9-copy
    // mega-group costs no straggler partition, only a per-fingerprint
    // rate row in a broadcastable table. Rate arithmetic is ordered
    // identically on both engines (1e6 * sqrt(k), then / k, then
    // floor) so the doubles agree bit-for-bit.
    "d14_soft_dedup" -> Q(
      s"""WITH f AS (SELECT doc_id, md5($norm) AS fp FROM documents),
         |g AS (SELECT fp, count(*) AS dup_count, min(doc_id) AS canonical
         |      FROM f GROUP BY 1),
         |r AS (SELECT fp, dup_count, canonical,
         |             CAST(floor(1000000.0 * sqrt(CAST(dup_count AS DOUBLE))
         |                        / dup_count) AS BIGINT) AS rate_ppm
         |      FROM g)
         |SELECT f.doc_id, r.dup_count,
         |       CAST(f.doc_id = r.canonical OR
         |            list_reduce(list_transform(
         |              string_split(md5(CAST(f.doc_id AS VARCHAR)
         |                               || ':' || f.fp), ''),
         |              c -> CAST(ascii(c) AS BIGINT)),
         |              (acc, x) -> (acc * 31 + x) % 1000000007) % 1000000
         |            < r.rate_ppm AS BIGINT) AS kept
         |FROM f JOIN r USING (fp)
         |ORDER BY f.doc_id""".stripMargin) { (s, d) =>
      val f = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.fingerprintMd5(col("text")).as("fp"))
      val r = f.groupBy("fp")
        .agg(count(lit(1)).as("dup_count"), min("doc_id").as("canonical"))
        .withColumn("rate_ppm",
          floor(lit(1000000.0) * sqrt(col("dup_count").cast("double"))
            / col("dup_count")).cast("long"))
      f.join(r, "fp")
        .select(col("doc_id"), col("dup_count"),
          (col("doc_id") === col("canonical") ||
            TextFns.keepPpm(col("doc_id"), col("fp"), col("rate_ppm")))
            .cast("bigint").as("kept"))
        .orderBy("doc_id")
    },

    // content-defined chunking dedup: storage-style sub-document
    // granularity — split every document at rolling-hash boundaries
    // (graft.functions.CdcChunks, one fused codegen pass), then account
    // duplicate chunks across the corpus. Boundaries move with content,
    // so shared passages between otherwise-different documents collapse
    // to one stored chunk; dup_chars is the byte savings chunk-level
    // dedup would deliver. The oracle replays the identical seeded
    // window folds per position.
    "t21_cdc_dedup" -> Q(
      s"""WITH t AS (SELECT doc_id, $norm AS tx FROM documents),
         |c0 AS (
         |  SELECT doc_id, tx,
         |         list_transform(string_split(tx, ''),
         |           c -> CAST(ascii(c) AS BIGINT)) AS codes
         |  FROM t WHERE len(tx) > 0),
         |b AS (
         |  SELECT doc_id, tx, len(codes) AS n,
         |         list_filter(range(8, len(codes) + 1), i ->
         |           list_reduce(codes[i-7:i],
         |             (acc, x) -> (acc * 31 + x) % 1000000007) % 64 = 0)
         |           AS bnds
         |  FROM c0),
         |e AS (
         |  SELECT doc_id, tx,
         |         CASE WHEN len(bnds) > 0 AND bnds[len(bnds)] = n THEN bnds
         |              ELSE list_append(bnds, n) END AS ends
         |  FROM b),
         |ch AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(ends) + 1), j ->
         |           substr(tx,
         |             CASE WHEN j = 1 THEN 1 ELSE ends[j-1] + 1 END,
         |             ends[j] - CASE WHEN j = 1 THEN 0 ELSE ends[j-1] END)))
         |           AS chunk
         |  FROM e),
         |g AS (SELECT md5(chunk) AS h, length(chunk) AS len, count(*) AS cnt
         |      FROM ch GROUP BY 1, 2)
         |SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
         |       count(*) AS n_distinct,
         |       CAST(sum(len * cnt) AS BIGINT) AS total_chars,
         |       CAST(sum(len * (cnt - 1)) AS BIGINT) AS dup_chars
         |FROM g""".stripMargin) { (s, d) =>
      val ch = Tables.documents(s, d)
        .select(explode(graft.functions.CdcChunks(
          TextFns.normalize(col("text")), 8, 64)).as("chunk"))
      ch.groupBy(md5(col("chunk")).as("h"),
          length(col("chunk")).as("len"))
        .agg(count(lit(1)).as("cnt"))
        .agg(sum("cnt").as("n_chunks"),
          count(lit(1)).as("n_distinct"),
          sum(col("len") * col("cnt")).as("total_chars"),
          sum(col("len") * (col("cnt") - 1)).as("dup_chars"))
    },

    // quality-aware canonical keep — d13 keeps min doc_id per near-dup
    // cluster (deterministic but quality-blind); the real pipeline
    // policy keeps the HIGHEST-QUALITY member, scored by the t31
    // trained classifier. Selection is an argmax AGGREGATE
    // (max(struct(score, -doc_id))) over cluster keys, never a rank
    // window — a 10^9-member mega-cluster costs one combiner cell per
    // task, no straggler sort. Ties (exact duplicates score
    // identically) break to the smaller doc_id in both engines. The
    // oracle composes d07's recursive-CTE clustering with t31's
    // scoring arithmetic verbatim.
    "d15_quality_keep" -> Q(
      hashedShingleCtes.replaceFirst("WITH w AS", "WITH RECURSIVE w AS") +
        s"""sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
          |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
          |         WHERE df <= 50),
          |blocked AS (SELECT doc_id, s.sh FROM sh s JOIN rare USING (sh)),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          |  FROM blocked a JOIN blocked b ON a.sh = b.sh AND a.doc_id < b.doc_id),
          |inter AS (
          |  SELECT c.a, c.b, count(*) AS i
          |  FROM cand c JOIN sh x ON x.doc_id = c.a
          |  JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
          |  GROUP BY 1, 2),
          |pairs AS (
          |  SELECT a, b
          |  FROM inter JOIN sizes x ON a = x.doc_id JOIN sizes y ON b = y.doc_id
          |  WHERE round(i * 1.0 / (x.n_sh + y.n_sh - i), 4) >= 0.8),
          |und AS (SELECT a AS src, b AS dst FROM pairs
          |        UNION SELECT b, a FROM pairs),
          |cc AS (
          |  SELECT src AS node, src AS label FROM und
          |  UNION
          |  SELECT u.dst, cc.label FROM cc JOIN und u ON cc.node = u.src),
          |labels AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY 1),
          |q AS (SELECT doc_id, ${TextQueries.classifierScoreSql} AS score
          |      FROM w),
          |keyed AS (
          |  SELECT q.doc_id, coalesce(l.cluster_id, q.doc_id) AS cluster_id,
          |         q.score
          |  FROM q LEFT JOIN labels l ON q.doc_id = l.node),
          |ranked AS (
          |  SELECT doc_id, cluster_id, score,
          |         row_number() OVER (PARTITION BY cluster_id
          |           ORDER BY score DESC, doc_id) AS rn,
          |         CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
          |           AS n_members
          |  FROM keyed)
          |SELECT doc_id, cluster_id, n_members, score FROM ranked
          |WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.text.QualityClassifier
      val docs = Tables.documents(s, d)
      val pairs = Dedup.ngramJaccardPairs(docs, maxDF = 50, minJaccard = 0.8)
      val labels = graft.operators.ConnectedComponents.run(pairs)
        .withColumnRenamed("node", "doc_id")
      docs.select(col("doc_id"),
          QualityClassifier.score(col("text")).as("score"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("cluster_id"),
          col("score"))
        .groupBy("cluster_id")
        .agg(max(struct(col("score"), (-col("doc_id")).as("nid"))).as("top"),
          count(lit(1)).as("n_members"))
        .select((-col("top.nid")).as("doc_id"), col("cluster_id"),
          col("n_members"), col("top.score").as("score"))
        .orderBy("doc_id")
    },

    // d06 at the SCALE configuration: planes per table sized to the
    // corpus with Ann.planesFor (greatest(3, ceil(log2(n/target))),
    // target 25 here so the sizing actually engages at test scale —
    // 5 planes at 500 vectors, 7 at 2000). The plane count is a pure
    // function of count(*), so the oracle recomputes it in SQL and the
    // hash check covers the exact bucket construction the 100 TB path
    // uses, not just the 3-plane toy configuration (BASELINE.md §4
    // measured 44x blowup at fixed planes vs 9.4x sized).
    "d11_cosine_lsh_sized" -> Q(
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |params AS (
        |  SELECT greatest(3, CAST(ceil(log2(count(*) / 25.0)) AS INT)) AS np
        |  FROM e),
        |n AS (
        |  SELECT vec_id,
        |         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
        |  FROM e),
        |b AS (
        |  SELECT vec_id,
        |         unnest(list_transform(range(0, 8), t ->
        |           t * (1::BIGINT << np) + list_sum(list_transform(range(0, np), j ->
        |             CASE WHEN list_dot_product(v, list_transform(range(0, 64),
        |                    i -> (((t*np+j)*7919 + i*104729 + 12345) % 2001 - 1000) / 1000.0)) > 0
        |                  THEN (1::BIGINT << j) ELSE 0 END)))) AS bucket
        |  FROM e, params),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
        |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
        |SELECT a, b, round(list_dot_product(p.vn, q.vn), 6) AS cos
        |FROM cand JOIN n p ON a = p.vec_id JOIN n q ON b = q.vec_id
        |WHERE round(list_dot_product(p.vn, q.vn), 6) >= 0.4
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      // plane count AND hot-bucket cap both derive from one bounded
      // count-star inside the entry point — the production default
      Dedup.cosineNearDupPairsLsh(Tables.embeddings(s, d), minCos = 0.4,
          targetBucketSize = 25)
        .orderBy("a", "b")
    },

    // Exact cross-document substring spans: maximal character regions
    // (>= 20 chars) whose every 20-gram also appears in another doc —
    // the character-level dedup (licence blocks, templated passages)
    // that document/chunk-level methods miss. Both engines hash the
    // identical normalized 20-grams and merge identical position runs.
    "d12_substring_spans" -> Q(
      s"""WITH nd AS (
         |  SELECT doc_id, $norm AS t FROM documents),
         |ge AS (
         |  SELECT doc_id, u.p AS p, u.h AS h
         |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(t) - 18),
         |          i -> {'p': i, 'h': md5(substr(t, i, 20))})) AS u
         |        FROM nd WHERE len(t) >= 20)),
         |cross_doc AS (
         |  SELECT h FROM ge GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |hits AS (SELECT doc_id, p FROM ge JOIN cross_doc USING (h)),
         |runs AS (
         |  SELECT doc_id, p,
         |         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) = 1
         |              THEN 0 ELSE 1 END AS brk
         |  FROM hits),
         |spans AS (
         |  SELECT doc_id, p,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS span
         |  FROM runs)
         |SELECT doc_id, min(p) AS span_start, max(p) + 19 AS span_end,
         |       max(p) + 19 - min(p) + 1 AS span_len
         |FROM spans GROUP BY doc_id, span
         |ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
      Dedup.substringSpans(Tables.documents(s, d), k = 20)
        .orderBy("doc_id", "span_start")
    }
  )
}
