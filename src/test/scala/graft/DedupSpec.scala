package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with two exact dups (1,2), one near-dup pair (3,4), and
    * unrelated docs. */
  lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The quick  brown fox jumps over the lazy dog "), // exact after norm
    (3L, "the quick brown fox jumps over the sleepy dog today"),
    (4L, "the quick brown fox jumps over the sleepy cat today"),
    (5L, "completely different content about spark query engines"),
    (6L, "yet another unrelated string of words entirely here")
  ).toDF("doc_id", "text")

  test("exact dedup groups normalize-equal docs") {
    val groups = Dedup.exactDupGroups(corpus).collect()
    groups.length shouldBe 1
    groups(0).getAs[Long]("n_members") shouldBe 2L
    groups(0).getAs[Long]("canonical_id") shouldBe 1L
  }

  test("ngram jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(corpus, minJaccard = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L)) // identical -> jaccard 1.0
    pairs should contain((3L, 4L))
    pairs.flatMap(p => Seq(p._1, p._2)) should not contain 5L
  }

  test("minhash LSH surfaces high-jaccard candidates with sane estimates") {
    val pairs = Dedup.minhashLshPairs(corpus, k = 12, bands = 4, minEst = 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pairs.keySet should contain((1L, 2L))
    pairs((1L, 2L)) shouldBe 1.0 // identical docs agree on every hash
    // near-dups should estimate materially above unrelated docs
    pairs.get((3L, 4L)).foreach(_ should be > 0.4)
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val sims = corpus.select($"doc_id", Dedup.simhash($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    sims(1L) shouldBe sims(2L) // identical after normalization
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    hamming(sims(3L), sims(4L)) should be < hamming(sims(3L), sims(5L))
  }

  test("simhashPairs blocks and filters by hamming") {
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
  }

  test("minhash estimate tracks true jaccard on the real corpus") {
    val docs = Tables.documents(spark, SfDir)
    val truth = Dedup.ngramJaccardPairs(docs, minJaccard = 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val est = Dedup.minhashLshPairs(docs, k = 12, bands = 4, minEst = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // every true near-dup pair must be recalled by LSH
    truth.subsetOf(est) shouldBe true
  }

  test("cosine near-dup returns ordered pairs above threshold") {
    val pairs = Dedup.cosineNearDupPairs(Tables.embeddings(spark, SfDir),
      minCos = 0.4).collect()
    pairs.length should be > 0
    pairs.foreach { r =>
      r.getLong(0) should be < r.getLong(1)
      r.getDouble(2) should be >= 0.4
    }
  }
}
