package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.vector.VectorFns

/** Corpus deduplication operators for training-data pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: every method is blocked — candidate pairs only form
  * inside a bounded bucket (shared rare shingle, LSH band bucket,
  * SimHash byte band, embedding label/LSH bucket), never via an O(n²)
  * cross join. Hashing is md5-hex / integer arithmetic so any engine
  * (the DuckDB oracle included) reproduces signatures bit-for-bit.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact-duplicate groups on the normalized-text fingerprint: one row
    * per duplicated fingerprint with member count and canonical (min)
    * doc id. */
  def exactDupGroups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(TextFns.fingerprintMd5(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_members"), min(idCol).as("canonical_id"))
      .filter(col("n_members") > 1)

  // ------------------------------------------------------------- shingles

  /** Distinct word n-gram shingle array per document (empty when the
    * doc has fewer than n words — guards Spark's descending sequence). */
  def shingleArray(text: Column, n: Int = 3): Column = {
    val ws = TextFns.words(text)
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** (id, shingle) exploded distinct shingles. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3)
      : DataFrame =
    docs.select(col(idCol).as("id"),
      explode(shingleArray(col(textCol), n)).as("sh"))

  /** n-gram Jaccard near-dup pairs: candidate pairs come from shared
    * RARE shingles (df <= maxDF — frequent shingles contribute
    * candidates quadratically but little signal), then the TRUE
    * Jaccard is computed over the full distinct-shingle sets of the
    * surviving pairs only. Blocking gates candidate generation, never
    * the similarity itself. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, maxDF: Int = 50,
      minJaccard: Double = 0.8): DataFrame = {
    // the shingle table feeds four consumers (sizes, df filter, pair
    // generation, intersection) — materialize it once
    val sh = shingles(docs, idCol, textCol, n).persist()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDF)
    val blocked = sh.join(rare.select("sh"), "sh")
    val cand = blocked.select(col("sh"), col("id").as("a"))
      .join(blocked.select(col("sh"), col("id").as("b")), Seq("sh"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // exact intersection over ALL shingles, restricted to candidates
    val inter = cand
      .join(sh.toDF("a", "sh"), Seq("a"))
      .join(sh.toDF("b", "sh"), Seq("b", "sh"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("id", "a")
        .withColumnRenamed("n_sh", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b")
        .withColumnRenamed("n_sh", "nb"), "b")
      .select(col("a"), col("b"),
        round(col("i") / (col("na") + col("nb") - col("i")), 4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  // -------------------------------------------------------------- minhash

  /** MinHash signature: k independent hash views, each the lexicographic
    * min of md5("<seed>|<shingle>") over the shingle set. Single-row
    * expression form (used for small/row-local cases; the distributed
    * pipeline uses [[minhashSignatures]]). */
  def minhashSignature(text: Column, k: Int = 12, n: Int = 3): Column = {
    val sh = shingleArray(text, n)
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(sh,
        x => md5(concat(s.cast("string"), lit("|"), x)))))
  }

  /** Distributed signature table (id, sig array<string>): shingles are
    * exploded once and the k minima run as ONE codegen'd hash
    * aggregation (k `min` aggregates over the shingle rows) — no
    * interpreted per-row lambda over the whole shingle set, one shuffle
    * by id. This is the form that scales: cost is O(|shingles| * k)
    * map-side with partial aggregation. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, n: Int): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val minCols = (0 until k).map(s =>
      min(md5(concat(lit(s.toString), lit("|"), col("sh")))).as(s"m$s"))
    sh.groupBy("id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until k).map(s => col(s"m$s")): _*).as("sig"))
  }

  /** LSH band bucket ids: bands of r signature rows hashed together;
    * docs sharing any bucket are candidates. */
  def lshBuckets(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|",
        (b.cast("string") +:
          (1 to rows).map(r => element_at(sig, b * rows + r))): _*)))

  /** MinHash+LSH near-dup candidate pairs with estimated Jaccard
    * (signature agreement rate). */
  def minhashLshPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 12, bands: Int = 4,
      minEst: Double = 0.5, n: Int = 3): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must divide into bands=$bands evenly")
    val rows = k / bands
    // one shuffle builds every signature; persisted because the plan
    // references it three times (buckets + both pair sides)
    val sigs = minhashSignatures(docs, idCol, textCol, k, n).persist()
    val buckets = sigs.select(col("id"),
      explode(lshBuckets(col("sig"), bands, rows)).as("bucket"))
    val cand = buckets.select(col("bucket"), col("id").as("a"))
      .join(buckets.select(col("bucket"), col("id").as("b")), Seq("bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    cand
      .join(sigs.select(col("id").as("a"), col("sig").as("siga")), "a")
      .join(sigs.select(col("id").as("b"), col("sig").as("sigb")), "b")
      .select(col("a"), col("b"),
        round(size(filter(zip_with(col("siga"), col("sigb"),
          (x, y) => x === y), p => p)) / lit(k.toDouble), 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }

  // -------------------------------------------------------------- simhash

  private val WordHashMod = 16777216L // 24-bit word hashes
  private val SimBits = 24

  /** 24-bit SimHash over word tokens (with multiplicity): per bit, the
    * sign of the +1/−1 vote sum across word hashes. Word hash is the
    * engine-neutral polynomial char hash (TextFns.fingerprintRolling)
    * mod 2^24. Pure SQL expression — nested higher-order functions,
    * no UDF. */
  def simhash(text: Column): Column = {
    val ws = TextFns.words(text)
    val hs = transform(ws, w => wordHash(w))
    // (h >> j) & 1 written as exact double arithmetic: the shift amount
    // is a lambda-bound column, which functions.shiftright doesn't take;
    // h < 2^24 so floor(h / 2^j) is exact in double.
    aggregate(sequence(lit(0), lit(SimBits - 1)), lit(0L),
      (acc, j) => acc + when(
        aggregate(hs, lit(0L),
          (a, h) => a + pmod(floor(h / pow(lit(2.0), j)).cast("long"),
            lit(2L)) * 2 - 1) > 0,
        pow(lit(2.0), j).cast("long")).otherwise(lit(0L)))
  }

  /** The per-word polynomial hash used by SimHash (engine-neutral). */
  private def wordHash(w: Column): Column = pmod(
    aggregate(
      slice(transform(split(w, ""), c => ascii(c).cast("long")),
        lit(2), size(split(w, "")) - 1),
      ascii(substring(w, 0, 1)).cast("long"),
      (acc, x) => pmod(acc * 31 + x, lit(1000000007L))),
    lit(WordHashMod))

  /** Distributed SimHash table (id, sim): words explode once, repeated
    * word hashes collapse via a count aggregate, and the per-bit vote
    * sums run as codegen'd hash aggregations — the giant per-document
    * nested lambda of [[simhash]] becomes three cheap shuffles whose
    * map-side partial aggregation bounds the data movement by
    * #(id, bit) groups, not token count. */
  def simhashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("id"),
      explode(TextFns.words(col(textCol))).as("w"))
    val counted = words.select(col("id"), wordHash(col("w")).as("h"))
      .groupBy("id", "h").agg(count(lit(1)).as("c"))
    val votes = counted.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(SimBits - 1)), j =>
        (pmod(floor(col("h") / pow(lit(2.0), j)).cast("long"), lit(2L)) * 2
          - 1) * col("c"))))
      .toDF("id", "bit", "vote")
    votes.groupBy("id", "bit").agg(sum("vote").as("v"))
      .groupBy("id")
      .agg(sum(when(col("v") > 0,
        pow(lit(2.0), col("bit")).cast("long")).otherwise(0L)).as("sim"))
  }

  /** SimHash near-dup pairs: block on any shared 8-bit byte band, keep
    * pairs with Hamming distance <= maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 6): DataFrame = {
    val withSim = simhashes(docs, idCol, textCol)
    val bands = withSim.select(col("id"), col("sim"),
      explode(array((0 until SimBits / 8).map(b =>
        concat(lit(s"$b|"),
          shiftright(col("sim"), 8 * b).bitwiseAND(255).cast("string"))): _*))
        .as("band"))
    val cand = bands.select(col("band"), col("id").as("a"), col("sim").as("sima"))
      .join(bands.select(col("band"), col("id").as("b"), col("sim").as("simb")),
        Seq("band"))
      .filter(col("a") < col("b"))
      .select("a", "b", "sima", "simb").distinct()
    cand.select(col("a"), col("b"),
        bit_count(col("sima").bitwiseXOR(col("simb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------ embedding cosine

  /** Embedding near-dup pairs above a cosine threshold. Local form is a
    * self-join filtered to a < b; the scale path blocks by LSH
    * (graft.vector.Ann) or a coarse quantizer before pairing. */
  /** LSH-blocked embedding near-dup: candidates limited to pairs
    * sharing any multi-table hyperplane bucket (graft.vector.Ann),
    * then exact cosine. The 100 TB path — candidate generation is a
    * bucket-key shuffle, recall governed by the table construction. */
  def cosineNearDupPairsLsh(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", minCos: Double = 0.4,
      dim: Int = 64, planesPerTable: Int = 3, nTables: Int = 8): DataFrame = {
    val buckets = graft.vector.Ann
      .withLshBuckets(emb, vecCol, dim, planesPerTable, nTables)
      .select(col(idCol).as("id"), col("bucket"))
    val cand = buckets.select(col("bucket"), col("id").as("a"))
      .join(buckets.select(col("bucket"), col("id").as("b")), Seq("bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val normed = emb
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", VectorFns.norm(col("v")))
      .select(col("id"), VectorFns.normalized(col("v"), col("nrm")).as("vn"))
    cand
      .join(normed.select(col("id").as("a"), col("vn").as("va")), Seq("a"))
      .join(normed.select(col("id").as("b"), col("vn").as("vb")), Seq("b"))
      .select(col("a"), col("b"),
        round(VectorFns.dot(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }

  def cosineNearDupPairs(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", minCos: Double = 0.4): DataFrame = {
    // normalize once per vector (n folds), so each of the n² pairs
    // costs exactly one dot fold
    val normed = emb
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", VectorFns.norm(col("v")))
      .select(col("id"), VectorFns.normalized(col("v"), col("nrm")).as("vn"))
    val a = normed.select(col("id").as("a"), col("vn").as("va"))
    val b = normed.select(col("id").as("b"), col("vn").as("vb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(VectorFns.dot(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
