package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.KeyedUpsert

class KeyedUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-upsert").toString + "/t"

  test("insert then update then insert-new merges by key") {
    val dir = tmp()
    KeyedUpsert.upsert(spark, dir,
      Seq(("a", 1), ("b", 2)).toDF("k", "v"), Seq("k"), numBuckets = 4)
    KeyedUpsert.upsert(spark, dir,
      Seq(("b", 20), ("c", 3)).toDF("k", "v"), Seq("k"), numBuckets = 4)
    val out = KeyedUpsert.read(spark, dir).as[(String, Int)].collect().toMap
    out shouldBe Map("a" -> 1, "b" -> 20, "c" -> 3)
  }

  test("replaying the same batch is idempotent") {
    val dir = tmp()
    val batch = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    KeyedUpsert.upsert(spark, dir, batch, Seq("k"), numBuckets = 4)
    KeyedUpsert.upsert(spark, dir, batch, Seq("k"), numBuckets = 4)
    KeyedUpsert.read(spark, dir).count() shouldBe 2
  }

  test("within-batch duplicates collapse; tieBreak picks the max") {
    val dir = tmp()
    KeyedUpsert.upsert(spark, dir,
      Seq(("a", 1), ("a", 9), ("a", 5)).toDF("k", "v"), Seq("k"),
      numBuckets = 4, tieBreak = Some("v"))
    KeyedUpsert.read(spark, dir).as[(String, Int)].collect().toSeq shouldBe
      Seq(("a", 9))
  }

  test("keepMaxOnMerge: an out-of-order older batch cannot regress a key") {
    val dir = tmp()
    KeyedUpsert.upsert(spark, dir,
      Seq(("a", 10, "new")).toDF("k", "ts", "v"), Seq("k"),
      numBuckets = 4, tieBreak = Some("ts"), keepMaxOnMerge = true)
    // replayed batch carries an OLDER row for the same key
    KeyedUpsert.upsert(spark, dir,
      Seq(("a", 5, "old"), ("b", 1, "b1")).toDF("k", "ts", "v"), Seq("k"),
      numBuckets = 4, tieBreak = Some("ts"), keepMaxOnMerge = true)
    val out = KeyedUpsert.read(spark, dir)
      .as[(String, Int, String)].collect()
      .map { case (k, t, v) => k -> ((t, v)) }.toMap
    out("a") shouldBe ((10, "new")) // not regressed
    out("b") shouldBe ((1, "b1"))
  }

  test("untouched buckets are not rewritten (scale property)") {
    val dir = tmp()
    val many = spark.range(0, 400)
      .select(concat(lit("k"), col("id")).as("k"), col("id").as("v"))
    KeyedUpsert.upsert(spark, dir, many, Seq("k"), numBuckets = 16)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def mtimes: Map[String, Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(_.getPath.getName.startsWith("__bucket="))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val before = mtimes
    before.size shouldBe 16
    Thread.sleep(1100) // dir mtime granularity
    KeyedUpsert.upsert(spark, dir,
      Seq(("k1", 99L)).toDF("k", "v"), Seq("k"), numBuckets = 16)
    val after = mtimes
    val changed = after.filter { case (n, t) => before(n) != t }
    changed.size shouldBe 1 // only k1's bucket rewritten
    KeyedUpsert.read(spark, dir).filter($"k" === "k1")
      .as[(String, Long)].collect().toSeq shouldBe Seq(("k1", 99L))
    KeyedUpsert.read(spark, dir).count() shouldBe 400
  }
}
