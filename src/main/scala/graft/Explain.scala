package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: prints the formatted plan (and, after execution,
  * the final AQE plan) for one or more registered queries.
  *
  * Usage: sbt "runMain graft.Explain q02_filter_project [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
                else args.filterNot(_.startsWith("/")).toSeq
    val sfDir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      df.collect()
      println("---------- final (post-AQE) ----------")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
