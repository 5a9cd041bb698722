package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all specs. One JVM-wide session (Spark
  * sessions are cheap to share, expensive to churn); small shuffle
  * partition count keeps micro-fixture tests fast.
  */
trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.session
  val SfDir = "/root/testdata/sf0.001"

  /** Collect a single column as a sorted Seq for order-free comparison. */
  def col1[T](df: org.apache.spark.sql.DataFrame): Seq[Any] =
    df.collect().map(_.get(0)).toSeq
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // FAIR scheduling so the ST6 pool-isolation test exercises real
      // concurrent pools (pool assignment is a no-op under FIFO)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
