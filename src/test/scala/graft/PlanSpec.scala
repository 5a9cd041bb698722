package graft

/** Plan-shape assertions: the registered queries must produce the plans
  * we would want at 100 TB — filters/projections pushed into the parquet
  * scan, small dims broadcast, codegen in the hot path. These guard
  * against regressions that correctness checks cannot see.
  */
class PlanSpec extends SparkSpec {

  /** Full formatted explain (the plan toString truncates long fields
    * like PushedFilters at 100 chars). */
  private def formattedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, SfDir)
    df.collect() // materialize so AQE finalizes the plan (codegen ids appear)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q02 filter+project pushes predicates and prunes columns at the scan") {
    val plan = formattedPlan("q02_filter_project")
    plan should include("PushedFilters: [")
    plan should include("LessThan(l_shipdate")
    plan should include("GreaterThan(l_quantity")
    // pruned read schema: only the 5 referenced columns, not all 16
    plan should include("l_orderkey")
    plan should not include "l_suppkey"
  }

  test("q03 join broadcasts the small customer side") {
    val plan = formattedPlan("q03_join_agg")
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q01 aggregate runs partial+final hash aggregation with codegen") {
    val plan = formattedPlan("q01_pricing_summary")
    plan should include("HashAggregate")
    plan should include("[codegen id :") // whole-stage codegen spans present
  }

  test("every registered query has a non-empty schema and distinct columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, SfDir)
      withClue(s"$name: ") {
        df.columns.length should be > 0
        df.columns.map(_.toLowerCase).distinct.length shouldBe df.columns.length
      }
    }
  }

  test("flagship entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }
}
