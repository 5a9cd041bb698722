package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pure tests for the plan-fingerprint gate (no Spark session): feature
  * counting over a formatted plan (AQE-final section only), the line
  * format, and the gate's change/addition semantics. */
class PlanGateSpec extends AnyFunSuite with Matchers {

  private val formatted =
    """== Physical Plan ==
      |AdaptiveSparkPlan (9)
      |+- == Final Plan ==
      |   * HashAggregate (6)
      |   +- AQEShuffleRead (5)
      |      +- ShuffleQueryStage (4)
      |         +- Exchange (3)
      |            +- * BroadcastHashJoin Inner BuildRight (2)
      |               :- * Project (1)
      |               +- BroadcastExchange
      |
      |(3) Exchange
      |Arguments: hashpartitioning(k#1, 8)
      |
      |== Initial Plan ==
      |SortMergeJoin
      |Exchange SinglePartition
      |""".stripMargin

  test("fingerprint counts the final plan only, not the Initial Plan") {
    val fp = PlanGate.fingerprint(formatted).toMap
    fp("smj") shouldBe 0 // the SMJ is in the Initial Plan section
    fp("single") shouldBe 0
    fp("bhj") shouldBe 1
    // Exchange (3) in the tree + Arguments block line + BroadcastExchange
    fp("exch") shouldBe 3
    // `+- * BroadcastHashJoin`, `:- * Project` — the final-plan ROOT
    // (`* HashAggregate` with no branch prefix) is deliberately outside
    // the `[+:]- * ` shape; counts are consistent, not absolute
    fp("cg") shouldBe 2
    fp("cart") shouldBe 0
  }

  test("line renders a flat sorted-input JSON object") {
    PlanGate.line("q01", Seq("smj" -> 0, "bhj" -> 2)) shouldBe
      """{"q":"q01","smj":0,"bhj":2}"""
  }

  test("diff fires on a changed count and on an error sentinel") {
    val old = """{"q":"a","smj":0,"bhj":1}""" + "\n" +
      """{"q":"b","exch":2}""" + "\n"
    val now = """{"q":"a","smj":1,"bhj":1}""" + "\n" +
      """{"q":"b","exch":2,"err":1}""" + "\n"
    PlanGate.diff(old, now) shouldBe Seq("a: smj 0 -> 1", "b: err 0 -> 1")
  }

  test("added and removed queries are not findings") {
    val old = """{"q":"a","smj":0}""" + "\n"
    val now = """{"q":"b","smj":5}""" + "\n"
    PlanGate.diff(old, now) shouldBe empty
    PlanGate.diff("", now) shouldBe empty
  }

  test("parse round-trips the line format") {
    val text = PlanGate.line("x", Seq("smj" -> 1, "cg" -> 7)) + "\n"
    PlanGate.parse(text) shouldBe Map("x" -> Map("smj" -> 1, "cg" -> 7))
  }
}
