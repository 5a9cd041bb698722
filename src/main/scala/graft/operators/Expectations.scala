package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level data-quality expectations (the managed-pipeline
  * "expectations" idiom — declare named row predicates on a table,
  * get per-rule violation metrics, a clean stream, and a quarantine
  * stream): the engine-side generalization of the reference's
  * detection notebooks (`Detection Data Lack/...Orphaned Usage...`,
  * SURVEY JN10/A8), which each hand-roll one rule as its own query.
  *
  * Scale shape: `check` is a single map-side projection — every rule
  * evaluates as one codegen'd boolean column, no join, no shuffle,
  * one pass whatever the rule count. `summary` is one partial-agg
  * rollup over those booleans (conditional sums — the state is one
  * long per rule per task); `split` filters the SAME projection both
  * ways, so clean/quarantine are two prunes of one scan, not two
  * scans.
  */
object Expectations {

  /** A named row-level rule: `pass` must evaluate true for the row to
    * be clean. */
  case class Rule(name: String, pass: Column)

  private val FlagPrefix = "__exp_"

  /** Input + one boolean flag column per rule (`__exp_<name>`), plus
    * `__exp_ok` = conjunction of all rules (null-safe: a rule
    * evaluating to NULL counts as FAILED — unknown is not clean). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.check: no rules given")
    require(rules.map(_.name).distinct.size == rules.size,
      "Expectations.check: duplicate rule names")
    // "ok" would collide with the conjunction flag column and "_all"
    // with summary's synthetic conjunction row — a rule named either
    // silently corrupts the split/summary outputs
    require(rules.forall(r => r.name != "ok" && r.name != "_all"),
      "Expectations.check: rule names 'ok' and '_all' are reserved")
    val flagged = rules.foldLeft(df) { (acc, r) =>
      acc.withColumn(s"$FlagPrefix${r.name}",
        coalesce(r.pass.cast("boolean"), lit(false)))
    }
    flagged.withColumn(s"${FlagPrefix}ok",
      rules.map(r => col(s"$FlagPrefix${r.name}")).reduce(_ && _))
  }

  /** Per-rule metrics: (rule, n_rows, n_pass, n_fail), one row per
    * rule in declaration order plus an `_all` row for the
    * conjunction. One aggregation pass; the per-rule unpivot happens
    * on the GROUPED result (|rules| + 1 rows), not the data. */
  def summary(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val flagged = check(df, rules)
    val names = rules.map(_.name) :+ "ok"
    val aggs = names.flatMap { n =>
      Seq(count(lit(1)).as(s"n_$n"),
        sum(col(s"$FlagPrefix$n").cast("long")).as(s"p_$n"))
    }
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    val pairs = names.flatMap { n =>
      val shown = if (n == "ok") "_all" else n
      Seq(lit(shown), struct(col(s"n_$n").as("n"), col(s"p_$n").as("p")))
    }
    one.select(explode(map(pairs: _*)).as(Seq("rule", "m")))
      .select(col("rule"), col("m.n").as("n_rows"),
        col("m.p").as("n_pass"), (col("m.n") - col("m.p")).as("n_fail"))
  }

  /** (clean, quarantine): rows passing ALL rules, and failing rows
    * with a `failed_rules` array naming every violated rule. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val flagged = check(df, rules)
    val flagCols = (rules.map(_.name) :+ "ok").map(n => s"$FlagPrefix$n")
    val clean = flagged.filter(col(s"${FlagPrefix}ok")).drop(flagCols: _*)
    val failedNames = array_compact(array(rules.map(r =>
      when(!col(s"$FlagPrefix${r.name}"), lit(r.name))): _*))
    val quarantine = flagged.filter(!col(s"${FlagPrefix}ok"))
      .withColumn("failed_rules", failedNames)
      .drop(flagCols: _*)
    (clean, quarantine)
  }
}
