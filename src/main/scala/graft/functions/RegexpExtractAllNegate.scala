package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst form of the reference's one genuine custom scalar
  * (SURVEY.md U1): regex find-all, comma-join the matches of `idx`, then
  * normalize a trailing hemisphere letter — the last character is always
  * stripped, and the value is negated when it was `W` or `S` (west/south).
  * Empty extraction passes through as the empty string.
  *
  * Reference: `Bronze-Silver/Part1 ... [Scala].scala:560-582` (a Scala
  * `udf`, re-compiling its Pattern per row). This implementation is a
  * `TernaryExpression` with whole-stage codegen and a per-partition
  * compiled-pattern cache keyed on the regex value, so non-literal
  * per-row regexes (the reference drives it from the `metricmappings.regex`
  * column) stay cheap.
  */
case class RegexpExtractAllNegate(
    subject: Expression, regexp: Expression, idx: Expression)
  extends TernaryExpression {

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = idx

  override def dataType: DataType = StringType
  override def nullable: Boolean =
    subject.nullable || regexp.nullable || idx.nullable
  override def prettyName: String = "regexp_extract_all_negate"

  // interpreted path: cache the compiled pattern across rows
  @transient private var lastRegex: UTF8String = _
  @transient private var pattern: Pattern = _

  override protected def nullSafeEval(s: Any, r: Any, i: Any): Any = {
    val regex = r.asInstanceOf[UTF8String]
    if (pattern == null || !regex.equals(lastRegex)) {
      lastRegex = regex.clone()
      pattern = Pattern.compile(lastRegex.toString)
    }
    RegexpExtractAllNegate.join(
      pattern, s.asInstanceOf[UTF8String].toString, i.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternCls = classOf[Pattern].getName
    val self = classOf[RegexpExtractAllNegate].getName
    val lastRegexTerm = ctx.addMutableState("UTF8String", "lastRegexNeg")
    val patternTerm = ctx.addMutableState(patternCls, "patternNeg")
    nullSafeCodeGen(ctx, ev, (subj, regex, i) => {
      s"""
        if ($patternTerm == null || !$regex.equals($lastRegexTerm)) {
          $lastRegexTerm = ($regex).clone();
          $patternTerm = $patternCls.compile($lastRegexTerm.toString());
        }
        ${ev.value} = $self.join($patternTerm, ($subj).toString(), $i);
      """
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(subject = newFirst, regexp = newSecond, idx = newThird)
}

object RegexpExtractAllNegate {
  /** Shared by interpreted eval and generated code. Never returns null
    * for non-null inputs (empty extraction -> empty string). */
  def join(pattern: Pattern, s: String, groupIdx: Int): UTF8String = {
    val m = pattern.matcher(s)
    val sb = new java.lang.StringBuilder()
    var any = false
    while (m.find()) {
      if (any) sb.append(',')
      val g = m.group(groupIdx)
      if (g != null) sb.append(g)
      any = true
    }
    if (sb.length() == 0) UTF8String.EMPTY_UTF8
    else {
      val last = sb.charAt(sb.length() - 1)
      sb.setLength(sb.length() - 1) // hemisphere letter always stripped
      val out =
        if (last == 'W' || last == 'S') "-" + sb.toString else sb.toString
      UTF8String.fromString(out)
    }
  }

  /** Column-API entry point. */
  def apply(subject: Column, regexp: Column, groupIdx: Column): Column =
    Shim.column(RegexpExtractAllNegate(
      Shim.expression(subject),
      Shim.expression(regexp),
      Shim.expression(groupIdx)))
}
