package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-neutral 60-bit polynomial string hash as a native codegen
  * expression.
  *
  * Two independent character-code folds (seeded with the first code
  * point, like DuckDB's seedless `list_reduce`):
  *
  *   h1: acc = (acc *  31 + cp) mod 1073741789   (largest prime < 2^30)
  *   h2: acc = (acc * 131 + cp) mod 1073741783   (next prime down)
  *
  * combined as `h1 * 2^30 + h2` — always below 2^61, so DuckDB's
  * overflow-checked BIGINT arithmetic reproduces it verbatim:
  *
  * {{{
  * list_reduce(list_transform(string_split(s, ''),
  *     c -> CAST(ascii(c) AS BIGINT)), (acc, x) -> (acc*31 + x) % 1073741789)
  *   * 1073741824 +
  * list_reduce(..., (acc, x) -> (acc*131 + x) % 1073741783)
  * }}}
  *
  * Purpose: compact join/aggregation keys for shingle-level dedup — an
  * 8-byte long through a shuffle instead of a multi-word shingle string
  * (or a 32-char md5 hex). The higher-order-function fold form of the
  * same hash is interpreted per character; this compiles into the
  * surrounding whole-stage-codegen loop.
  */
case class PolyHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash64.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash64.hash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash64 {
  private final val Mod1 = 1073741789L
  private final val Mod2 = 1073741783L

  /** JVM-side fold over Unicode code points (what Spark's `ascii` and
    * DuckDB's `ascii` both return per character). */
  def hash(s: String): Long = {
    val n = s.length
    if (n == 0) return 0L
    var cp = s.codePointAt(0)
    var h1 = cp.toLong
    var h2 = cp.toLong
    var i = Character.charCount(cp)
    while (i < n) {
      cp = s.codePointAt(i)
      h1 = (h1 * 31L + cp) % Mod1
      h2 = (h2 * 131L + cp) % Mod2
      i += Character.charCount(cp)
    }
    h1 * 1073741824L + h2
  }

  /** Column entry point. */
  def apply(s: Column): Column =
    Shim.column(PolyHash64(Shim.expression(s)))
}
