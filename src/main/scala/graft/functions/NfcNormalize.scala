package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — Spark has
  * no built-in for it, and a corpus-cleaning pipeline needs canonical
  * composition before fingerprinting/dedup (the same text arrives both
  * precomposed, U+00E9, and decomposed, U+0065 U+0301, and must hash
  * identically). DuckDB mirrors it exactly as `nfc_normalize(s)`, so
  * the pass stays oracle-checkable.
  *
  * The ASCII fast path matters at scale: pure-ASCII input is detected
  * on the raw UTF-8 bytes and returned with zero allocation, so the
  * pass runs near memcpy speed over a mostly-ASCII corpus; non-ASCII
  * but already-NFC strings still avoid the normalize allocation via
  * `Normalizer.isNormalized`; compiled into the surrounding
  * whole-stage loop.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize expects a string column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** JVM kernel; returns the input object untouched when already NFC.
    * Pure-ASCII input (the common case in a web corpus) is detected on
    * the raw UTF-8 bytes and returns with zero allocation; only
    * non-ASCII strings pay the toString + isNormalized scan, and only
    * genuinely non-NFC strings pay the normalize. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s // ASCII is closed under NFC
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column entry point. */
  def apply(s: Column): Column =
    Shim.column(NfcNormalize(Shim.expression(s)))
}
