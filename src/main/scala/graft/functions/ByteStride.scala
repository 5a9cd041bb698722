package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Every `stride`-th byte of a binary column, as a native codegen
  * expression — the deterministic stand-in for a media resize/
  * decimation kernel (a real implementation would decode the container
  * and subsample pixels/samples; the Spark-side plumbing — binary in,
  * smaller binary out, codegen'd, no row-by-row JVM boxing — is
  * identical). Stride 4 on a 1 MB object emits 256 KB; applied before
  * a shuffle it cuts the moved bytes by the same factor.
  */
case class ByteStride(child: Expression, stride: Int)
    extends UnaryExpression {
  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "byte_stride"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_stride expects a binary column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ByteStride.strided(input.asInstanceOf[Array[Byte]], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteStride.strided($c, $stride);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteStride {

  /** JVM kernel, shared by interpreted eval and generated code. */
  def strided(bytes: Array[Byte], stride: Int): Array[Byte] = {
    if (stride == 1) return bytes
    val out = new Array[Byte]((bytes.length + stride - 1) / stride)
    var i = 0
    var o = 0
    while (o < out.length) {
      out(o) = bytes(i)
      i += stride
      o += 1
    }
    out
  }

  /** Column entry point. */
  def apply(bytes: Column, stride: Int): Column =
    Shim.column(ByteStride(Shim.expression(bytes), stride))
}
