package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split text into variable-size chunks at
  * positions where a rolling window hash hits a mask — the boundary
  * moves WITH the content, so an insertion early in a document shifts
  * chunk offsets without changing the chunks after it (fixed-size
  * blocks would re-split everything downstream). Chunk-level dedup at
  * sub-document granularity is the storage-dedup technique this
  * enables: shared passages between near-identical documents collapse
  * to one stored chunk even when the documents differ elsewhere.
  *
  * Boundary rule, chosen to be exactly replayable in SQL (t21's DuckDB
  * oracle): a chunk ends at 1-based position `i >= window` when the
  * seeded polynomial fold of the last `window` character codes —
  * `acc = code(first)`, then `acc = (acc*31 + code) % 1000000007` —
  * is divisible by `mask` (expected chunk length ~= mask). The final
  * partial chunk always emits. No minimum-length guard: that would
  * make boundaries depend on previous boundaries (sequential state no
  * declarative oracle can replay); degenerate short chunks are rare at
  * mask 64 and harmless for dedup accounting.
  *
  * One fused codegen pass, O(window * n) per row, no per-position
  * array allocation — same design as [[ShingleHashes]].
  */
case class CdcChunks(child: Expression, window: Int, mask: Int)
    extends UnaryExpression {
  require(window >= 2 && window <= 64,
    s"cdc_chunks: window must be 2..64, got $window")
  require(mask >= 2, s"cdc_chunks: mask must be >= 2, got $mask")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[UTF8String], window, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.chunks($c, $window, $mask);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {

  private final val Mod = 1000000007L

  /** Shared by eval and generated code. Code points mirror DuckDB's
    * `ascii` over `string_split(s, '')`. */
  def chunks(input: UTF8String, window: Int, mask: Int): ArrayData = {
    val s = input.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // code points as an array so window folds are O(window) re-reads
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val out = new java.util.ArrayList[Any]()
    var startCp = 0 // chunk start, code-point index
    var i = window - 1 // window END, 0-based code-point index
    while (i < n) {
      var acc = cps(i - window + 1).toLong
      var j = i - window + 2
      while (j <= i) {
        acc = (acc * 31L + cps(j)) % Mod
        j += 1
      }
      if (acc % mask == 0L) {
        out.add(UTF8String.fromString(sliceCp(s, cps, startCp, i + 1)))
        startCp = i + 1
      }
      i += 1
    }
    if (startCp < n)
      out.add(UTF8String.fromString(sliceCp(s, cps, startCp, n)))
    new GenericArrayData(out.toArray)
  }

  /** Substring by code-point range [from, until). */
  private def sliceCp(s: String, cps: Array[Int], from: Int, until: Int)
      : String = {
    val a = s.offsetByCodePoints(0, from)
    val b = s.offsetByCodePoints(a, until - from)
    s.substring(a, b)
  }

  /** Column entry point. */
  def apply(text: Column, window: Int = 8, mask: Int = 64): Column =
    Shim.column(CdcChunks(Shim.expression(text), window, mask))
}
