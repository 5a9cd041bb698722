package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct word-n-gram shingle hashes of a word array, as ONE native
  * expression: `shingle_hashes(words, n)` = the [[PolyHash64]] of every
  * distinct n-gram `words[i] + " " + ... + words[i+n-1]`, in first-
  * occurrence order.
  *
  * Semantically identical to the composable form
  * `transform(array_distinct(transform(sequence(...),
  * i -> array_join(slice(words, i, n), " "))), poly_hash64)` — n-grams
  * are deduplicated as STRINGS before hashing, exactly like the DuckDB
  * oracle's `list_distinct` — but runs as a single fused pass instead
  * of a tree of interpreted higher-order lambdas allocating an array
  * per element. On the near-dup pipelines (where shingling every
  * document is the map-side cost before any shuffle) this is the
  * difference between the scan being compute-bound and IO-bound.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  /** Shared by eval and generated code. A null word element renders as
    * the empty string (TextFns.words never produces one; this just
    * keeps the expression total). */
  def shingles(words: ArrayData, n: Int): ArrayData = {
    val num = words.numElements()
    if (num < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[Any]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= num - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        val w = words.getUTF8String(i + j)
        if (w != null) sb.append(w.toString)
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) out.add(java.lang.Long.valueOf(PolyHash64.hash(s)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column entry point. */
  def apply(words: Column, n: Int): Column =
    Shim.column(ShingleHashes(Shim.expression(words), n))
}
