package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All multi-table hyperplane bucket ids of one vector in ONE native
  * expression: for table t, bucket = `t·2^m + Σ_j (v·w_{t,j} > 0)·2^j`
  * over a precomputed flat weight matrix.
  *
  * Why this exists — measured, not aesthetic: the previous
  * composition built the same buckets from 8–11 [[DotProduct]]s per
  * table as separate Catalyst expressions, each unrolling its own
  * loop into the ONE generated consume method. At the production
  * plane counts the method exceeded the JVM's huge-method JIT limit,
  * so the whole stage ran in the BYTECODE interpreter:
  * `HashProfile` timed the 11-plane hashing of 50k vectors at 37.5 s
  * with whole-stage codegen ON vs 1.0 s with it OFF — codegen 37x
  * SLOWER than Catalyst's interpreted mode, ~2700x the arithmetic
  * cost, and the single serialization point that kept s02 from
  * scaling with cores on the fed 100x corpus (cores_probe_100x
  * speedup 1.02). One expression with RUNTIME loops over a
  * `ctx.addReferenceObj` weight matrix keeps the generated code a
  * few dozen bytecodes for ANY plane count — JIT-hot, and the same
  * left-to-right per-plane summation as DotProduct, so buckets (and
  * every oracle) are bit-identical.
  *
  * Length contract (faithful to the composition it replaces): a
  * vector whose length differs from `dim` yields sign bit 0 for every
  * plane — `when(null > 0, ..)` took the otherwise-branch — so each
  * table contributes its base id `t·2^m`.
  *
  * NULL contract (a DELIBERATE change from the composition): a NULL
  * embedding yields NULL (standard `UnaryExpression` null
  * propagation), so the downstream `explode` drops the row from
  * candidate generation entirely. The old DotProduct+when fold instead
  * emitted the base-id bucket array for NULL vectors, which filed
  * every NULL embedding into the SAME `nTables` buckets — at corpus
  * scale that is a synthetic mega-bucket of garbage rows the occupancy
  * cap then has to absorb. Dropping NULL vectors from near-dup/ANN
  * candidacy is the semantics a corpus pipeline wants (a row with no
  * embedding cannot be anyone's neighbor); callers that must surface
  * them should filter `isNull` explicitly before hashing.
  *
  * @param weights flat `[table][plane][dim]` hyperplane matrix
  */
case class LshBucketHash(child: Expression, weights: Array[Double],
    nTables: Int, planes: Int, dim: Int)
  extends UnaryExpression {

  require(weights.length == nTables * planes * dim,
    s"weight matrix ${weights.length} != $nTables*$planes*$dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val ok = v.numElements() == dim
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var acc = t.toLong << planes
      if (ok) {
        var j = 0
        while (j < planes) {
          var s = 0.0
          val off = (t * planes + j) * dim
          var i = 0
          while (i < dim) {
            s += v.getDouble(i) * weights(off + i)
            i += 1
          }
          if (s > 0) acc += (1L << j)
          j += 1
        }
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val w = ctx.addReferenceObj("lshWeights", weights, "double[]")
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      s"""
        boolean $ok = $v.numElements() == $dim;
        long[] $out = new long[$nTables];
        for (int $t = 0; $t < $nTables; $t++) {
          long $acc = ((long) $t) << $planes;
          if ($ok) {
            for (int $j = 0; $j < $planes; $j++) {
              double $s = 0.0;
              int $off = ($t * $planes + $j) * $dim;
              for (int $i = 0; $i < $dim; $i++) {
                $s += $v.getDouble($i) * $w[$off + $i];
              }
              if ($s > 0) $acc += (1L << $j);
            }
          }
          $out[$t] = $acc;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketHash {
  /** Column entry point; casts the vector to array<double> once. */
  def apply(v: Column, weights: Array[Double], nTables: Int, planes: Int,
      dim: Int): Column =
    Shim.column(LshBucketHash(
      Shim.expression(v.cast("array<double>")), weights, nTables, planes, dim))
}
