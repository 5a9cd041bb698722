package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Ordered product of per-feature bucket ratios — the importance-weight
  * kernel of DSIR-style domain resampling (Xie et al. 2023, public
  * knowledge): for token array `t_1..t_n` and a per-bucket
  * probability-ratio table `r` of size D,
  *
  *   weight = Π_i r[h(t_i) mod D]  ·  Π_i r[h(t_i + " " + t_{i+1}) mod D]
  *
  * multiplied LEFT TO RIGHT, unigrams first then bigrams — the exact
  * fold order a seedless `list_reduce((a,b) -> a*b)` replays, and IEEE
  * multiplication is deterministic, so any engine reproduces the double
  * bit-for-bit (including a long hostile document underflowing to +0.0
  * or overflowing to +Inf — both IEEE-specified, both reproduced).
  * `h` is [[PolyHash64]], the engine-neutral hash the shingle and
  * classifier oracles already mirror in DuckDB SQL.
  *
  * Same execution shape as [[HashedNgramScore]] (the additive sibling):
  * the ratio table rides as a plan reference object — never a join,
  * never a shuffle — and the generated code is ONE static call with
  * runtime loops (the [[LshBucketHash]] lesson: per-feature unrolling
  * blows the JVM huge-method JIT limit). Ratios are held as an
  * immutable Seq so two semantically equal expressions compare equal
  * (array-typed case-class fields break semanticEquals by comparing
  * by reference).
  *
  * Empty token arrays weigh 1.0 (empty product); NULL input propagates
  * NULL (standard UnaryExpression null handling).
  */
case class HashedNgramProduct(child: Expression, ratios: Seq[Double])
  extends UnaryExpression {

  require(ratios.nonEmpty,
    "hashed_ngram_product: ratio table must be non-empty (mod-0 bucket)")

  @transient private lazy val ratioArr: Array[Double] = ratios.toArray

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_ngram_product"

  override protected def nullSafeEval(input: Any): Any =
    HashedNgramProduct.product(input.asInstanceOf[ArrayData], ratioArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.addReferenceObj("ngramRatios", ratioArr, "double[]")
      s"${ev.value} = graft.functions.HashedNgramProduct.product($v, $r);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedNgramProduct {

  /** JVM-side kernel shared by eval and the generated code: ordered
    * unigram pass, then ordered bigram pass, multiplying into an
    * accumulator seeded with 1.0 (IEEE `1.0 * x == x`, so this equals
    * the seedless first-element fold). */
  def product(tokens: ArrayData, ratios: Array[Double]): Double = {
    val n = tokens.numElements()
    val dim = ratios.length
    var prod = 1.0
    var i = 0
    while (i < n) {
      prod *= ratios((PolyHash64.hash(tokens.getUTF8String(i).toString)
        % dim).toInt)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      val bg = tokens.getUTF8String(i).toString + " " +
        tokens.getUTF8String(i + 1).toString
      prod *= ratios((PolyHash64.hash(bg) % dim).toInt)
      i += 1
    }
    prod
  }

  /** Column entry point over a token array column. */
  def apply(tokens: Column, ratios: Seq[Double]): Column =
    Shim.column(HashedNgramProduct(Shim.expression(tokens), ratios))
}
