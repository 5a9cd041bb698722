package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns — no UDFs, no
  * linalg deps. Elements are cast to double before arithmetic so
  * results are bit-identical to any engine computing a sequential
  * left-fold (the DuckDB oracle's list_dot_product included).
  */
object VectorFns {

  /** Element-wise product sum (dot product), sequential left fold —
    * the native codegen'd expression (graft.functions.DotProduct);
    * identical summation order to the HOF fold it replaced. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct(a, b)

  /** The interpreted HOF fold (kept as the reference semantics the
    * native expression is property-tested against). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalized copy of `v` (`normCol` must be the precomputed
    * [[norm]] column — passing it avoids re-folding the norm per
    * element). Pairwise cosine then reduces to a single [[dot]]: the
    * n-vs-n² split that matters when pairs are numerous. */
  def normalized(v: Column, normCol: Column): Column =
    transform(v, x => x.cast("double") / normCol)
}
