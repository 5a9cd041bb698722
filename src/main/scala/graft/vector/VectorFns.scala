package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns using
  * higher-order functions only — codegen'd, no UDFs, no linalg deps.
  * Elements are cast to double before arithmetic so results are
  * bit-identical to any engine computing a sequential left-fold
  * (the DuckDB oracle's list_dot_product included).
  */
object VectorFns {

  /** Element-wise product sum (dot product), sequential left fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
