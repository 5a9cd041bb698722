package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch over a string column: a bounded map
  * of `capacity` counters whose partials merge associatively, so the
  * whole aggregation is one map-side-combined pass — the way to ask
  * "what are the dominant terms/keys" of a 100 TB column without a
  * full (value, count) shuffle.
  *
  * Guarantees (classic MG): every item with true frequency
  * > N / (capacity+1) is present in the sketch, and each reported
  * count is an UNDERestimate by at most N / (capacity+1). Results
  * depend on encounter order only for items near the threshold; the
  * guaranteed heavy items always surface. Approximate by nature, so
  * it is spec-bounded (like the HLL layer), not oracle-hashed.
  *
  * Buffer serialization: [n][len item-bytes count]*.
  */
case class HeavyHittersAgg(child: Expression, capExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  // Reject misuse at analysis time (a non-string item column would
  // otherwise ClassCastException deep inside execution).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      capExpr.dataType match {
        case IntegerType | LongType if capExpr.foldable =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "heavy_hitters capacity must be an integer literal, got " +
            s"${capExpr.dataType.catalogString}")
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters expects a string item column, got ${other.catalogString}")
  }

  lazy val capacity: Int = {
    require(capExpr.foldable, "heavy_hitters capacity must be a literal")
    val v = capExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"heavy_hitters capacity must be positive, got $v")
    v
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(m: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(m, v.asInstanceOf[UTF8String].toString, 1L)
    m
  }

  override def merge(m: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    // summed counts, then one collective decrement by the (cap+1)-th
    // largest — the standard mergeable-MG reduction
    other.foreach { case (k, c) => m.updateWith(k) {
      case Some(c0) => Some(c0 + c)
      case None => Some(c)
    }}
    if (m.size > capacity) {
      val cut = m.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = m.collect { case (k, c) if c - cut <= 0 => k }.toSeq
      m.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(m.remove)
    }
    m
  }

  private def add(m: mutable.HashMap[String, Long], item: String,
      by: Long): Unit =
    if (m.contains(item) || m.size < capacity)
      m.update(item, m.getOrElse(item, 0L) + by)
    else {
      // decrement-all step; drop zeros to free counters
      val dead = m.collect { case (k, 1L) => k }.toSeq
      m.mapValuesInPlace((_, c) => c - 1)
      dead.foreach(m.remove)
    }

  override def eval(m: mutable.HashMap[String, Long]): Any = {
    val rows = m.toArray.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) => InternalRow(UTF8String.fromString(k), c) }
    new GenericArrayData(rows.map(_.asInstanceOf[Any]))
  }

  override def serialize(m: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = m.toArray
    val encoded = items.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c) }
    val total = 4 + encoded.map { case (b, _) => 4 + b.length + 8 }.sum
    val buf = java.nio.ByteBuffer.allocate(total)
    buf.putInt(encoded.length)
    encoded.foreach { case (b, c) =>
      buf.putInt(b.length); buf.put(b); buf.putLong(c)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val m = createAggregationBuffer()
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val b = new Array[Byte](len)
      buf.get(b)
      m.update(new String(b, StandardCharsets.UTF_8), buf.getLong)
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"
  override def children: Seq[Expression] = Seq(child, capExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren(0), capExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
}

object HeavyHittersAgg {
  /** heavyHitters(col, capacity): array<struct<item,count>> sorted by
    * (estimated) count descending. Counts are lower bounds; items with
    * frequency > N/(capacity+1) are guaranteed present. */
  def heavyHitters(item: Column, capacity: Int): Column =
    Shim.column(HeavyHittersAgg(Shim.expression(item),
      org.apache.spark.sql.catalyst.expressions.Literal(capacity))
      .toAggregateExpression())
}
