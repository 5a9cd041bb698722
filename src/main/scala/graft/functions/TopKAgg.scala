package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference,
  Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StructType}

/** Bounded top-k aggregate: keeps the k LARGEST input structs (by the
  * struct's natural field-by-field ascending ordering — encode a
  * descending field by negating it at the call site) and evaluates to
  * an array of them, sorted descending. Equivalently: the first k rows
  * under `ORDER BY f1 DESC, f2 DESC, ...`. A non-negatable tiebreak
  * field (a string term, a date) that must rank ASCENDING is flipped
  * with `asc` instead: `asc(i) = true` makes the output order for
  * field i `ASC` — `topK(struct(score, term), 5, asc = Seq(false,
  * true))` is `ORDER BY score DESC, term ASC LIMIT 5` per group.
  *
  * This is the scale-path replacement for top-k-per-key via
  * `row_number` windows: a window must shuffle and sort EVERY row of
  * every key; this aggregate is a `TypedImperativeAggregate`, so each
  * map task keeps one k-bounded heap per key and the shuffle carries at
  * most k rows per key per task — the partial/final combine the window
  * can never do. At 100 TB with millions of rows per key and k=3, the
  * shuffle shrinks by |rows| / (k * tasks-per-key).
  *
  * The heap stores copied UnsafeRows; serialization between partial and
  * final aggregation is length-prefixed UnsafeRow bytes.
  */
case class TopKAgg(child: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0,
    asc: Seq[Boolean] = Nil)
  extends TypedImperativeAggregate[mutable.PriorityQueue[UnsafeRow]] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  // Reject misuse at analysis time: a non-struct input (or non-literal
  // k) would otherwise surface as a ClassCastException mid-execution.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType =>
      if (asc.nonEmpty && asc.size != st.size)
        TypeCheckResult.TypeCheckFailure(
          s"topk asc flags (${asc.size}) must match struct arity (${st.size})")
      else kExpr.dataType match {
        case IntegerType | LongType if kExpr.foldable =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "topk k must be an integer literal, got " +
            s"${kExpr.dataType.catalogString}")
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk expects a struct input (pack sort fields with struct(...)), " +
        s"got ${other.catalogString}")
  }

  lazy val k: Int = {
    require(kExpr.foldable, "topk k must be a literal")
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"topk k must be positive, got $v")
    v
  }

  /** Field-by-field struct ordering, null-safe. An `asc(i)` field is
    * compared DESCENDING here, so "kept = largest, output = reverse"
    * ranks it ascending in the result — the direction flip lives in
    * one place. The comparator is CODEGEN'd (GenerateOrdering, with
    * the interpreted ordering as the standard fallback): every heap
    * insert on the scan side runs one compare, so an interpreted
    * per-field loop was the measured bulk of the heap's per-row
    * overhead in the round-8 hot-term probe. */
  private lazy val rowOrdering: Ordering[UnsafeRow] = {
    val orders = structType.fields.zipWithIndex.map {
      case (f, i) => SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (asc.nonEmpty && asc(i)) Descending else Ascending)
    }.toSeq
    // NonFatal only: an OutOfMemoryError/LinkageError must propagate,
    // not silently downgrade every compare to the interpreted path
    val base =
      try org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateOrdering.generate(orders)
      catch {
        case scala.util.control.NonFatal(_) => new InterpretedOrdering(orders)
      }
    (a: UnsafeRow, b: UnsafeRow) => base.compare(a, b)
  }

  private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): mutable.PriorityQueue[UnsafeRow] =
    // scala's PriorityQueue dequeues the MAX of its ordering; reversed,
    // the head is the SMALLEST kept row — the eviction candidate
    mutable.PriorityQueue.empty[UnsafeRow](rowOrdering.reverse)

  override def update(heap: mutable.PriorityQueue[UnsafeRow],
      input: InternalRow): mutable.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) insert(heap, toUnsafe(v.asInstanceOf[InternalRow]).copy())
    heap
  }

  override def merge(heap: mutable.PriorityQueue[UnsafeRow],
      other: mutable.PriorityQueue[UnsafeRow])
      : mutable.PriorityQueue[UnsafeRow] = {
    other.foreach(insert(heap, _))
    heap
  }

  private def insert(heap: mutable.PriorityQueue[UnsafeRow],
      row: UnsafeRow): Unit =
    if (heap.size < k) heap.enqueue(row)
    else if (rowOrdering.compare(row, heap.head) > 0) {
      heap.dequeue()
      heap.enqueue(row)
    }

  override def eval(heap: mutable.PriorityQueue[UnsafeRow]): Any =
    new GenericArrayData(
      heap.toArray.sorted(rowOrdering.reverse).map(_.asInstanceOf[Any]))

  override def serialize(heap: mutable.PriorityQueue[UnsafeRow])
      : Array[Byte] = {
    val rows = heap.toArray
    val total = 4 + rows.map(4 + _.getSizeInBytes).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(rows.length)
    rows.foreach { r =>
      buf.putInt(r.getSizeInBytes)
      r.writeTo(buf)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[UnsafeRow] = {
    val heap = createAggregationBuffer()
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val rowBytes = new Array[Byte](len)
      buf.get(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, len)
      heap.enqueue(row)
      i += 1
    }
    heap
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk"
  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
}

object TopKAgg {
  /** topK(struct(...), k): array of the k largest structs, descending.
    * Encode a descending sort field by negating it in the struct. */
  def topK(packed: Column, k: Int): Column =
    Shim.column(TopKAgg(Shim.expression(packed),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())

  /** topK with per-field output direction: `asc(i) = true` ranks field
    * i ascending — for tiebreak fields that cannot be negated (strings,
    * dates). `ORDER BY f1 [asc(0)], f2 [asc(1)], ... LIMIT k`. */
  def topK(packed: Column, k: Int, asc: Seq[Boolean]): Column =
    Shim.column(TopKAgg(Shim.expression(packed),
      org.apache.spark.sql.catalyst.expressions.Literal(k), asc = asc)
      .toAggregateExpression())
}
