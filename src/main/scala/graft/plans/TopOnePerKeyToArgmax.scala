package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the `row_number() = 1` latest-per-key idiom
  * into a max(struct) hash aggregation.
  *
  * The window form shuffles EVERY row and sort-buffers each partition
  * just to keep one row per key; the argmax aggregation collapses to
  * one partial row per key map-side before the shuffle — the rewrite
  * applied by hand in `Medallion.latest` / `Ann.assignPass`, made
  * automatic for any query that writes the natural window idiom. At
  * 100 TB the difference is shuffling |keys| rows instead of sorting
  * |rows|.
  *
  * Equivalence: struct ordering is lexicographic over its fields, so
  * max(struct(sortKeys..., payload...)) picks exactly the rank-1 row of
  * `ORDER BY` when sort keys are tie-free — and under ties, where
  * row_number's pick is partition-order-dependent (nondeterministic),
  * the argmax picks the max payload (deterministic): every result the
  * rewrite returns is one the window form could have returned.
  *
  * Conservative guards — the rewrite fires only when:
  *  - the Window computes exactly ONE function, a `row_number`, and the
  *    Filter is exactly `rn = 1` directly above it;
  *  - partition keys are attributes (non-empty: a global top-1 over an
  *    empty input returns 0 rows, while a global aggregate returns 1);
  *  - every ORDER BY key maps onto max() semantics null-for-null:
  *    DESC NULLS LAST passes through (struct ordering ranks a null
  *    field lowest, exactly NULLS LAST under DESC); ASC NULLS FIRST is
  *    negated, which requires a non-nullable numeric;
  *  - every carried column is of an orderable type (struct max needs a
  *    total order even over payload fields it never reaches).
  */
object TopOnePerKeyToArgmax extends Rule[LogicalPlan] {

  /** ORDER BY key -> struct field whose max() reproduces the window
    * order's first row; None = cannot map safely. ASC keys are negated,
    * which needs overflow-proof arithmetic (ints widen to long, longs
    * to decimal — Long.MinValue negates to itself in wrapping
    * arithmetic and would mis-sort) and no NaN (NaN is its own
    * negation, so negating cannot flip its rank).  */
  private def sortField(so: SortOrder): Option[Expression] = so match {
    case SortOrder(e, Descending, NullsLast, _) => Some(e)
    case SortOrder(e, Ascending, NullsFirst, _) if !e.nullable =>
      e.dataType match {
        case ByteType | ShortType | IntegerType =>
          Some(UnaryMinus(Cast(e, LongType)))
        case LongType =>
          Some(UnaryMinus(Cast(e, DecimalType(20, 0))))
        case _ => None
      }
    case _ => None
  }

  private def isRnEqOne(cond: Expression, rn: Attribute): Boolean =
    cond match {
      case EqualTo(a: AttributeReference, Literal(1, IntegerType)) =>
        a.exprId == rn.exprId
      case EqualTo(Literal(1, IntegerType), a: AttributeReference) =>
        a.exprId == rn.exprId
      case LessThanOrEqual(a: AttributeReference, Literal(1, IntegerType)) =>
        a.exprId == rn.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          part, order, child, _))
        if isRnEqOne(cond, alias.toAttribute) &&
          part.nonEmpty && part.forall(_.isInstanceOf[AttributeReference]) &&
          order.nonEmpty && order.forall(sortField(_).isDefined) &&
          child.output.forall(a => RowOrdering.isOrderable(a.dataType)) =>
      val partAttrs = part.map(_.asInstanceOf[AttributeReference])
      // InferWindowGroupLimit may have planted a WindowGroupLimit
      // below the Window: a per-partition top-1 pre-filter that SORTS
      // each partition. The hash aggregate replaces it with an O(1)
      // running max per key, so drop it rather than aggregate its
      // sorted output.
      val base = child match {
        case WindowGroupLimit(p, o, _, 1, grandchild)
            if p == part && o == order => grandchild
        case other => other
      }
      val payload = base.output.filterNot(a =>
        partAttrs.exists(_.exprId == a.exprId))
      val fields: Seq[Expression] =
        order.map(sortField(_).get) ++ payload
      val structExpr = CreateNamedStruct(
        fields.zipWithIndex.flatMap { case (e, i) =>
          Seq(Literal(s"f$i"), e)
        })
      val maxAlias = Alias(Max(structExpr).toAggregateExpression(),
        "__argmax")()
      val agg = Aggregate(partAttrs, partAttrs :+ maxAlias, base)
      val maxRef = maxAlias.toAttribute
      val nSort = order.size
      val restored: Seq[NamedExpression] = base.output.map { a =>
        if (partAttrs.exists(_.exprId == a.exprId)) a
        else {
          val idx = nSort + payload.indexWhere(_.exprId == a.exprId)
          Alias(GetStructField(maxRef, idx, Some(s"f$idx")), a.name)(
            exprId = a.exprId)
        }
      } :+ Alias(Literal(1, IntegerType), alias.name)(
        exprId = alias.exprId)
      Project(restored, agg)
  }
}
