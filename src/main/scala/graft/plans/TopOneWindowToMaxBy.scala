package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `row_number() OVER (PARTITION BY p ORDER BY o) = 1`
  * filters — the universal "latest state per key" read (reference semantics:
  * newest HBase cell version wins) — rewrite to a `max_by`/`min_by`
  * aggregate.
  *
  * Why: the window formulation sorts every partition (full shuffle + sort,
  * state proportional to ALL versions); the aggregate formulation
  * partial-aggregates map-side, so the shuffle carries one row per key per
  * input partition and nothing sorts. At 100 TB of versioned cells this is
  * the difference between a sort of the table and a streaming fold over it.
  * (Spark's InferWindowGroupLimit trims the sort input; this removes the
  * sort entirely.)
  *
  * Guards: single row_number window expression; rank used only as `= 1`
  * (or `<= 1`) in the Filter; order keys all-ascending (→ min_by) or
  * all-descending (→ max_by) with default null ordering — struct-comparison
  * null semantics then coincide with the SortOrder semantics.
  *
  * All payload columns extract from ONE max_by(struct(...)) so tied order
  * keys cannot mix columns from different rows (per-column max_by would).
  */
object TopOneWindowToMaxBy extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, None, w).getOrElse(f)
    case f @ Filter(cond, p @ Project(_, w: Window)) =>
      rewrite(cond, Some(p), w).getOrElse(f)
  }

  private def rankOf(cond: Expression): Option[ExprId] = cond match {
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) => Some(a.exprId)
    case EqualTo(IntegerLiteral(1), a: AttributeReference) => Some(a.exprId)
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(1)) => Some(a.exprId)
    case _ => None
  }

  private def frameOk(frame: WindowFrame): Boolean = frame match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case UnspecifiedFrame => true
    case _ => false
  }

  private def rewrite(cond: Expression, proj: Option[Project], w: Window): Option[LogicalPlan] =
    (rankOf(cond), w.windowExpressions) match {
      case (Some(rankId),
            Seq(a @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(ps, os, frame)), _)))
          if a.exprId == rankId && frameOk(frame) && os.nonEmpty &&
            os.forall(_.child.deterministic) && ps.forall(_.deterministic) =>
        val allAsc = os.forall(o => o.direction == Ascending && o.nullOrdering == NullsFirst)
        val allDesc = os.forall(o => o.direction == Descending && o.nullOrdering == NullsLast)
        if (!allAsc && !allDesc) None
        else {
          // Spark's InferWindowGroupLimit may already have wrapped the child;
          // the aggregate subsumes it (the picked row survives the limit),
          // so strip it and let the plain child feed the fold.
          val aggChild = w.child match {
            case WindowGroupLimit(_, _, _, _, c) => c
            case c => c
          }
          val payload = aggChild.output
          val rowStruct = CreateStruct(payload)
          // max_by/min_by skip rows whose order key is NULL, but
          // row_number()=1 still returns a real row when a partition's key
          // is null on every row. Wrapping the keys in a struct behind a
          // non-null discriminator makes the aggregate's key total: struct
          // field comparison sorts null smallest, which coincides with the
          // guarded Asc-NullsFirst / Desc-NullsLast window orderings.
          val keyExpr = CreateStruct(Literal(1) +: os.map(_.child))
          val pick =
            (if (allDesc) MaxBy(rowStruct, keyExpr) else MinBy(rowStruct, keyExpr))
              .toAggregateExpression()
          val extracted = payload.zipWithIndex.map { case (attr, i) =>
            Alias(GetStructField(pick, i, Some(attr.name)), attr.name)(exprId = attr.exprId)
          }
          val rankOut = Alias(Literal(1), a.name)(exprId = a.exprId)
          val agg = Aggregate(ps, extracted :+ rankOut, aggChild)
          Some(proj.map(p => Project(p.projectList, agg)).getOrElse(agg))
        }
      case _ => None
    }
}
