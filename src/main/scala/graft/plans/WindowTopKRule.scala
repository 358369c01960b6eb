package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the `row_number() OVER (PARTITION BY p
  * ORDER BY o) <= k` idiom into [[TopKPerGroupPlan]].
  *
  * Spark's own InferWindowGroupLimit already prunes rows that cannot
  * rank ≤ k, but it still sorts every surviving group and evaluates
  * the full window machinery to materialize the rank column. When the
  * query immediately drops that column (the overwhelmingly common
  * shape), the rank values are dead — the custom operator computes the
  * same multiset with bounded heaps and no sort (~2× on the bench).
  *
  * Guards: exactly one window expression, it is row_number with the
  * standard unbounded-preceding→current-row frame, the filter compares
  * the rank attribute to an integer literal, and the enclosing Project
  * does not reference the rank — so the rewrite never changes
  * observable results for a total ORDER BY (for non-total orders both
  * forms are tie-arbitrary).
  */
object WindowTopKRule extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def isRowNumberWindow(e: NamedExpression): Option[Alias] = e match {
    case a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) => Some(a)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(plist,
        Filter(cond, Window(Seq(we), part, order, wchild, _)))
        if order.nonEmpty && part.nonEmpty => // ClusteredDistribution(Nil) would crash planning
      isRowNumberWindow(we) match {
        case Some(alias) =>
          val rn = alias.toAttribute
          val usesRn = plist.exists(_.references.contains(rn))
          limitOf(cond, rn) match {
            case Some(k) if k >= 1 && !usesRn =>
              // Spark may have slid a WindowGroupLimit underneath; the
              // TopK operator subsumes it
              val child = wchild match {
                case wgl: WindowGroupLimit => wgl.child
                case other => other
              }
              Project(plist, TopKPerGroupPlan(k, part, order, child))
            case _ => p
          }
        case None => p
      }
  }
}
