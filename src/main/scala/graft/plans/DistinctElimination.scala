package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** DISTINCT elimination under declared-unique keys — the sibling of
  * [[JoinElimination]], sharing its RELY-declaration registry:
  *
  *   SELECT DISTINCT pk, x, y FROM t
  *
  * is exactly `SELECT pk, x, y` when pk is unique — every row already
  * differs on pk, so the grouping hash (a full shuffle of the
  * projected data at 100 TB) computes nothing. The generated-SQL shape
  * again: BI layers bolt DISTINCT onto everything defensively, and the
  * warehouse CBOs strip it from key-covering selections.
  *
  * Scope, deliberately narrow to stay sound: a grouping-only Aggregate
  * (every aggregate expression is a grouping column or an alias of
  * one — the `df.distinct()` / `SELECT DISTINCT` shape, no aggregate
  * functions), whose grouping set contains a bare attribute that is a
  * declared-unique column of the (possibly projected/filtered) scan
  * below. Filters below only SHRINK the set (a unique column's subset
  * stays unique), and a projection must carry the column as a bare
  * attribute (no expression could manufacture collisions from a
  * non-bijective rewrite). The rewrite replaces the Aggregate with a
  * Project of the same output, preserving attribute ids — invisible to
  * every consumer.
  *
  * Soundness relies on the declaration exactly as [[JoinElimination]]
  * does; [[JoinElimination.verifyAndDeclareUnique]] is the audited
  * entry for both.
  */
object DistinctElimination extends Rule[LogicalPlan] {

  def install(s: SparkSession): Unit = synchronized {
    if (!s.experimental.extraOptimizations.contains(DistinctElimination))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ DistinctElimination
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (JoinElimination.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate
          if isDistinctShape(agg.groupingExpressions,
            agg.aggregateExpressions) &&
            agg.groupingExpressions.exists {
              case a: AttributeReference =>
                JoinElimination.declaredUniqueAttrs(agg.child)
                  .contains(a.exprId)
              case _ => false
            } =>
        Project(agg.aggregateExpressions, agg.child)
    }
  }

  /** The `SELECT DISTINCT` shape: every output is a grouping attribute
    * (or an alias of one) and none is an aggregate function call.
    */
  private def isDistinctShape(grouping: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      aggExprs: Seq[NamedExpression]): Boolean = {
    val groupSet = grouping.collect { case a: AttributeReference => a.exprId }.toSet
    grouping.nonEmpty && grouping.forall(_.isInstanceOf[AttributeReference]) &&
      aggExprs.forall {
        case a: AttributeReference => groupSet.contains(a.exprId)
        case Alias(a: AttributeReference, _) => groupSet.contains(a.exprId)
        case _ => false
      }
  }

}
