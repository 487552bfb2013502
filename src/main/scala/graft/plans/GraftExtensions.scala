package graft.plans

import graft.functions.{CosineSim, CosineSimPreNorm, L2Norm}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Engine-provided Catalyst extensions, installed with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Currently one optimizer rule: [[HoistCosineNorm]]. The serving-style
  * similarity query — `cosine_sim(embedding, <literal query vector>)` over a
  * corpus scan — recomputes the constant query-side norm √(Σ q_i²) for every
  * row. The rule folds that norm ONCE at optimization time and rewrites to
  * [[CosineSimPreNorm]], the same hoisting the curated x06/x07 queries do by
  * hand via the broadcast query side — but automatic, so ad-hoc user SQL
  * gets the optimized kernel too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => HoistCosineNorm)
    ext.injectOptimizerRule(_ => StatsBroadcastJoin)
    ext.injectOptimizerRule(_ => JoinElimination)
    ext.injectOptimizerRule(_ => DistinctElimination)
    ext.injectPlannerStrategy(_ => GroupedTopKStrategy)
  }
}

object HoistCosineNorm extends Rule[LogicalPlan] {
  // cosine is symmetric and IEEE multiplication commutes, so swapping the
  // arguments to put the constant on the prenorm side is bit-preserving
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b) if b.foldable => hoist(a, b)
      case CosineSim(a, b) if a.foldable => hoist(b, a)
    }

  /** Rewrite cosine(varying, constant): fold the constant side's norm once
    * via the existing native kernel — identical arithmetic to the per-row
    * path, so results are unchanged.
    */
  private def hoist(varying: Expression, constant: Expression): Expression = {
    val cVal = constant.eval()
    if (cVal == null) CosineSim(varying, constant)
    else {
      val norm = L2Norm(Literal.create(cVal, constant.dataType)).eval()
      CosineSimPreNorm(varying, constant, Literal(norm, DoubleType))
    }
  }
}
