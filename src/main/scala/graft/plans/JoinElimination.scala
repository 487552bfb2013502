package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, countDistinct, lit, sum, when}

/** Left-outer join elimination under DECLARED unique keys — the
  * constraint-driven rewrite every warehouse CBO ships (Oracle/Snowflake
  * "join elimination", Postgres `remove_useless_joins`) and Spark lacks:
  *
  *   SELECT fact.*  FROM fact LEFT JOIN dim ON fact.fk = dim.pk
  *
  * is exactly `SELECT fact.*` when dim.pk is UNIQUE — a left join can
  * only drop nothing (outer semantics) and can only duplicate when the
  * right key repeats, so with uniqueness it is row-for-row the left
  * side. The dim scan, its shuffle, and the join all disappear. The
  * BI-tool pattern that hits this constantly: generated SQL joins every
  * dimension in the model, then the user picks columns from one table.
  *
  * Soundness boundary, stated plainly: uniqueness must be DECLARED
  * ([[JoinElimination.declareUnique]]), the `RELY`-constraint semantics
  * — the optimizer trusts the declaration, and a false declaration is
  * the caller's corruption (exactly as in the warehouses). The helper
  * [[JoinElimination.verifyAndDeclareUnique]] checks the data before
  * declaring (one count-distinct scan) for callers who want the audit;
  * it remains a point-in-time check, as any constraint on external
  * files must be.
  *
  * Only the exact sound shape rewrites: LEFT OUTER, every conjunct an
  * equality with one side a declared-unique right column, and no output
  * or downstream reference to ANY right-side column. Everything else is
  * left alone.
  *
  * Scale shape: the win IS the scale story — the eliminated join was a
  * full shuffle of the fact table at 100 TB; the rewrite makes it a
  * no-op regardless of size, and it composes with pruning (the dim is
  * never even read).
  */
object JoinElimination extends Rule[LogicalPlan] {

  /** Declared unique keys: normalized table path -> column names. */
  private val unique = TrieMap.empty[String, Set[String]]

  private def normalize(p: String): String = StatsCbo.normalize(p)

  def declareUnique(path: String, column: String): Unit =
    unique.updateWith(normalize(path)) {
      case Some(s) => Some(s + column)
      case None => Some(Set(column))
    }

  /** Audit-then-declare: one scan verifying no duplicate, no null. */
  def verifyAndDeclareUnique(spark: SparkSession, path: String,
      column: String): Boolean = {
    val r = spark.read.parquet(path).agg(
      count(lit(1)).as("n"), countDistinct(col(column)).as("d"),
      sum(when(col(column).isNull, 1L).otherwise(0L)).as("nulls")).collect()(0)
    val ok = r.getLong(0) == r.getLong(1) && r.getLong(2) == 0L
    if (ok) declareUnique(path, column)
    ok
  }

  def clear(): Unit = unique.clear()
  def isEmpty: Boolean = unique.isEmpty


  /** Idempotent registration on a session built without extensions. */
  def install(s: SparkSession): Unit = synchronized {
    if (!s.experimental.extraOptimizations.contains(JoinElimination))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ JoinElimination
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (isEmpty) return plan
    plan.transformUp {
      // transformUp rewrites the join in place; the guard checks that the
      // PARENT consumed no right-side attribute, which `transformUp`
      // can't see — so match one level up, at the projection that proves
      // right-column-free output. (A bare un-projected join always
      // outputs right columns and is never eliminable.)
      case p @ Project(projectList, Join(left, right, LeftOuter,
          Some(cond), _))
          if onlyLeftRefs(projectList.flatMap(_.references.toSeq), left) &&
            uniqueRightEquiKeys(cond, left, right) =>
        p.copy(child = left)
      // same proof with a residual only-left filter between (a bare
      // Filter over the join is NOT eliminable on its own — its output
      // schema is the join's, and this rule cannot see the consumer)
      case p @ Project(projectList, f @ Filter(fc,
          Join(left, right, LeftOuter, Some(cond), _)))
          if onlyLeftRefs(projectList.flatMap(_.references.toSeq) ++
            fc.references.toSeq, left) &&
            uniqueRightEquiKeys(cond, left, right) =>
        p.copy(child = f.copy(child = left))
    }
  }

  private def onlyLeftRefs(refs: Seq[Expression], left: LogicalPlan): Boolean = {
    val leftIds = left.outputSet
    refs.forall {
      case a: AttributeReference => leftIds.contains(a)
      case _ => false
    }
  }

  /** Every conjunct must be left-attr = right-attr with the right attr a
    * declared-unique column of the right side's scan; at least one
    * conjunct required. (Equality on a SET of columns containing a
    * unique column keeps per-left-row matches <= 1, so extra conjuncts
    * only help.)
    */
  private def uniqueRightEquiKeys(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    val declared = declaredUniqueAttrs(right)
    // each conjunct's right-side attribute, or None if not a clean
    // left-attr = right-attr equality
    val rightKeys = splitConjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) =>
        Some(b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(b) && right.outputSet.contains(a) =>
        Some(a)
      case _ => None
    }
    declared.nonEmpty && rightKeys.forall(_.isDefined) &&
      rightKeys.flatten.exists(r => declared.contains(r.exprId))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Declared-unique columns visible through Project/Filter over a
    * registered scan, resolved to the scan's OWN output attributes and
    * tracked by exprId thereafter — a projection aliasing some other
    * column to the declared name cannot smuggle an impostor in (shared
    * with [[DistinctElimination]]).
    *
    * The scan must read exactly ONE root path: a multi-directory
    * `spark.read.parquet(a, b)` unions files, and a key unique within
    * the declared directory can repeat across the union — matching on
    * `rootPaths.head` alone would eliminate joins/distincts that still
    * deduplicate real rows.
    */
  private[plans] def declaredUniqueAttrs(side: LogicalPlan)
      : Set[org.apache.spark.sql.catalyst.expressions.ExprId] = side match {
    case Project(pl, child) =>
      val below = declaredUniqueAttrs(child)
      pl.collect {
        case a: AttributeReference if below.contains(a.exprId) => a.exprId
      }.toSet
    // a filtered unique column stays unique (subset), and a right-side
    // filter is invisible to an un-consumed left join anyway
    case Filter(_, child) => declaredUniqueAttrs(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.size == 1 =>
        val names = unique.getOrElse(
          normalize(fs.location.rootPaths.head.toString), Set.empty)
        lr.output.collect {
          case a: AttributeReference if names.contains(a.name) => a.exprId
        }.toSet
      case _ => Set.empty
    }
    case _ => Set.empty
  }
}
