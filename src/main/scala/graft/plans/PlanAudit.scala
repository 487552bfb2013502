package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan lint — the engine's own review checklist, mechanized.
  * Every rule here is a check this repo's plan-shape specs apply by hand
  * (and the build prompt demands): PlanAudit walks an executed plan once
  * and reports the anti-patterns that matter at 100 TB, so a pipeline
  * can gate on `audit.findings.isEmpty` the way it gates on row counts.
  *
  * Checks (each a named finding with the offending node's simpleString):
  *  - `cartesian`: CartesianProduct / BroadcastNestedLoopJoin — the
  *    quadratic join shapes; at scale these are outages, not queries.
  *  - `unpruned-scan`: a parquet scan reading every column of a wide
  *    (> threshold columns) schema — column pruning failed or the query
  *    genuinely needs everything; either way the reviewer looks.
  *  - `unpushed-filter`: a Filter sitting DIRECTLY on a file scan whose
  *    pushed-filter list is empty while the filter references scan
  *    columns — predicate pushdown was lost (expression not
  *    convertible, or a casting bug upstream).
  *  - `single-partition-exchange`: an exchange collapsing to ONE
  *    partition (global window / global sort shapes) — the
  *    WindowExec-warning case made visible next to everything else.
  *
  * The audit is advisory and read-only: it never mutates the plan, and
  * "findings" are starting points for a human, not errors (x98's
  * curriculum sort is a LEGITIMATE single-partition fold, and says so in
  * its scaladoc — the audit is how the next x98 gets noticed and made to
  * justify itself).
  */
object PlanAudit {

  final case class Finding(rule: String, node: String)
  final case class Report(findings: Seq[Finding]) {
    def byRule(rule: String): Seq[Finding] = findings.filter(_.rule == rule)
    def isClean: Boolean = findings.isEmpty
  }

  val WideScanColumns = 10

  def audit(df: DataFrame): Report = audit(df.queryExecution.executedPlan)

  /** Every physical node, descending through AQE / query-stage wrappers
    * (the SparkSpec.allPlanNodes unwrap, duplicated here because the
    * audit is main-scope and the spec helper is test-scope).
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => Nil
    }
    p +: (p.children ++ nested).flatMap(allNodes)
  }

  /** The file scan feeding a node, looking through the row-format and
    * codegen adapters Spark inserts between a vectorized parquet scan
    * and its consumer.
    */
  private def scanBelow(p: SparkPlan): Option[FileSourceScanExec] = p match {
    case s: FileSourceScanExec => Some(s)
    case c: ColumnarToRowExec => scanBelow(c.child)
    case i: InputAdapter => scanBelow(i.child)
    case w: WholeStageCodegenExec => scanBelow(w.child)
    case _ => None
  }

  /** True when the pushed-filter list carries no selective predicate —
    * empty, or only the IsNotNull entries Catalyst derives from any
    * null-intolerant expression (pushing JUST those means the real
    * predicate stayed behind).
    */
  private def onlyTrivialPushed(pushed: String): Boolean =
    splitTopLevel(pushed.stripPrefix("[").stripSuffix("]"))
      .forall(_.startsWith("IsNotNull"))

  /** Split a rendered filter list on TOP-LEVEL commas only: an entry like
    * `In(x, [1,2,3])` contains commas inside its own brackets, and a
    * naive split would mis-tokenize it into fragments that don't start
    * with `IsNotNull` — making the lint silently unreliable for IN
    * predicates (a pushed IN would read as a non-trivial push even when
    * it is the scan's only entry, and vice versa fragments of it would).
    */
  private[plans] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case c @ ('(' | '[') => depth += 1; cur += c
      case c @ (')' | ']') => depth -= 1; cur += c
      case ',' if depth == 0 =>
        val t = cur.result().trim; if (t.nonEmpty) out += t; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** True when either side of a nested-loop join is PROVABLY at most a
    * handful of rows: a grouping-free (global) aggregate is exactly one
    * row, a LocalTableScan carries its literal rows, and a LIMIT bounds
    * its child. The registry's pervasive `crossJoin(broadcast(bound))`
    * idiom — a 1-row min/max/count bound fanned onto a fact scan — is a
    * constant-space broadcast, not a quadratic join, and flagging it
    * buried the real findings in 50 false positives (observed when the
    * audit first ran registry-wide in round 9).
    */
  private def singleRowSide(j: BroadcastNestedLoopJoinExec): Boolean = {
    def tiny(p: SparkPlan): Boolean = p match {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
        a.groupingExpressions.isEmpty
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
        a.groupingExpressions.isEmpty
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
        a.groupingExpressions.isEmpty
      case l: LocalTableScanExec => l.rows.length <= 100
      case l: org.apache.spark.sql.execution.LocalLimitExec => true
      case l: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _ if p.children.size == 1 => tiny(p.children.head)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => tiny(q.plan)
      case _ => false
    }
    tiny(j.left) || tiny(j.right)
  }

  def audit(plan: SparkPlan): Report = {
    val nodes = allNodes(plan)
    val out = Seq.newBuilder[Finding]

    nodes.foreach {
      case c: CartesianProductExec =>
        out += Finding("cartesian", c.simpleString(120))
      case j: BroadcastNestedLoopJoinExec if !singleRowSide(j) =>
        out += Finding("cartesian", j.simpleString(120))
      case s: FileSourceScanExec
          if s.output.length >= WideScanColumns &&
            s.relation.dataSchema.length == s.output.length =>
        out += Finding("unpruned-scan", s.simpleString(120))
      case f: FilterExec => scanBelow(f.child) match {
        case Some(s) if s.metadata.get("PushedFilters")
              .exists(onlyTrivialPushed) && f.condition.references.nonEmpty =>
          out += Finding("unpushed-filter", f.simpleString(120))
        case _ =>
      }
      case e: ShuffleExchangeLike if e.outputPartitioning.numPartitions == 1 =>
        out += Finding("single-partition-exchange", e.simpleString(120))
      case _ =>
    }

    Report(out.result().distinct)
  }
}
