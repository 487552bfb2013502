package graft.observe

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine-side query telemetry — the analytics-engine counterpart of the
  * pipeline's run-history table (`RunAnalytics`). The reference monitors its
  * pipeline through SQL over the Airflow metadata DB
  * (grafana/provisioning/dashboards/msconvert.json); this listener gives the
  * same observability to every DataFrame/SQL action the engine executes:
  * duration, output rows, scan rows, shuffle volume, captured from the
  * finalized physical plan's SQL metrics and queryable as a DataFrame.
  *
  * Driver-side state is one small record per completed query — safe for a
  * long-running session; `drain()` hands the buffer to a table writer for
  * durable history (the RunAnalytics pattern).
  */
final case class QueryMetric(
    action: String,
    durationMs: Long,
    outputRows: Long,
    scanRows: Long,
    shuffleBytes: Long,
    failed: Boolean,
    ts: Timestamp)

final class MetricsListener extends QueryExecutionListener {

  private val buf = new ConcurrentLinkedQueue[QueryMetric]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    buf.add(capture(funcName, qe, durationNs, failed = false))

  override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
    // qe.executedPlan is a lazy val that RETHROWS when the query died during
    // planning — a failed record must still be emitted (the listener bus
    // would swallow the rethrow and drop the event entirely)
    buf.add(
      try capture(funcName, qe, 0L, failed = true)
      catch {
        // Throwable: the lazy val rethrows whatever killed planning,
        // Exception or Error — either way the failed record must survive
        case _: Throwable =>
          QueryMetric(funcName, 0L, 0L, 0L, 0L, failed = true,
            new Timestamp(System.currentTimeMillis()))
      })

  private def capture(
      funcName: String, qe: QueryExecution, durationNs: Long, failed: Boolean): QueryMetric = {
    // walk the finalized plan — into adaptive sub-stages AND expression-held
    // subquery plans (scalar/uncorrelated subqueries hang off expressions,
    // not children) — and sum SQL metrics
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ nested ++ p.subqueries).flatMap(nodes)
    }
    // adaptive wrapper nodes carry no metrics of their own: unwrap to the
    // finalized root before reading the action's output-row count
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        unwrap(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => unwrap(q.plan)
      case other => other
    }
    val all = nodes(qe.executedPlan)
    def sumMetric(pred: org.apache.spark.sql.execution.SparkPlan => Boolean,
        key: String): Long =
      all.filter(pred).flatMap(_.metrics.get(key)).map(_.value).sum
    // the action's own row count = the topmost node that tracks one (the
    // plan root is often a metric-less wrapper: AQE node, WholeStageCodegen)
    val out = nodes(unwrap(qe.executedPlan))
      .find(_.metrics.contains("numOutputRows"))
      .map(_.metrics("numOutputRows").value)
      .getOrElse(sumMetric(_.isInstanceOf[org.apache.spark.sql.execution.LeafExecNode],
        "numOutputRows"))
    val scans = sumMetric(_.isInstanceOf[org.apache.spark.sql.execution.LeafExecNode],
      "numOutputRows")
    val shuffle = sumMetric(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec],
      "dataSize")
    QueryMetric(funcName, durationNs / 1000000L, out, scans, shuffle, failed,
      new Timestamp(System.currentTimeMillis()))
  }

  /** Snapshot of captured metrics (listener keeps accumulating). */
  def metrics: Seq[QueryMetric] = buf.iterator().asScala.toSeq

  /** Remove and return everything captured so far (hand-off to a history
    * table writer).
    */
  def drain(): Seq[QueryMetric] = {
    val out = Seq.newBuilder[QueryMetric]
    var m = buf.poll()
    while (m != null) { out += m; m = buf.poll() }
    out.result()
  }

  /** Captured metrics as a DataFrame, ready for the RunAnalytics-style
    * dashboard queries.
    */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    metrics.toDF()
  }
}

object MetricsListener {
  /** Register a fresh listener on the session and return it. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
