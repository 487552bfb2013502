package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM, scalatest forked by sbt). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.1"
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local("graft-test", 4)

  /** Jobs submitted under `group`, polled until the ASYNC status store
    * stops moving so late job-start events are counted — the shared gate
    * for "this read path must not secretly run a training loop" pins.
    */
  def jobsInGroup(spark: SparkSession, group: String): Int = {
    var n = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    var stable = 0
    while (stable < 3) {
      Thread.sleep(100)
      val m = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      if (m == n) stable += 1 else { n = m; stable = 0 }
    }
    n
  }

  /** Every physical node, descending through AQE and query-stage wrappers —
    * the one definition of the unwrap logic shared by all plan-shape specs
    * (a Spark upgrade adding a new stage wrapper is fixed here once).
    */
  def allPlanNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => Nil
    }
    p +: (p.children ++ nested).flatMap(allPlanNodes)
  }
}
