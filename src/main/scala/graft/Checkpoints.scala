package graft

import org.apache.spark.sql.DataFrame

/** Unpersist the storage blocks behind an eager `localCheckpoint(true)`.
  *
  * Checkpointed frames live in executor storage until the context
  * cleaner's GC happens to collect them; in loops (graph supersteps) and
  * long-lived streams (per-micro-batch state merges) that stranding is
  * real memory pressure — the ADVICE-r7 retention finding, fixed at the
  * source. Call on SUPERSEDED generations only: the final checkpoint
  * backing a returned/published DataFrame must stay.
  */
object Checkpoints {
  def drop(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
