package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column <-> Expression converters.
  *
  * Spark 4 removed the public `new Column(expr)` constructor; the supported
  * pattern for extension libraries that ship native Catalyst expressions is a
  * small glue object inside the `org.apache.spark.sql` namespace. This file is
  * the only one in the project that lives outside the `graft` package, and it
  * contains no logic.
  */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over an engine-constructed logical plan (the
    * `Dataset.ofRows` factory is `private[sql]` — third reason this glue
    * object exists). The plan goes through the full analyzer/optimizer.
    */
  def dataFrame(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** EAGER Column → catalyst conversion. The default `expression` wraps the
    * api-side column node lazily (resolved during analysis); expressions
    * destined for a custom logical node's non-child fields (sort orders,
    * grouping keys) must be converted up front so no api-internal node —
    * with its non-serializable singletons — survives into task closures.
    */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** The analyzed-or-not logical plan beneath a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.logical

  /** Register a native expression as a session-temporary SQL function, so
    * `spark.sql("SELECT cosine_sim(a, b) ...")` resolves to the same Catalyst
    * kernel the Column API uses (the registry lives behind `private[sql]`
    * sessionState — the second reason this glue object exists).
    */
  def registerTempFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
