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
