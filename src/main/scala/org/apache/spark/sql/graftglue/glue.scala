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
}
