package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API.
  *
  * Spark 4 routes `Column` through `ColumnNode`s whose Expression
  * constructors are `private[sql]`; placing this one-file shim inside an
  * `org.apache.spark.sql` subpackage is the standard technique open-source
  * Spark extension libraries use to lift a custom `Expression` into a
  * `Column` without forking Spark.
  */
object ColumnBridge {
  /** Wrap a custom Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  /** Extract the Catalyst expression backing a (classic-mode) Column. */
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
