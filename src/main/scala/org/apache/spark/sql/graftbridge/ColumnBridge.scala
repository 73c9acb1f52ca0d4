package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionUtils}

/** Column ⇄ Expression bridge. Spark 4 made the conversion helpers
  * `private[sql]` (the Connect refactor hid `Column.expr`); injecting our
  * operators as catalog functions needs exactly this conversion, so the
  * bridge lives in an `org.apache.spark.sql` subpackage — the established
  * pattern for Spark extension libraries. No internals are reimplemented;
  * these delegate to Spark's own ExpressionUtils.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** DataFrame from a custom LogicalPlan (Dataset.ofRows is private[sql]) —
    * the entry point a custom operator's public API needs once its logical
    * node is built. Delegates; nothing reimplemented. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** EAGER conversion (ColumnConversions.expression runs the column-node →
    * expression converter immediately): the lazy wrapper from
    * ExpressionUtils.expression is a leaf the analyzer will not descend
    * into when returned from a function-registry builder — it reaches
    * codegen unresolved. The eager tree's UnresolvedFunctions resolve in
    * the analyzer's normal fixed-point. */
  def expression(c: Column): Expression = ColumnConversions.expression(c)
}
