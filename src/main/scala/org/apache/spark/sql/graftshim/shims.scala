package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression plumbing.
  *
  * Spark 4 made `Column` backend-agnostic (ColumnNode); wrapping a custom
  * Catalyst `Expression` requires `classic.ExpressionUtils`, which is
  * `private[sql]` — hence this shim package inside `org.apache.spark.sql`,
  * the standard technique for Catalyst-extension libraries. Everything
  * referenced is Apache Spark public source.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register an expression builder as a SQL-callable function on a LIVE
    * session (`SparkSessionExtensions` only applies at session build
    * time; this covers sessions handed to us already constructed).
    */
  def register(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.expressions", name),
        builder)
}
