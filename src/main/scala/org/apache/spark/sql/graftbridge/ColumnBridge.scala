package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the converters `private[sql]` (`ExpressionUtils` in
  * `org.apache.spark.sql.classic`), so a library shipping its own codegen
  * expressions needs this one-file shim inside the sql package tree — the
  * standard extension pattern for libraries that must run on a STOCK
  * SparkSession (no SparkSessionExtensions registration required, which
  * matters because the driver probes `SparkEntry.queries` with a bare
  * session the library does not construct).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataType.sameType (case/nullability-insensitive equality) is also
    * `private[sql]`.
    */
  def sameType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)

  /** Register a function description into an already-running session's
    * FunctionRegistry (the registry lives behind `private[sql]`
    * sessionState). Complements the `spark.sql.extensions` config path,
    * which only applies to sessions built AFTER the config is set.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
