package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. Spark 4's `Column` wraps a `ColumnNode` (Connect-compatible), not a
  * catalyst `Expression`; the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]` —
  * hence this shim lives under `org.apache.spark.sql`.
  */
object GraftShims {
  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a user-facing Column to its catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register an Expression builder as a SQL function in this session. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
