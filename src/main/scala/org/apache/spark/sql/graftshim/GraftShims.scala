package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

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

  /** Build a DataFrame over an RDD of InternalRow WITHOUT the external-Row
    * round trip `createDataFrame` pays (per-row validation + catalyst
    * conversion). The rows must already match `schema` in internal format —
    * the caller owns that contract (`internalCreateDataFrame` is
    * `private[sql]`, hence this shim). */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** The executed plan's RDD of InternalRow (`queryExecution.toRdd`) — the
    * internal twin of `.rdd`, minus the per-row catalyst→external decode.
    * Rows may be reused buffers: copy or project before retaining. */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.toRdd

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
