package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen expressions over [[graft.memo.MetaCodec]]'s typed metadata
  * encoding. Same shape as [[VectorExprUtil]]'s family: one static kernel
  * call per row from `doGenCode`, keeping filter predicates inside
  * whole-stage codegen.
  *
  * Reference semantics: memo_cli.py:138-155 (blank/deleted), :179-241
  * (typed compare), :552-557 (format_cell).
  */
private[graft] object MetaExprUtil {
  val K = "graft.memo.MetaCodec"

  def checkString(dt: DataType, name: String): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects STRING, got ${other.sql}")
  }
}

/** Python `str()` of a typed metadata value. */
case class MetaPyStr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "meta_py_str"
  override def checkInputDataTypes(): TypeCheckResult =
    MetaExprUtil.checkString(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any =
    graft.memo.MetaCodec.pyStrU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${MetaExprUtil.K}.pyStrU($c);")
  override protected def withNewChildInternal(newChild: Expression): MetaPyStr =
    copy(child = newChild)
}

/** `format_cell` rendering of a typed metadata value (containers as YAML
  * flow, scalars as Python str, None as ""). */
case class MetaDisplay(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "meta_display"
  override def checkInputDataTypes(): TypeCheckResult =
    MetaExprUtil.checkString(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any =
    graft.memo.MetaCodec.displayU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${MetaExprUtil.K}.displayU($c);")
  override protected def withNewChildInternal(newChild: Expression): MetaDisplay =
    copy(child = newChild)
}

/** YAML flow rendering of a typed metadata value (PyYAML flow dump). */
case class MetaFlowYaml(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "meta_flow_yaml"
  override def checkInputDataTypes(): TypeCheckResult =
    MetaExprUtil.checkString(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any =
    graft.memo.MetaCodec.flowYamlU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${MetaExprUtil.K}.flowYamlU($c);")
  override protected def withNewChildInternal(newChild: Expression): MetaFlowYaml =
    copy(child = newChild)
}

/** YAML scalar quoting of a RAW string (metadata keys in flow maps). */
case class MetaYamlScalar(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "meta_yaml_scalar"
  override def checkInputDataTypes(): TypeCheckResult =
    MetaExprUtil.checkString(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any =
    graft.memo.MetaCodec.yamlScalarU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${MetaExprUtil.K}.yamlScalarU($c);")
  override protected def withNewChildInternal(newChild: Expression): MetaYamlScalar =
    copy(child = newChild)
}

/** Python `bool(...)` truthiness of a typed metadata value. */
case class MetaTruthy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "meta_truthy"
  override def checkInputDataTypes(): TypeCheckResult =
    MetaExprUtil.checkString(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any =
    graft.memo.MetaCodec.truthyU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${MetaExprUtil.K}.truthyU($c);")
  override protected def withNewChildInternal(newChild: Expression): MetaTruthy =
    copy(child = newChild)
}

/** Numeric view of a typed metadata value: double for int/float/bool
  * (Python's `isinstance(v, (int, float))` class), NULL otherwise. */
case class MetaNum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "meta_num"
  override def checkInputDataTypes(): TypeCheckResult =
    MetaExprUtil.checkString(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    if (graft.memo.MetaCodec.isNumericU(t)) graft.memo.MetaCodec.numValueU(t)
    else null
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if (${MetaExprUtil.K}.isNumericU($c)) {
         |  ${ev.value} = ${MetaExprUtil.K}.numValueU($c);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): MetaNum =
    copy(child = newChild)
}

/** Body-YAML deleted probe (memo_cli.py:145-154): true iff the body parses
  * as a YAML mapping with a Python-truthy `deleted` key. */
case class BodyDeleted(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "body_deleted"
  override def checkInputDataTypes(): TypeCheckResult =
    MetaExprUtil.checkString(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any =
    graft.memo.MetaCodec.bodyDeletedU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${MetaExprUtil.K}.bodyDeletedU($c);")
  override protected def withNewChildInternal(newChild: Expression): BodyDeleted =
    copy(child = newChild)
}
