package graft.filter

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Mongo-style metadata filter algebra (reference: /root/reference
  * memo_cli.py:179-241, SKILL.md:183-249), compiled to a Catalyst Column
  * predicate over a `metadata MAP<STRING,STRING>` column.
  *
  * Storage encoding (this engine's spec): scalar metadata values are stored
  * as their canonical string rendering (booleans lowercase); list values as
  * JSON arrays of coerced strings; nested maps as JSON objects. The
  * reference's dynamic typing is recovered through the same string-coercion
  * comparison semantics it uses (memo_cli.py:179-198):
  *
  *  - bare equality / $ne: string-coerced equality; list values match if ANY
  *    element matches (P1/P2)
  *  - $gte/$lte: numeric compare iff BOTH sides parse as numbers, else
  *    lexicographic string compare (P3/P4)
  *  - $prefix: strings only — numeric-looking or JSON-encoded values never
  *    match (P5, memo_cli.py:216-217)
  *  - $contains: lists only — any element string-equals the operand (P6)
  *  - implicit AND over top-level keys; $and / $or combinators (P7-P9)
  *  - missing key → false (P10); record without metadata never matches (P11)
  *  - malformed operator maps → false (P12)
  */
object FilterAlgebra {

  /** Parse a YAML-flow filter expression; outer braces optional
    * (memo_cli.py:170-176). Returns the raw map; throws on unparseable. */
  def parse(expr: String): Map[String, Any] = {
    val settings = org.snakeyaml.engine.v2.api.LoadSettings.builder().build()
    def tryLoad(s: String): Option[Any] =
      try Some(new org.snakeyaml.engine.v2.api.Load(settings).loadFromString(s))
      catch { case _: Exception => None }
    val trimmed = expr.trim
    val candidates =
      if (trimmed.isEmpty) Seq("{}")
      else Seq(trimmed, "{" + trimmed + "}")
    candidates.iterator.flatMap(tryLoad).collectFirst {
      case m: java.util.Map[_, _] => toScala(m).asInstanceOf[Map[String, Any]]
    }.getOrElse(throw new IllegalArgumentException(
      s"Invalid filter expression: $expr"))
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toList
    case other => other
  }

  /** Canonical string rendering used for both storage and comparison. */
  def coerceString(v: Any): String = v match {
    case null => ""
    case b: Boolean => if (b) "true" else "false"
    case b: java.lang.Boolean => if (b) "true" else "false"
    case d: Double if d.isWhole && math.abs(d) < 1e15 =>
      // YAML float that is integral renders without trailing .0 ambiguity?
      // Keep Java's rendering for doubles; ints stay ints upstream.
      d.toString
    case other => other.toString
  }

  private def toNum(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case s: String => s.toDoubleOption
    case b: Boolean => None
    case _ => None
  }

  private val strArray = ArrayType(StringType)

  /** Resolve a possibly-dotted key against the metadata map column. */
  def resolveValue(metadata: Column, key: String): Column = {
    val parts = key.split('.')
    if (parts.length == 1) element_at(metadata, key)
    else get_json_object(element_at(metadata, parts.head),
      "$." + parts.tail.mkString("."))
  }

  /** Compile a parsed filter map to a predicate Column. Includes the
    * no-metadata gate (P11). */
  def compile(filterMap: Map[String, Any], metadata: Column): Column = {
    val gate = metadata.isNotNull && size(metadata) > 0
    gate && compileMap(filterMap, metadata)
  }

  /** Parse + compile in one step. */
  def compile(expr: String, metadata: Column): Column =
    compile(parse(expr), metadata)

  private def compileMap(m: Map[String, Any], metadata: Column): Column = {
    val preds = m.toSeq.map {
      case ("$and", l: List[_]) => combinator(l, metadata, and = true)
      case ("$or", l: List[_]) => combinator(l, metadata, and = false)
      case ("$and" | "$or", _) => lit(false) // malformed combinator (P12)
      case (key, cond) => keyCondition(resolveValue(metadata, key), cond)
    }
    preds.reduceOption(_ && _).getOrElse(lit(true))
  }

  private def combinator(l: List[_], metadata: Column, and: Boolean): Column = {
    val subs = l.map {
      case m: Map[_, _] =>
        compileMap(m.asInstanceOf[Map[String, Any]], metadata)
      case _ => lit(false)
    }
    if (subs.isEmpty) lit(false)
    else if (and) subs.reduce(_ && _) else subs.reduce(_ || _)
  }

  /** Condition on one key's value; `v` may be null (missing key → false). */
  private def keyCondition(v: Column, cond: Any): Column = cond match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      if (mm.size != 1) lit(false) // P12
      else {
        val (op, operand) = mm.head
        op match {
          case "$ne" => v.isNotNull && !bareEquals(v, operand)
          case "$gte" => compareOp(v, operand, gte = true)
          case "$lte" => compareOp(v, operand, gte = false)
          case "$prefix" => prefixOp(v, operand)
          case "$contains" => containsOp(v, operand)
          case _ => lit(false) // unknown operator (P12)
        }
      }
    case operand => v.isNotNull && bareEquals(v, operand)
  }

  /** String-coerced equality; list values match on ANY element (P1). */
  private def bareEquals(v: Column, operand: Any): Column = {
    val opStr = lit(coerceString(operand))
    val asList = from_json(v, strArray)
    when(v.startsWith("["), coalesce(exists(asList, e => e === opStr), lit(false)))
      .otherwise(v === opStr)
  }

  /** Numeric compare iff both sides numeric, else lexicographic (P3/P4). */
  private def compareOp(v: Column, operand: Any, gte: Boolean): Column = {
    val opStr = lit(coerceString(operand))
    val strCmp = if (gte) v >= opStr else v <= opStr
    val guarded = toNum(operand) match {
      case Some(d) =>
        val vNum = v.try_cast(DoubleType)
        when(vNum.isNotNull, if (gte) vNum >= lit(d) else vNum <= lit(d))
          .otherwise(strCmp)
      case None => strCmp
    }
    v.isNotNull && guarded
  }

  /** Strings only: numeric-looking or JSON-encoded values never match (P5). */
  private def prefixOp(v: Column, operand: Any): Column = {
    val opStr = coerceString(operand)
    v.isNotNull &&
      v.try_cast(DoubleType).isNull &&
      !v.startsWith("[") && !v.startsWith("{") &&
      v.startsWith(lit(opStr))
  }

  /** Lists only: any element string-equals operand (P6). */
  private def containsOp(v: Column, operand: Any): Column = {
    val opStr = lit(coerceString(operand))
    v.isNotNull && v.startsWith("[") &&
      coalesce(exists(from_json(v, strArray), e => e === opStr), lit(false))
  }
}
