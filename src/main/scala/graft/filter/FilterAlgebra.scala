package graft.filter

import scala.collection.immutable.VectorMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.memo.MetaCodec
import graft.functions.GraftFunctions.{metaNum, metaPyStr}

/** Mongo-style metadata filter algebra (reference: /root/reference
  * memo_cli.py:179-241, SKILL.md:183-249), compiled to a Catalyst Column
  * predicate over a `metadata MAP<STRING,STRING>` column holding
  * [[graft.memo.MetaCodec]] typed-encoded values.
  *
  * Because values carry their original YAML type, the compiled predicate
  * reproduces the reference's TYPED comparison semantics exactly
  * (memo_cli.py:179-222):
  *
  *  - bare equality / $ne: Python str()-coerced equality; list values match
  *    if ANY element's str() matches (P1/P2)
  *  - $gte/$lte: numeric compare iff BOTH sides are Python numbers
  *    (int/float/bool — a quoted "2" stays a string and compares
  *    lexicographically), else str() lexicographic compare (P3/P4)
  *  - $prefix: `isinstance(value, str)` only — a string-typed "2.5" CAN
  *    prefix-match; an int 25 cannot (P5)
  *  - $contains: lists only — any element str()-equals str(operand) (P6)
  *  - implicit AND over top-level keys; $and / $or combinators; empty
  *    $and is vacuously TRUE (all([])), empty $or FALSE (any([])) (P7-P9)
  *  - filter keys are LITERAL flat metadata keys — no dotted traversal
  *    (`eval_condition` does `key not in data`, memo_cli.py:202-204)
  *  - missing key → false (P10); record without metadata never matches
  *    (P11); malformed operator maps / unknown ops → false (P12)
  */
object FilterAlgebra {

  /** Parse a YAML-flow filter expression; outer braces optional
    * (memo_cli.py:170-176). Returns the raw map; throws on unparseable. */
  def parse(expr: String): Map[String, Any] = {
    // PyYAML 1.1 scalar typing, matching the reference's safe_load of the
    // filter string (yes/on → bool, 007 → int — graft.memo.Yaml11Schema)
    val settings = graft.memo.Yaml11Schema.loadSettings
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

  /** java → scala conversion preserving mapping order (Python dicts are
    * insertion-ordered; order matters for str() of dict operands). */
  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      // .iterator preserves insertion order (a .map on the wrapper would
      // rebuild into an unordered HashMap)
      VectorMap.from(m.asScala.iterator.map { case (k, x) =>
        String.valueOf(k) -> toScala(x) })
    case l: java.util.List[_] => l.asScala.iterator.map(toScala).toList
    case other => other
  }

  /** Python str() of a parsed filter operand. */
  def operandStr(v: Any): String = MetaCodec.pyStr(MetaCodec.encode(v))

  /** Semantics-preserving canonical form of a PARSED filter map, for the
    * parse-level coverage compare view-serving does ([[graft.memo
    * .MemoEngine]]'s statsPairs / analyzeCount): logically identical
    * asks written differently should not fall to the scan arm. Three
    * rewrites, each sound by the algebra's own laws:
    *
    *  - single-element `$and`/`$or` unwraps (all([x]) ≡ any([x]) ≡ x),
    *    splicing into the parent when no key collides (a collision
    *    keeps the wrapper — merging would drop a conjunct);
    *  - empty `$and` drops (vacuously TRUE, the AND identity; empty
    *    `$or` is FALSE and stays);
    *  - sibling order sorts — implicit-AND top-level keys and
    *    `$and`/`$or` list elements are commutative conjuncts/disjuncts.
    *
    * CONDITION VALUES ARE NEVER TOUCHED: dict-shaped operands compare by
    * Python str() where insertion order is identity, so only structure
    * ABOVE the key-condition level rewrites — two different predicates
    * can never collapse to one form, the wrongness-free direction.
    * Malformed combinator payloads (non-map list elements) pass through
    * verbatim. Evaluation always consumes the RAW parse; this form
    * exists only to be compared. */
  def canonicalize(m: Map[String, Any]): Map[String, Any] = {
    val entries = m.toSeq.flatMap {
      case (op @ ("$and" | "$or"), l: List[_])
          if l.forall(_.isInstanceOf[Map[_, _]]) =>
        val subs = l.map(e =>
          canonicalize(e.asInstanceOf[Map[String, Any]]))
        subs match {
          case Nil if op == "$and" => Nil // all([]) is TRUE: AND identity
          case single :: Nil => single.toSeq // unwrap, splice below
          case _ => Seq(op -> subs.sortBy(operandStr))
        }
      case other => Seq(other)
    }
    // a splice that collides with a sibling key cannot merge (both
    // conjuncts must hold; a map holds one) — fall back to the raw map's
    // canonical ORDER only (sorted), structure untouched
    if (entries.map(_._1).distinct.length != entries.length)
      VectorMap.from(m.toSeq.sortBy(_._1))
    else VectorMap.from(entries.sortBy(_._1))
  }

  /** Numeric value of the operand iff it is a Python number (incl. bool). */
  private def operandNum(v: Any): Option[Double] = {
    val t = MetaCodec.encode(v)
    if (MetaCodec.isNumeric(t)) Some(MetaCodec.numValue(t)) else None
  }

  private val strArray = ArrayType(StringType)

  /** Resolve a FILTER key: literal flat metadata lookup (the reference's
    * `key not in data` — dotted keys are plain keys, memo_cli.py:202-204). */
  def resolveValue(metadata: Column, key: String): Column =
    element_at(metadata, key)

  /** Resolve an ANALYZE field: strips a leading `metadata.` prefix then
    * does a flat lookup (reference resolve_field_value, memo_cli.py:543-549). */
  def resolveField(metadata: Column, field: String): Column = {
    val key =
      if (field.startsWith("metadata.")) field.substring("metadata.".length)
      else field
    element_at(metadata, key)
  }

  /** List elements of a typed `l` value, as typed strings. */
  private def listElems(v: Column): Column =
    from_json(v.substr(lit(2), length(v)), strArray)

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
    // all([]) is vacuously true; any([]) is false (memo_cli.py:226-238)
    if (subs.isEmpty) lit(and)
    else if (and) subs.reduce(_ && _) else subs.reduce(_ || _)
  }

  /** Condition on one key's value; `v` null means the key is missing →
    * false for every operator (memo_cli.py:202-204). */
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

  /** str()-coerced equality; list values match on ANY element (P1,
    * memo_cli.py:195-198). */
  private def bareEquals(v: Column, operand: Any): Column = {
    val opStr = lit(operandStr(operand))
    when(v.startsWith("l"),
      coalesce(exists(listElems(v), e => metaPyStr(e) === opStr), lit(false)))
      .otherwise(metaPyStr(v) === opStr)
  }

  /** Numeric compare iff BOTH sides are Python numbers, else str()
    * lexicographic (P3/P4, memo_cli.py:179-192). */
  private def compareOp(v: Column, operand: Any, gte: Boolean): Column = {
    val opStr = lit(operandStr(operand))
    val vStr = metaPyStr(v)
    val strCmp = if (gte) vStr >= opStr else vStr <= opStr
    val guarded = operandNum(operand) match {
      case Some(d) =>
        val vNum = metaNum(v)
        when(vNum.isNotNull, if (gte) vNum >= lit(d) else vNum <= lit(d))
          .otherwise(strCmp)
      case None => strCmp
    }
    v.isNotNull && guarded
  }

  /** `isinstance(value, str) and value.startswith(str(operand))` (P5,
    * memo_cli.py:216-217): the typed encoding makes this a single
    * prefix test on "s" + operand. */
  private def prefixOp(v: Column, operand: Any): Column =
    v.isNotNull && v.startsWith(lit("s" + operandStr(operand)))

  /** Lists only: any element str()-equals str(operand) (P6). */
  private def containsOp(v: Column, operand: Any): Column = {
    val opStr = lit(operandStr(operand))
    v.isNotNull && v.startsWith("l") &&
      coalesce(exists(listElems(v), e => metaPyStr(e) === opStr), lit(false))
  }
}
