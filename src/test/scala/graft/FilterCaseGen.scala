package graft

import scala.collection.immutable.VectorMap

/** Random typed (metadata, filter) case generator over the reference's
  * filter-algebra domain (memo_cli.py:179-241), shared by the model-based
  * differential suite (FilterDifferentialSpec) and the live-reference one
  * (FilterLiveReferenceSpec).
  *
  * Values are typed as parsed-YAML would produce them: ints, half-valued
  * doubles (Java toString == Python repr, so both engines and the JSON
  * wire format agree on the rendering), bools, strings including
  * numeric-looking ones, lists, one-key nested maps, None. */
final class FilterCaseGen(seed: Long) {
  private val rnd = new scala.util.Random(seed)
  private val keys = Seq("alpha", "beta", "gamma")
  private val words =
    Seq("apple", "banana", "cherry", "user", "user_input", "", "2", "007",
      "2.5", "false", "2026-03-14")

  /** A typed scalar as parse-yaml would produce it. */
  def randomScalar(): Any = rnd.nextInt(5) match {
    case 0 => rnd.nextInt(20)
    case 1 => rnd.nextInt(40) / 2.0 // halves: Java toString == Python repr
    case 2 => rnd.nextBoolean()
    case 3 => words(rnd.nextInt(words.length))
    case 4 => null
  }

  def randomValue(): Any = rnd.nextInt(8) match {
    case 6 => List.fill(rnd.nextInt(3))(randomScalar())
    case 7 => VectorMap("k" -> randomScalar())
    case _ => randomScalar()
  }

  def randomMeta(): Map[String, Any] =
    VectorMap.from(keys.filter(_ => rnd.nextBoolean()).map(_ -> randomValue()))

  def randomOperand(): Any = rnd.nextInt(8) match {
    case 0 => rnd.nextInt(20)
    case 1 => rnd.nextInt(40) / 2.0
    case 2 => rnd.nextBoolean()
    case 6 => // container operand: reference str()-coerces it whole
      List.fill(rnd.nextInt(3))(words(rnd.nextInt(words.length)))
    case 7 => VectorMap("k" -> rnd.nextInt(5))
    case _ => words(rnd.nextInt(words.length))
  }

  def randomCond(): Any = rnd.nextInt(8) match {
    case 0 | 7 => randomOperand() // bare equality
    case 1 => Map("$ne" -> randomOperand())
    case 2 => Map("$gte" -> randomOperand())
    case 3 => Map("$lte" -> randomOperand())
    case 4 => Map("$prefix" -> randomOperand())
    case 5 => Map("$contains" -> randomOperand())
    case 6 => Map("$bogus" -> 1) // unknown operator → false
  }

  def randomFilter(depth: Int = 1): Map[String, Any] = {
    val base: Map[String, Any] = keys.filter(_ => rnd.nextInt(3) == 0)
      .map(k => k -> randomCond()).toMap
    if (depth > 0 && rnd.nextInt(3) == 0) {
      val sub = List.fill(rnd.nextInt(3))(randomFilter(0)) // 0 → vacuous case
      base + (if (rnd.nextBoolean()) "$and" -> sub else "$or" -> sub)
    } else base
  }
}

object FilterCaseGen {
  /** Render a generated typed value as JSON for the python harness: the
    * JSON type system round-trips the whole generator domain exactly
    * (int/float/bool/str/list/dict/null ↔ the parsed-YAML types the
    * reference evaluates over). Generator strings never contain quotes or
    * backslashes, but escape them anyway. */
  def toJson(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case i: Int => i.toString
    case d: Double => d.toString
    case s: String =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case l: Seq[_] => l.map(toJson).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => toJson(k.toString) + ":" + toJson(x) }
        .mkString("{", ",", "}")
    case other => sys.error(s"unexpected generated type: $other")
  }
}
