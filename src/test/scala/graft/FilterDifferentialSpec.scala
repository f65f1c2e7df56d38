package graft

import org.apache.spark.sql.functions._

import graft.filter.FilterAlgebra

/** Differential test: FilterAlgebra's compiled Column predicate vs an
  * independent in-test evaluator of the reference semantics
  * (memo_cli.py:179-241), over randomized metadata + filter pairs.
  * Catches drift in the subtlest surface (string coercion, list-any,
  * numeric-else-lexicographic compare, missing-key/malformed rules). */
class FilterDifferentialSpec extends SparkTestBase {

  /** Reference evaluator over the stored string encoding. */
  private object Ref {
    def coerce(v: Any): String = FilterAlgebra.coerceString(v)

    private def parseList(s: String): Option[Seq[String]] =
      if (!s.startsWith("[")) None
      else {
        // values are JSON arrays of strings produced by our encoder
        val inner = s.stripPrefix("[").stripSuffix("]").trim
        if (inner.isEmpty) Some(Seq.empty)
        else Some(inner.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")))
      }

    private def bareEquals(value: String, operand: Any): Boolean =
      parseList(value) match {
        case Some(elems) => elems.contains(coerce(operand))
        case None => value == coerce(operand)
      }

    private def cmp(value: String, operand: Any, gte: Boolean): Boolean = {
      val num = operand match {
        case n: java.lang.Number => Some(n.doubleValue())
        case s: String => s.toDoubleOption
        case _ => None
      }
      (num, value.toDoubleOption) match {
        case (Some(o), Some(v)) => if (gte) v >= o else v <= o
        case _ =>
          val o = coerce(operand)
          if (gte) value >= o else value <= o
      }
    }

    def keyCond(value: Option[String], cond: Any): Boolean = cond match {
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        if (mm.size != 1) false
        else value match {
          case None => false
          case Some(v) => mm.head match {
            case ("$ne", op) => !bareEquals(v, op)
            case ("$gte", op) => cmp(v, op, gte = true)
            case ("$lte", op) => cmp(v, op, gte = false)
            case ("$prefix", op) =>
              v.toDoubleOption.isEmpty && !v.startsWith("[") &&
                !v.startsWith("{") && v.startsWith(coerce(op))
            case ("$contains", op) =>
              parseList(v).exists(_.contains(coerce(op)))
            case _ => false
          }
        }
      case op => value.exists(bareEquals(_, op))
    }

    def matches(meta: Map[String, String], filter: Map[String, Any]): Boolean =
      meta.nonEmpty && filter.forall {
        case ("$and", l: List[_]) =>
          l.nonEmpty && l.forall {
            case m: Map[_, _] => matchesInner(meta, m.asInstanceOf[Map[String, Any]])
            case _ => false
          }
        case ("$or", l: List[_]) =>
          l.exists {
            case m: Map[_, _] => matchesInner(meta, m.asInstanceOf[Map[String, Any]])
            case _ => false
          }
        case (key, cond) => keyCond(meta.get(key), cond)
      }

    private def matchesInner(meta: Map[String, String], m: Map[String, Any]): Boolean =
      m.forall { case (k, cond) => keyCond(meta.get(k), cond) }
  }

  private val rnd = new scala.util.Random(4242)
  private val keys = Seq("alpha", "beta", "gamma")
  private val words = Seq("apple", "banana", "cherry", "user", "user_input", "")

  private def randomValue(): String = rnd.nextInt(5) match {
    case 0 => rnd.nextInt(20).toString
    case 1 => (rnd.nextDouble() * 10).toString
    case 2 => words(rnd.nextInt(words.length))
    case 3 => // JSON list
      val n = rnd.nextInt(3)
      (0 until n).map(_ => "\"" + words(rnd.nextInt(words.length - 1)) + "\"")
        .mkString("[", ",", "]")
    case 4 => "2026-0" + (1 + rnd.nextInt(9)) + "-1" + rnd.nextInt(10)
  }

  private def randomMeta(): Map[String, String] =
    keys.filter(_ => rnd.nextBoolean())
      .map(k => k -> randomValue()).toMap

  private def randomOperand(): Any = rnd.nextInt(3) match {
    case 0 => rnd.nextInt(20)
    case 1 => words(rnd.nextInt(words.length - 1))
    case 2 => "2026-0" + (1 + rnd.nextInt(9)) + "-1" + rnd.nextInt(10)
  }

  private def randomCond(): Any = rnd.nextInt(7) match {
    case 0 => randomOperand() // bare equality
    case 1 => Map("$ne" -> randomOperand())
    case 2 => Map("$gte" -> randomOperand())
    case 3 => Map("$lte" -> randomOperand())
    case 4 => Map("$prefix" -> words(rnd.nextInt(words.length - 1)))
    case 5 => Map("$contains" -> words(rnd.nextInt(words.length - 1)))
    case 6 => Map("$bogus" -> 1) // unknown operator → false
  }

  private def randomFilter(depth: Int = 1): Map[String, Any] = {
    val base: Map[String, Any] = keys.filter(_ => rnd.nextInt(3) == 0)
      .map(k => k -> randomCond()).toMap
    if (depth > 0 && rnd.nextInt(3) == 0) {
      val sub = List.fill(1 + rnd.nextInt(2))(randomFilter(0))
      base + (if (rnd.nextBoolean()) "$and" -> sub else "$or" -> sub)
    } else base
  }

  test("dotted keys against JSON-object values agree with get_json_object") {
    import spark.implicits._
    val metas = Seq(
      (0L, Map("user" -> """{"name":"ada","role":"eng"}""")),
      (1L, Map("user" -> """{"name":"bob"}""")),
      (2L, Map("user" -> "plain-string")),
      (3L, Map("other" -> "x")))
    val df = metas.toDF("id", "metadata")
    def ids(expr: String): Set[Long] =
      df.filter(FilterAlgebra.compile(expr, org.apache.spark.sql.functions.col("metadata")))
        .select("id").as[Long].collect().toSet
    assert(ids("{user.name: ada}") == Set(0L))
    assert(ids("{user.name: {$ne: ada}}") == Set(1L)) // bob; plain/missing → false
    assert(ids("{user.name: {$prefix: a}}") == Set(0L))
    assert(ids("{user.role: eng}") == Set(0L))
  }

  test("compiled predicate agrees with the reference evaluator on 40x60 random cases") {
    import spark.implicits._
    val metas = (0 until 60).map(i => (i.toLong, randomMeta()))
    val df = metas.toDF("id", "metadata").cache()
    var checked = 0
    (0 until 40).foreach { _ =>
      val filter = randomFilter()
      val sparkIds = df.filter(FilterAlgebra.compile(filter, col("metadata")))
        .select("id").as[Long].collect().toSet
      val refIds = metas.filter { case (_, m) => Ref.matches(m, filter) }
        .map(_._1).toSet
      assert(sparkIds == refIds,
        s"filter=$filter\nspark=$sparkIds\nref=$refIds\n" +
          s"diff metas=${(sparkIds ++ refIds -- (sparkIds & refIds)).toSeq.sorted
            .map(i => metas(i.toInt)).mkString("; ")}")
      checked += 1
    }
    df.unpersist()
    assert(checked == 40)
  }
}
