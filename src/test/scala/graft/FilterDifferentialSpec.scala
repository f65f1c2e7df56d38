package graft

import org.apache.spark.sql.functions._

import graft.filter.FilterAlgebra
import graft.memo.MetaCodec

/** Differential test: FilterAlgebra's compiled Column predicate vs an
  * independent in-test evaluator of the reference's TYPED semantics
  * (memo_cli.py:179-241), over randomized typed metadata + filter pairs.
  *
  * The metadata side is generated as parsed-YAML typed values (ints,
  * floats, bools, strings — including numeric-looking quoted strings —
  * lists, nested maps, None), stored via [[MetaCodec.encode]], and the
  * model evaluates Python semantics over the ORIGINAL typed values:
  * numeric compare iff both sides are Python numbers (bool included),
  * str()-coercion elsewhere, `$prefix` on `isinstance(value, str)` only.
  * Catches exactly the type-fidelity drift the round-1 string encoding
  * had (quoted "2" comparing numerically, "2.5" refusing $prefix).
  */
class FilterDifferentialSpec extends SparkTestBase {

  /** Reference evaluator over original typed values (memo_cli.py:179-241).
    * Deliberately independent of MetaCodec: its own str()/repr() model.
    * Generated doubles are restricted to halves so Java toString ==
    * Python repr. */
  private object Ref {
    def pyRepr(v: Any): String = v match {
      case s: String => "'" + s + "'" // generator strings have no quotes
      case other => pyStr(other)
    }

    def pyStr(v: Any): String = v match {
      case null => "None"
      case b: Boolean => if (b) "True" else "False"
      case l: Seq[_] => l.map(pyRepr).mkString("[", ", ", "]")
      case m: Map[_, _] =>
        m.map { case (k, x) => pyRepr(k) + ": " + pyRepr(x) }
          .mkString("{", ", ", "}")
      case other => other.toString
    }

    private def isNum(v: Any): Boolean = v match {
      case _: Int | _: Long | _: Double | _: Boolean => true
      case _ => false
    }

    private def num(v: Any): Double = v match {
      case b: Boolean => if (b) 1.0 else 0.0
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: Double => d
      case other => sys.error(s"not numeric: $other")
    }

    /** compare_values (memo_cli.py:179-192). */
    private def cmp(l: Any, r: Any): Int =
      if (isNum(l) && isNum(r)) java.lang.Double.compare(num(l), num(r))
      else pyStr(l).compareTo(pyStr(r))

    /** bare_equals (memo_cli.py:195-198). */
    private def bareEquals(v: Any, operand: Any): Boolean = v match {
      case l: Seq[_] => l.exists(e => pyStr(e) == pyStr(operand))
      case _ => pyStr(v) == pyStr(operand)
    }

    /** eval_condition (memo_cli.py:201-222). */
    private def evalCond(data: Map[String, Any], key: String, cond: Any): Boolean = {
      if (!data.contains(key)) return false
      val value = data(key)
      cond match {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          if (mm.size != 1) false
          else mm.head match {
            case ("$gte", op) => cmp(value, op) >= 0
            case ("$lte", op) => cmp(value, op) <= 0
            case ("$ne", op) => !bareEquals(value, op)
            case ("$prefix", op) =>
              value.isInstanceOf[String] &&
                value.asInstanceOf[String].startsWith(pyStr(op))
            case ("$contains", op) => value match {
              case l: Seq[_] => l.exists(e => pyStr(e) == pyStr(op))
              case _ => false
            }
            case _ => false
          }
        case op => bareEquals(value, op)
      }
    }

    /** matches_filter (memo_cli.py:225-241): implicit AND; $and = all
      * (vacuously true on []), $or = any (false on []); recursion into
      * sub-filters; non-list combinator operand → false. */
    def matchesFilter(data: Map[String, Any], filt: Map[String, Any]): Boolean =
      filt.forall {
        case ("$and", l: List[_]) =>
          l.forall {
            case m: Map[_, _] =>
              matchesFilter(data, m.asInstanceOf[Map[String, Any]])
            case _ => false
          }
        case ("$or", l: List[_]) =>
          l.exists {
            case m: Map[_, _] =>
              matchesFilter(data, m.asInstanceOf[Map[String, Any]])
            case _ => false
          }
        case ("$and" | "$or", _) => false
        case (key, cond) => evalCond(data, key, cond)
      }

    /** P11 gate: records without metadata never match. */
    def matches(data: Map[String, Any], filt: Map[String, Any]): Boolean =
      data.nonEmpty && matchesFilter(data, filt)
  }

  /** Typed case generator shared with FilterLiveReferenceSpec. */
  private val gen = new FilterCaseGen(4242)
  import gen.{randomFilter, randomMeta}

  test("filter keys are literal flat metadata keys (no dotted traversal)") {
    import spark.implicits._
    val metas = Seq(
      (0L, Map("user.name" -> "sada")), // literal dotted key, typed string
      (1L, Map("user" -> ("m" + """{"name":"sada"}"""))), // nested map value
      (2L, Map("user" -> "splain-string")),
      (3L, Map("other" -> "sx")))
    val df = metas.toDF("id", "metadata")
    def ids(expr: String): Set[Long] =
      df.filter(FilterAlgebra.compile(expr, col("metadata")))
        .select("id").as[Long].collect().toSet
    // reference eval_condition: `key not in data` — "user.name" is a plain
    // key; it never traverses into the nested map under "user"
    assert(ids("{user.name: ada}") == Set(0L))
    assert(ids("{user.name: {$prefix: a}}") == Set(0L))
    assert(ids("{user.name: {$ne: bob}}") == Set(0L)) // others: missing key
    // nested map matches only via whole-value str() equality
    assert(ids("{user: \"{'name': 'ada'}\"}") == Set(1L))
  }

  test("analyze fields strip a leading metadata. prefix then flat-lookup") {
    import spark.implicits._
    val df = Seq((0L, Map("source" -> "sweb", "metadata" -> "sMETA")))
      .toDF("id", "metadata")
    def one(field: String): String =
      df.select(FilterAlgebra.resolveField(col("metadata"), field)).head.getString(0)
    assert(one("metadata.source") == "sweb") // strips prefix → flat lookup
    assert(one("source") == "sweb")
    assert(one("metadata") == "sMETA") // bare "metadata" is itself a flat key
  }

  test("empty combinators: $and [] is vacuously true, $or [] false") {
    import spark.implicits._
    val df = Seq((0L, Map("alpha" -> "sx"))).toDF("id", "metadata")
    def n(f: Map[String, Any]): Long =
      df.filter(FilterAlgebra.compile(f, col("metadata"))).count()
    assert(n(Map("$and" -> List.empty[Any])) == 1L)
    assert(n(Map("$or" -> List.empty[Any])) == 0L)
    assert(n(Map("$and" -> "bogus")) == 0L) // non-list combinator → false
  }

  test("compiled predicate agrees with the typed reference model on 60x80 random cases") {
    import spark.implicits._
    val metas = (0 until 80).map(i => (i.toLong, randomMeta()))
    val stored = metas.map { case (id, m) =>
      (id, m.map { case (k, v) => k -> MetaCodec.encode(v) })
    }
    val df = stored.toDF("id", "metadata").cache()
    var checked = 0
    (0 until 60).foreach { _ =>
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
    assert(checked == 60)
  }
}
