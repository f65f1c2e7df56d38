package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.filter.FilterAlgebra

/** Truth-table tests for the Mongo-style filter algebra P1-P12
  * (reference semantics: memo_cli.py:179-241, SKILL.md:183-249).
  * Metadata values use [[graft.memo.MetaCodec]]'s typed encoding
  * (s=string, i=int, f=float, b=bool, z=null, l=list, m=map), so the
  * reference's ORIGINAL-type comparison semantics are testable: a quoted
  * "2" is a string and compares lexicographically; an int 123 never
  * `$prefix`-matches; a string "123" does. */
class FilterAlgebraSpec extends SparkTestBase {

  /** One-row df with the given metadata map (values typed-encoded). */
  private def rec(meta: Map[String, String]): DataFrame = {
    val entries = meta.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val mcol = if (meta.isEmpty) map().cast("map<string,string>")
               else map(entries: _*)
    spark.range(1).select(col("id"), mcol.as("metadata"))
  }

  private def matches(meta: Map[String, String], expr: String): Boolean =
    rec(meta).filter(FilterAlgebra.compile(expr, col("metadata"))).count() == 1

  test("P1 bare equality is str()-coerced") {
    assert(matches(Map("priority" -> "i2"), "{priority: 2}"))
    assert(matches(Map("priority" -> "i2"), "{priority: '2'}")) // str(2)=="2"
    assert(matches(Map("priority" -> "s2"), "{priority: 2}"))
    assert(!matches(Map("priority" -> "i2"), "{priority: 3}"))
  }

  test("P1 bool values equal via Python str() rendering") {
    assert(FilterAlgebra.operandStr(java.lang.Boolean.TRUE) == "True")
    // YAML true operand → str "True"; stored bTrue → str "True"
    assert(matches(Map("b" -> "bTrue"), "{b: true}"))
    assert(matches(Map("b" -> "bTrue"), "{b: \"True\"}")) // str-coerced
    assert(!matches(Map("b" -> "bTrue"), "{b: \"true\"}")) // "True" ≠ "true"
    assert(!matches(Map("b" -> "bFalse"), "{b: true}"))
  }

  test("P1 list values match on ANY element") {
    assert(matches(Map("tags" -> """l["spersonal","sfood"]"""), "{tags: food}"))
    assert(!matches(Map("tags" -> """l["spersonal","sfood"]"""), "{tags: work}"))
    // typed elements: int element 2 str()-matches operand 2
    assert(matches(Map("ns" -> """l["i2","i3"]"""), "{ns: 2}"))
  }

  test("P2 $ne negates including list-any rule") {
    assert(!matches(Map("tags" -> """l["sa","sb"]"""), "{tags: {$ne: a}}"))
    assert(matches(Map("tags" -> """l["sa","sb"]"""), "{tags: {$ne: c}}"))
    assert(matches(Map("x" -> "i1"), "{x: {$ne: 2}}"))
  }

  test("P3/P4 numeric compare when both sides are Python numbers") {
    assert(matches(Map("n" -> "i10"), "{n: {$gte: 9}}"))
    assert(matches(Map("n" -> "i10"), "{n: {$lte: 10}}"))
    assert(!matches(Map("n" -> "i10"), "{n: {$gte: 11}}"))
    // floats and bools are numbers too (bool subclasses int in Python)
    assert(matches(Map("n" -> "f10.5"), "{n: {$gte: 10}}"))
    assert(matches(Map("n" -> "bTrue"), "{n: {$lte: 1}}"))
  }

  test("P3/P4 string-typed numeric-looking values compare lexicographically") {
    // reference: quoted "10" is a str → str(10)="10" vs "9" lexicographic
    assert(!matches(Map("n" -> "s10"), "{n: {$gte: 9}}")) // "10" < "9" lex
    assert(matches(Map("n" -> "s10"), "{n: {$lte: 9}}"))
    // and a numeric operand against a string value is ALSO lexicographic
    assert(matches(Map("n" -> "i10"), "{n: {$gte: '9'}}") == false)
    // int 10 vs str "9": mixed → str compare "10" < "9"
  }

  test("P3/P4 falls back to lexicographic on mixed types") {
    assert(matches(Map("s" -> "sbanana"), "{s: {$gte: apple}}"))
    assert(!matches(Map("s" -> "sapple"), "{s: {$gte: banana}}"))
    // ISO dates compare lexicographically == chronologically
    assert(matches(Map("ts" -> "s2026-02-21"), "{ts: {$gte: 2026-01-01}}"))
  }

  test("P5 $prefix matches strings only — by ORIGINAL type") {
    assert(matches(Map("src" -> "suser_input"), "{src: {$prefix: user}}"))
    assert(!matches(Map("src" -> "sinput"), "{src: {$prefix: user}}"))
    assert(!matches(Map("n" -> "i123"), "{n: {$prefix: 1}}")) // int value
    // string-typed numeric-looking value CAN prefix-match (round-1 bug)
    assert(matches(Map("n" -> "s123"), "{n: {$prefix: 1}}"))
    assert(matches(Map("v" -> "s2.5"), "{v: {$prefix: '2.'}}"))
  }

  test("P6 $contains lists only") {
    assert(matches(Map("tags" -> """l["sa","sb"]"""), "{tags: {$contains: a}}"))
    assert(!matches(Map("tags" -> """l["sa","sb"]"""), "{tags: {$contains: c}}"))
    assert(!matches(Map("tags" -> "sa"), "{tags: {$contains: a}}")) // scalar
    // typed list elements: int 2 contains-matches operand 2 via str()
    assert(matches(Map("ns" -> """l["i2"]"""), "{ns: {$contains: 2}}"))
  }

  test("P7 implicit AND over top-level keys") {
    val m = Map("a" -> "i1", "b" -> "i2")
    assert(matches(m, "{a: 1, b: 2}"))
    assert(!matches(m, "{a: 1, b: 3}"))
  }

  test("P8/P9 $and and $or combinators") {
    val m = Map("n" -> "i15")
    assert(matches(m, "$and: [{n: {$gte: 10}}, {n: {$lte: 20}}]"))
    assert(!matches(m, "$and: [{n: {$gte: 10}}, {n: {$lte: 12}}]"))
    assert(matches(m, "$or: [{n: 99}, {n: {$gte: 10}}]"))
    assert(!matches(m, "$or: [{n: 99}, {n: {$gte: 20}}]"))
    // vacuous truth table: all([]) true, any([]) false (memo_cli.py:226-238)
    assert(matches(m, "$and: []"))
    assert(!matches(m, "$or: []"))
  }

  test("P10 missing key never matches") {
    assert(!matches(Map("a" -> "i1"), "{b: 1}"))
    assert(!matches(Map("a" -> "i1"), "{b: {$ne: 1}}"))
    assert(!matches(Map("a" -> "i1"), "{b: {$gte: 0}}"))
  }

  test("P11 record without metadata never matches, even empty filter") {
    assert(!matches(Map.empty, "{}"))
    assert(!matches(Map.empty, "{a: 1}"))
    // but a record WITH metadata matches the empty filter
    assert(matches(Map("a" -> "i1"), "{}"))
  }

  test("P12 malformed operator maps are false") {
    assert(!matches(Map("a" -> "i1"), "{a: {$bogus: 1}}"))
  }

  test("parse accepts outer-brace-optional flow maps; rejects garbage") {
    assert(FilterAlgebra.parse("a: 1") == Map("a" -> 1))
    assert(FilterAlgebra.parse("{a: 1}") == Map("a" -> 1))
    assert(FilterAlgebra.parse("") == Map.empty)
    intercept[IllegalArgumentException](FilterAlgebra.parse("[1, 2"))
  }

  test("filter strings type operands with PyYAML 1.1 semantics") {
    // stored: int 7, bool True, string "007" (typed encodings)
    val meta = Map("n" -> "i7", "b" -> "bTrue", "s" -> "s007")
    assert(matches(meta, "{n: 007}")) // octal int 7 == stored int 7
    assert(matches(meta, "{s: '007'}")) // quoted stays the string "007"
    assert(!matches(meta, "{s: 007}")) // int 7 str()s to "7", not "007"
    assert(matches(meta, "{b: yes}")) // 1.1 bool word
    assert(matches(meta, "{b: 'True'}")) // str(True) == "True"
    assert(!matches(meta, "{b: 'yes'}")) // quoted "yes" is not "True"
    assert(matches(meta, "{n: {$gte: 0x7}}")) // hex int operand
  }

  test("canonicalize: single-element $and/$or unwrap, commutative " +
      "sibling sort, empty-$and drop — and NOTHING below the condition " +
      "level rewrites (different predicates never collapse)") {
    def c(s: String): String = FilterAlgebra.operandStr(
      FilterAlgebra.canonicalize(FilterAlgebra.parse(s)))
    // trivial wrappers collapse
    assert(c("$and: [{lang: en}]") == c("lang: en"))
    assert(c("$or: [{lang: en}]") == c("lang: en"))
    assert(c("{$and: [], a: 1}") == c("a: 1")) // all([]) is TRUE
    // commutative siblings sort: implicit-AND keys and combinator lists
    assert(c("{b: 2, a: 1}") == c("{a: 1, b: 2}"))
    assert(c("$and: [{b: 2}, {a: 1}]") == c("$and: [{a: 1}, {b: 2}]"))
    assert(c("$or: [{b: 2}, {a: 1}]") == c("$or: [{a: 1}, {b: 2}]"))
    // nested wrappers unwrap recursively inside list elements
    assert(c("$or: [{$and: [{a: 1}]}, {b: 2}]") == c("$or: [{a: 1}, {b: 2}]"))
    // genuinely different predicates stay different
    assert(c("lang: en") != c("lang: fr"))
    assert(c("$or: [{a: 1}, {b: 2}]") != c("$and: [{a: 1}, {b: 2}]"))
    assert(c("$or: []") != c("{}")) // any([]) is FALSE, not the empty TRUE
    // operand-dict insertion order is semantic (Python str() equality):
    // never sorted
    assert(c("k: \"{'a': 1, 'b': 2}\"") == c("k: \"{'a': 1, 'b': 2}\""))
    assert(c("{k: {$gte: 1, $lte: 9}}") != c("{k: {$lte: 9, $gte: 1}}"))
    // a splice that would collide with a sibling key keeps the wrapper
    // (both conjuncts must hold; a map can carry only one)
    assert(c("{lang: en, $and: [{lang: fr}]}") != c("lang: en"))
    assert(c("{lang: en, $and: [{lang: fr}]}") != c("lang: fr"))
  }

  test("filter keys are literal — no dotted traversal into nested maps") {
    // reference eval_condition: `key not in data` — "user.name" is a plain
    // (missing) key here, NOT a path into the nested map under "user"
    val nested = Map("user" -> ("m" + """{"name":"sada","role":"seng"}"""))
    assert(!matches(nested, "{user.name: ada}"))
    // a literal dotted key DOES match
    assert(matches(Map("user.name" -> "sada"), "{user.name: ada}"))
    // the nested map matches only as a whole via str(dict) equality
    assert(matches(nested, "{user: \"{'name': 'ada', 'role': 'eng'}\"}"))
  }
}
