package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.filter.FilterAlgebra

/** Truth-table tests for the Mongo-style filter algebra P1-P12
  * (reference semantics: memo_cli.py:179-241, SKILL.md:183-249). */
class FilterAlgebraSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  /** One-row df with the given metadata map (values already coerced). */
  private def rec(meta: Map[String, String]): DataFrame = {
    val entries = meta.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val mcol = if (meta.isEmpty) map().cast("map<string,string>")
               else map(entries: _*)
    spark.range(1).select(col("id"), mcol.as("metadata"))
  }

  private def matches(meta: Map[String, String], expr: String): Boolean =
    rec(meta).filter(FilterAlgebra.compile(expr, col("metadata"))).count() == 1

  test("P1 bare equality is string-coerced") {
    assert(matches(Map("priority" -> "2"), "{priority: 2}"))
    assert(matches(Map("priority" -> "2"), "{priority: '2'}"))
    assert(!matches(Map("priority" -> "2"), "{priority: 3}"))
  }

  test("P1 list values match on ANY element") {
    assert(matches(Map("tags" -> """["personal","food"]"""), "{tags: food}"))
    assert(!matches(Map("tags" -> """["personal","food"]"""), "{tags: work}"))
  }

  test("P2 $ne negates including list-any rule") {
    assert(!matches(Map("tags" -> """["a","b"]"""), "{tags: {$ne: a}}"))
    assert(matches(Map("tags" -> """["a","b"]"""), "{tags: {$ne: c}}"))
    assert(matches(Map("x" -> "1"), "{x: {$ne: 2}}"))
  }

  test("P3/P4 numeric compare when both numeric") {
    assert(matches(Map("n" -> "10"), "{n: {$gte: 9}}"))
    assert(matches(Map("n" -> "10"), "{n: {$lte: 10}}"))
    assert(!matches(Map("n" -> "10"), "{n: {$gte: 11}}"))
    // lexicographic would say "10" < "9"; numeric must win
    assert(matches(Map("n" -> "10"), "{n: {$gte: 9}}"))
  }

  test("P3/P4 falls back to lexicographic on mixed types") {
    assert(matches(Map("s" -> "banana"), "{s: {$gte: apple}}"))
    assert(!matches(Map("s" -> "apple"), "{s: {$gte: banana}}"))
    // ISO dates compare lexicographically == chronologically
    assert(matches(Map("ts" -> "2026-02-21"), "{ts: {$gte: 2026-01-01}}"))
  }

  test("P5 $prefix matches strings only") {
    assert(matches(Map("src" -> "user_input"), "{src: {$prefix: user}}"))
    assert(!matches(Map("src" -> "input"), "{src: {$prefix: user}}"))
    assert(!matches(Map("n" -> "123"), "{n: {$prefix: 1}}")) // numeric value
  }

  test("P6 $contains lists only") {
    assert(matches(Map("tags" -> """["a","b"]"""), "{tags: {$contains: a}}"))
    assert(!matches(Map("tags" -> """["a","b"]"""), "{tags: {$contains: c}}"))
    assert(!matches(Map("tags" -> "a"), "{tags: {$contains: a}}")) // scalar
  }

  test("P7 implicit AND over top-level keys") {
    val m = Map("a" -> "1", "b" -> "2")
    assert(matches(m, "{a: 1, b: 2}"))
    assert(!matches(m, "{a: 1, b: 3}"))
  }

  test("P8/P9 $and and $or combinators") {
    val m = Map("n" -> "15")
    assert(matches(m, "$and: [{n: {$gte: 10}}, {n: {$lte: 20}}]"))
    assert(!matches(m, "$and: [{n: {$gte: 10}}, {n: {$lte: 12}}]"))
    assert(matches(m, "$or: [{n: 99}, {n: {$gte: 10}}]"))
    assert(!matches(m, "$or: [{n: 99}, {n: {$gte: 20}}]"))
  }

  test("P10 missing key never matches") {
    assert(!matches(Map("a" -> "1"), "{b: 1}"))
    assert(!matches(Map("a" -> "1"), "{b: {$ne: 1}}"))
    assert(!matches(Map("a" -> "1"), "{b: {$gte: 0}}"))
  }

  test("P11 record without metadata never matches, even empty filter") {
    assert(!matches(Map.empty, "{}"))
    assert(!matches(Map.empty, "{a: 1}"))
    // but a record WITH metadata matches the empty filter
    assert(matches(Map("a" -> "1"), "{}"))
  }

  test("P12 malformed operator maps are false") {
    assert(!matches(Map("a" -> "1"), "{a: {$bogus: 1}}"))
  }

  test("parse accepts outer-brace-optional flow maps; rejects garbage") {
    assert(FilterAlgebra.parse("a: 1") == Map("a" -> 1))
    assert(FilterAlgebra.parse("{a: 1}") == Map("a" -> 1))
    assert(FilterAlgebra.parse("") == Map.empty)
    intercept[IllegalArgumentException](FilterAlgebra.parse("[1, 2"))
  }

  test("dotted key resolves into JSON-encoded nested metadata") {
    val m = Map("user" -> """{"name":"ada","role":"eng"}""")
    assert(matches(m, "{user.name: ada}"))
    assert(!matches(m, "{user.name: bob}"))
  }
}
