package graft

import graft.memo.YamlIO

/** YamlIO edge cases: quoting, special characters, nested metadata
  * encodings, validation failures. */
class YamlIOSpec extends SparkTestBase {

  test("export quotes values that need it and round-trips them") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val recs = Seq(
      (0L, "body with: colon", Map("k" -> "value: with colon")),
      (1L, "body 'quoted'", Map("weird key!" -> "it's quoted")),
      (2L, "unicode ünïcödé", Map("k" -> "café"))
    ).toDF("id", "body", "metadata")
    val yaml = YamlIO.exportTable(recs)
    val back = YamlIO.importTable(spark, yaml)
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getString(1) == "body with: colon")
    assert(back(0).getMap[String, String](2)("k") == "value: with colon")
    assert(back(1).getMap[String, String](2)("weird key!") == "it's quoted")
    assert(back(2).getString(1) == "unicode ünïcödé")
  }

  test("nested metadata encodes as JSON and resolves with dotted keys") {
    val recs = YamlIO.importTable(spark,
      """---
        |id: 0
        |body: nested
        |metadata:
        |  user: {name: ada, langs: [scala, python]}
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    val v = recs.select(
      graft.filter.FilterAlgebra.resolveValue(col("metadata"), "user.name"))
      .collect()(0).getString(0)
    assert(v == "ada")
    val filtered = recs.filter(graft.filter.FilterAlgebra.compile(
      "{user.name: ada}", col("metadata"))).count()
    assert(filtered == 1)
  }

  test("save batch validation: bad id types and non-map metadata rejected") {
    intercept[IllegalArgumentException](
      YamlIO.parseSaveBatch("---\nid: -3\nbody: x\n"))
    intercept[IllegalArgumentException](
      YamlIO.parseSaveBatch("---\nbody: x\nmetadata: [not, a, map]\n"))
    // null docs are skipped silently (memo_cli.py:374-375)
    assert(YamlIO.parseSaveBatch("---\n---\nbody: ok\n").length == 1)
  }

  test("boolean and numeric metadata values coerce canonically") {
    val batch = YamlIO.parseSaveBatch(
      "---\nbody: x\nmetadata: {flag: true, n: 7, f: 2.5}\n")
    val meta = batch.head._3
    assert(meta("flag") == "true")
    assert(meta("n") == "7")
    assert(meta("f") == "2.5")
  }
}
