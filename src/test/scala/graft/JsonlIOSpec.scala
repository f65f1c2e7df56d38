package graft

import graft.memo.{JsonlIO, MemoEngine, YamlIO}

/** JSONL interchange: typed round-trips, shard/concat determinism,
  * validation, non-finite floats, engine wiring. */
class JsonlIOSpec extends SparkTestBase {

  test("typed metadata fuzz survives JSONL export → import exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(4711)
    val strings = Seq("plain", "with space", "007", "1e5", "null", "true",
      "yes", "\"quoted\"", "back\\slash", "new\nline", "tab\tchar",
      "café ünï", "", "{brace}", "[brack]", "emoji ✓")
    def scalar(): Any = rnd.nextInt(5) match {
      case 0 => Int.box(rnd.nextInt(2000) - 1000)
      case 1 => Double.box((rnd.nextInt(4000) - 2000) / 8.0)
      case 2 => Boolean.box(rnd.nextBoolean())
      case 3 => strings(rnd.nextInt(strings.length))
      case 4 => null
    }
    def value(): Any = rnd.nextInt(10) match {
      case 8 => (0 until rnd.nextInt(4)).map(_ => scalar()).toList
      case 9 =>
        val m = new java.util.LinkedHashMap[String, Any]()
        (0 until 1 + rnd.nextInt(3)).foreach(i => m.put(s"k$i", scalar()))
        m
      case _ => scalar()
    }
    val docs = (0L until 200L).map { i =>
      val meta = scala.collection.immutable.ListMap.from(
        (0 until rnd.nextInt(5)).map(j =>
          s"key$j" -> YamlIO.encodeMetaValue(value())))
      (i, s"body $i with \"quotes\" and\nnewline", meta)
    }
    val df = docs.toDF("id", "body", "metadata")
    val backDf = JsonlIO.importTable(spark, JsonlIO.exportTable(df))
    val back = backDf.orderBy("id").collect()
    assert(back.length == 200)
    docs.zip(back).foreach { case ((id, body, meta), row) =>
      assert(row.getLong(0) == id)
      assert(row.getString(1) == body)
      val got = Option(row.getMap[String, String](2))
        .map(_.toSeq.sortBy(_._1)).getOrElse(Seq.empty)
      assert(got == meta.toSeq.sortBy(_._1), s"metadata drift at id=$id")
    }
    backDf.unpersist()
  }

  test("sharded export concatenates to the driver render; path import reads it") {
    import spark.implicits._
    val recs = (0L until 300L).map(i =>
      (i, s"doc $i", Map("n" -> s"i$i", "f" -> "f2.5"))).toDF("id", "body", "metadata")
    val dir = java.nio.file.Files.createTempDirectory("jsonl")
      .resolve("shards").toString
    JsonlIO.exportPath(recs, dir, shards = 4)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val concat = parts.map(f => java.nio.file.Files.readString(f.toPath)).mkString
    assert(concat == JsonlIO.exportTable(recs))
    val back = JsonlIO.importPath(spark, dir)
    assert(back.count() == 300)
    assert(back.filter(back("id") === 7).collect()(0)
      .getMap[String, String](2)("n") == "i7")
    back.unpersist()
  }

  test("non-finite floats round-trip via Infinity/NaN tokens") {
    import spark.implicits._
    val recs = Seq((0L, "b", Map(
      "pi" -> "finf", "ni" -> "f-inf", "nn" -> "fnan"))).toDF("id", "body", "metadata")
    val line = JsonlIO.exportTable(recs)
    assert(line.contains("\"pi\":Infinity") && line.contains("\"ni\":-Infinity")
      && line.contains("\"nn\":NaN"))
    val meta = JsonlIO.importTable(spark, line).collect()(0)
      .getMap[String, String](2)
    assert(meta("pi") == "finf" && meta("ni") == "f-inf" && meta("nn") == "fnan")
  }

  test("validation: duplicate ids, bad id, missing body, blank lines") {
    intercept[IllegalArgumentException](JsonlIO.importTable(spark,
      """{"id":0,"body":"a"}
        |{"id":0,"body":"b"}""".stripMargin).count())
    intercept[IllegalArgumentException](JsonlIO.importTable(spark,
      """{"id":1.5,"body":"a"}"""))
    intercept[IllegalArgumentException](JsonlIO.importTable(spark,
      """{"id":2}"""))
    // blank lines are skipped
    assert(JsonlIO.importTable(spark,
      "\n{\"id\":0,\"body\":\"a\"}\n\n").count() == 1)
  }

  test("engine JSONL export → import round-trips the store distributed") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_engine")
    val engine = new MemoEngine(spark, s"$dir/db")
    engine.save("---\nbody: note one\nmetadata: {k: 1, f: 2.5, s: '007'}\n" +
      "---\nbody: |-\n  multi\n  line\n")
    val out = dir.resolve("dump.jsonl.d").toString
    engine.exportJsonlPath(out)
    val engine2 = new MemoEngine(spark, s"$dir/db2")
    engine2.importJsonlPath(out)
    val a = engine.records.orderBy("id").collect().toSeq
    val b = engine2.records.orderBy("id").collect().toSeq
    assert(a == b)
    engine.clean(); engine2.clean()
  }
}
