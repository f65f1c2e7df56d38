package graft

import graft.memo.{JsonlIO, MetaCodec, YamlIO}

/** YamlIO edge cases: typed-encoding round-trips, quoting, special
  * characters, validation failures, distributed bulk import. */
class YamlIOSpec extends SparkTestBase {

  test("export quotes values that need it and round-trips them typed") {
    import spark.implicits._
    val recs = Seq(
      (0L, "body with: colon", Map("k" -> "svalue: with colon")),
      (1L, "body 'quoted'", Map("weird key!" -> "sit's quoted")),
      (2L, "unicode ünïcödé", Map("k" -> "scafé")),
      // numeric-looking / YAML-keyword strings MUST survive as strings
      (3L, "tricky scalars", Map(
        "a" -> "s007", "b" -> "s1e5", "c" -> "snull", "d" -> "strue",
        "e" -> "s2.5", "f" -> "i7", "g" -> "f2.5", "h" -> "bTrue",
        "i" -> "z"))
    ).toDF("id", "body", "metadata")
    val yaml = YamlIO.exportTable(recs)
    val back = YamlIO.importTable(spark, yaml).orderBy("id").collect()
    assert(back.length == 4)
    assert(back(0).getString(1) == "body with: colon")
    assert(back(0).getMap[String, String](2)("k") == "svalue: with colon")
    assert(back(1).getMap[String, String](2)("weird key!") == "sit's quoted")
    assert(back(2).getString(1) == "unicode ünïcödé")
    val tricky = back(3).getMap[String, String](2)
    assert(tricky("a") == "s007") // not re-parsed to int 7
    assert(tricky("b") == "s1e5") // not float 100000.0
    assert(tricky("c") == "snull") // not None
    assert(tricky("d") == "strue") // not bool
    assert(tricky("e") == "s2.5")
    assert(tricky("f") == "i7") // int stays int
    assert(tricky("g") == "f2.5") // float stays float
    assert(tricky("h") == "bTrue")
    assert(tricky("i") == "z") // None stays None
  }

  test("export preserves body trailing-newline chomping") {
    import spark.implicits._
    val recs = Seq(
      (0L, "no trailing", Map.empty[String, String]),
      (1L, "one trailing\n", Map.empty[String, String]),
      (2L, "two trailing\n\n", Map.empty[String, String]),
      (3L, "interior\n\nblanks kept", Map.empty[String, String])
    ).toDF("id", "body", "metadata")
    val back = YamlIO.importTable(spark, YamlIO.exportTable(recs))
      .orderBy("id").collect()
    assert(back(0).getString(1) == "no trailing")
    assert(back(1).getString(1) == "one trailing\n")
    assert(back(2).getString(1) == "two trailing\n\n")
    assert(back(3).getString(1) == "interior\n\nblanks kept")
  }

  test("nested metadata keeps original YAML types through import") {
    val recs = YamlIO.importTable(spark,
      """---
        |id: 0
        |body: nested
        |metadata:
        |  user: {name: ada, langs: [scala, python]}
        |  count: 7
        |  quoted: "007"
        |""".stripMargin)
    val meta = recs.collect()(0).getMap[String, String](2)
    assert(meta("count") == "i7")
    assert(meta("quoted") == "s007") // PyYAML keeps quoted scalars strings
    assert(MetaCodec.sigil(meta("user")) == 'm')
    // nested map renders as Python str(dict) for filters / YAML flow for cells
    assert(MetaCodec.pyStr(meta("user")) ==
      "{'name': 'ada', 'langs': ['scala', 'python']}")
    assert(MetaCodec.flowYaml(meta("user")) ==
      "{name: ada, langs: [scala, python]}")
    // filter keys are literal: no dotted traversal (reference semantics)
    import org.apache.spark.sql.functions._
    val filtered = recs.filter(graft.filter.FilterAlgebra.compile(
      "{user.name: ada}", col("metadata"))).count()
    assert(filtered == 0)
  }

  test("save batch validation: bad id types and non-map metadata rejected") {
    intercept[IllegalArgumentException](
      YamlIO.parseSaveBatch("---\nid: -3\nbody: x\n"))
    intercept[IllegalArgumentException](
      YamlIO.parseSaveBatch("---\nbody: x\nmetadata: [not, a, map]\n"))
    // null docs are skipped silently (memo_cli.py:374-375)
    assert(YamlIO.parseSaveBatch("---\n---\nbody: ok\n").length == 1)
  }

  test("metadata values encode with their original YAML types") {
    val batch = YamlIO.parseSaveBatch(
      "---\nbody: x\nmetadata: {flag: true, n: 7, f: 2.5, s: '7', nil: null}\n")
    val meta = batch.head._3
    assert(meta("flag") == "bTrue")
    assert(meta("n") == "i7")
    assert(meta("f") == "f2.5")
    assert(meta("s") == "s7") // quoted → string
    assert(meta("nil") == "z")
  }

  test("distributed export shards concatenate to the driver export") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val recs = (0L until 300L).map { i =>
      (i, s"doc $i body\nsecond line", Map("k" -> s"sv$i", "n" -> s"i$i"))
    }.toDF("id", "body", "metadata")
    val driver = YamlIO.exportTable(recs)
    val sharded = YamlIO.exportRecordsDistributed(recs, shards = 4)
    // per-record docs, globally ordered across range shards
    val docs = sharded.select("id", "doc").as[(Long, String)]
      .collect()
    assert(docs.map(_._1).toSeq == docs.map(_._1).sorted.toSeq)
    assert(docs.map(_._2).mkString == driver)
    // round-trips through the importer too
    val back = YamlIO.importTable(spark, docs.map(_._2).mkString)
    assert(back.count() == 300)
    assert(back.filter(col("id") === 7).collect()(0)
      .getMap[String, String](2)("n") == "i7")
  }

  test("fuzz: random typed metadata survives export → import exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    val strings = Seq("plain", "with space", "007", "1e5", "null", "true",
      "yes", "on", "~", "a:b", "a: b", "it's", "\"quoted\"", "# hash",
      "- dash", "[brack]", "{brace}", "0x1F", "0b101", "1_000", "1:30",
      "2026-03-14", ".inf", "café ünï", "", " lead", "trail ", "multi\nline",
      "tab\tchar")
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
      val body = rnd.nextInt(4) match {
        case 0 => s"single line $i"
        case 1 => s"multi\nline\ndoc $i"
        case 2 => s"trailing newline $i\n"
        case 3 => s"  indented first line $i\nrest"
      }
      (i, body, meta)
    }
    val df = docs.toDF("id", "body", "metadata")
    val back = YamlIO.importTable(spark, YamlIO.exportTable(df))
      .orderBy("id").collect()
    assert(back.length == 200)
    docs.zip(back).foreach { case ((id, body, meta), row) =>
      assert(row.getLong(0) == id)
      assert(row.getString(1) == body, s"body drift at id=$id")
      val gotMeta = Option(row.getMap[String, String](2))
        .map(_.toSeq.sortBy(_._1)).getOrElse(Seq.empty)
      assert(gotMeta == meta.toSeq.sortBy(_._1), s"metadata drift at id=$id")
    }
  }

  test("import resolves scalars with PyYAML 1.1 semantics") {
    val recs = YamlIO.importTable(spark,
      """---
        |id: 0
        |body: b
        |metadata:
        |  y: yes
        |  n: Off
        |  oct: 007
        |  hex: 0x1F
        |  bin: 0b101
        |  us: 1_000
        |  sex: 1:30
        |  f: 1.5
        |  fe: 1.5e+3
        |  fe_nosign: 1.5e3
        |  ninf: -.inf
        |  tilde: ~
        |  date: 2026-03-14
        |  huge: 999999999999999999999999
        |""".stripMargin)
    val meta = recs.collect()(0).getMap[String, String](2)
    assert(meta("y") == "bTrue") // yes → bool (YAML 1.1)
    assert(meta("n") == "bFalse") // Off → bool
    assert(meta("oct") == "i7") // leading zero = octal
    assert(meta("hex") == "i31")
    assert(meta("bin") == "i5")
    assert(meta("us") == "i1000") // underscores stripped
    assert(meta("sex") == "i90") // sexagesimal 1:30
    assert(meta("f") == "f1.5")
    assert(meta("fe") == "f1500.0") // exponent WITH sign is a float
    assert(meta("fe_nosign") == "s1.5e3") // PyYAML quirk: no sign → string
    assert(meta("ninf") == "f-inf")
    assert(meta("tilde") == "z")
    assert(meta("date") == "s2026-03-14") // timestamp typing not mirrored
    assert(meta("huge") == "s999999999999999999999999") // beyond Long → string
    // filter expressions get the same typing: yes matches a stored bool
    import org.apache.spark.sql.functions._
    assert(recs.filter(graft.filter.FilterAlgebra.compile(
      "{y: yes}", col("metadata"))).count() == 1)
    assert(recs.filter(graft.filter.FilterAlgebra.compile(
      "{oct: 7}", col("metadata"))).count() == 1)
  }

  test("path import/export: multi-split shard dir round-trips byte-exactly") {
    import spark.implicits._
    val recs = (0L until 400L).map { i =>
      val body = (i % 5) match {
        case 0 => s"doc $i\nsecond line"
        case 1 => s"one trailing $i\n"
        case 2 => s"keep blanks $i\n\n\n" // |+ chomp — exercises \n restore
        case 3 => s"  indented first $i\nrest"
        case _ => s"plain $i"
      }
      (i, body, Map("k" -> s"sv$i", "n" -> s"i$i"))
    }
    val df = recs.toDF("id", "body", "metadata")
    val dir = java.nio.file.Files.createTempDirectory("yaml_path")
      .resolve("shards").toString
    YamlIO.exportPath(df, dir, shards = 4)
    // concatenated shard bytes reproduce the driver render exactly
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val concat = parts.map(f => java.nio.file.Files.readString(f.toPath)).mkString
    assert(concat == YamlIO.exportTable(df))
    // read back with tiny splits so records straddle split boundaries
    val back = YamlIO.importPath(spark, dir, maxSplitBytes = 512)
    assert(back.rdd.getNumPartitions > 4) // genuinely multi-split
    val rows = back.orderBy("id").collect()
    assert(rows.length == 400)
    recs.zip(rows).foreach { case ((id, body, meta), row) =>
      assert(row.getLong(0) == id)
      assert(row.getString(1) == body, s"body drift at id=$id")
      assert(row.getMap[String, String](2).toMap == meta, s"meta drift id=$id")
    }
    back.unpersist()
  }

  test("path interchange edges: empty table and no-trailing-newline file") {
    // empty store → export writes no docs → import reads an empty table
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      YamlIO.recordSchema)
    val dir = java.nio.file.Files.createTempDirectory("yaml_empty")
      .resolve("d").toString
    YamlIO.exportPath(empty, dir)
    assert(YamlIO.importPath(spark, dir).count() == 0)
    // a hand-edited file whose last record has no trailing newline
    val f = java.nio.file.Files.createTempDirectory("yaml_nonl")
      .resolve("db.yaml")
    java.nio.file.Files.writeString(f,
      "---\nid: 0\nbody: |-\n  first\n---\nid: 1\nbody: |-\n  last line")
    val rows = YamlIO.importPath(spark, f.toString).orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("first", "last line"))
  }

  test("path import: duplicate ids across splits abort") {
    val f = java.nio.file.Files.createTempDirectory("yaml_dup").resolve("db.yaml")
    val docs = (0 until 50).map(i => s"---\nid: $i\nbody: |-\n  d $i\n").mkString +
      "---\nid: 7\nbody: dup\n"
    java.nio.file.Files.writeString(f, docs)
    val e = intercept[IllegalArgumentException](
      YamlIO.importPath(spark, f.toString, maxSplitBytes = 256).count())
    assert(e.getMessage.toLowerCase.contains("duplicate"))
  }

  test("bulk import parses distributed and still rejects duplicate ids") {
    val n = YamlIO.BulkParseThreshold + 50
    val docs = (0 until n).map { i =>
      s"---\nid: $i\nbody: |-\n  doc $i line\nmetadata: {k: v$i}\n"
    }.mkString
    val df = YamlIO.importTable(spark, docs)
    assert(df.rdd.getNumPartitions > 1) // actually distributed
    assert(df.count() == n)
    val r = df.filter(df("id") === 42).collect()(0)
    assert(r.getString(1) == "doc 42 line")
    assert(r.getMap[String, String](2)("k") == "sv42")
    df.unpersist()
    // duplicate id anywhere in the bulk batch aborts
    val dup = docs + s"---\nid: 7\nbody: dup\n"
    val e = intercept[IllegalArgumentException](
      YamlIO.importTable(spark, dup).count())
    assert(e.getMessage.toLowerCase.contains("duplicate"))
  }

  test("driver-sized export twins refuse an over-cap table (use the path form)") {
    import spark.implicits._
    val recs = (0L until 5L).map(i => (i, s"body $i", Map("k" -> "sv")))
      .toDF("id", "body", "metadata")
    val err = intercept[IllegalArgumentException] {
      YamlIO.exportTable(recs, maxRows = 3)
    }
    assert(err.getMessage.contains("exportPath"), err.getMessage)
    val err2 = intercept[IllegalArgumentException] {
      JsonlIO.exportTable(recs, maxRows = 3)
    }
    assert(err2.getMessage.contains("exportPath"), err2.getMessage)
    // under the cap both still render
    assert(YamlIO.exportTable(recs, maxRows = 5).nonEmpty)
    assert(JsonlIO.exportTable(recs, maxRows = 5).nonEmpty)
  }
}
