package graft.memo

import com.fasterxml.jackson.core.JsonParser
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** JSONL (newline-delimited JSON) interchange for memo records — the
  * canonical training-data format, beside the reference-parity YAML of
  * [[YamlIO]]. One record per line: `{"id":N,"body":"...","metadata":{…}}`.
  *
  * Types round-trip exactly through [[MetaCodec]]'s encoding: an int
  * metadata value exports as a JSON number and re-imports as `i…`, a
  * quoted "007" stays a string, bools/nulls/lists/nested maps recurse.
  * JSON has no quoting ambiguity (unlike YAML 1.1 scalars), so no
  * resolver shim is needed — the only non-standard corner is non-finite
  * floats, exported as `Infinity`/`-Infinity`/`NaN` (Python json.dumps
  * convention) and accepted back via jackson's non-numeric-numbers flag.
  *
  * Both directions are distributed: export renders lines on executors
  * into range shards whose name-order concatenation is deterministic
  * (ordered by id); import is a plain splittable text scan — JSONL's one
  * record per line needs none of the YAML scan's delimiter repairs.
  */
object JsonlIO {

  /** Render one typed metadata value (MetaCodec encoding) as JSON text. */
  def jsonValue(t: String): String = MetaCodec.sigil(t) match {
    case 's' => MetaCodec.jsonQuote(MetaCodec.payload(t))
    case 'i' => MetaCodec.payload(t)
    case 'f' => MetaCodec.payload(t) match {
      case "inf" => "Infinity"
      case "-inf" => "-Infinity"
      case "nan" => "NaN"
      case p => p
    }
    case 'b' => if (MetaCodec.payload(t) == "True") "true" else "false"
    case 'z' => "null"
    case 'l' => MetaCodec.parseJsonStringArray(MetaCodec.payload(t))
      .map(jsonValue).mkString("[", ",", "]")
    case 'm' => MetaCodec.parseJsonStringMap(MetaCodec.payload(t))
      .map { case (k, v) => MetaCodec.jsonQuote(k) + ":" + jsonValue(v) }
      .mkString("{", ",", "}")
  }

  /** One record as a JSONL line (no trailing newline — the text sink and
    * driver-side join add it). */
  def renderLine(id: Long, body: String, meta: Seq[(String, String)]): String = {
    val m = meta.map { case (k, v) =>
      MetaCodec.jsonQuote(k) + ":" + jsonValue(v)
    }.mkString("{", ",", "}")
    s"""{"id":$id,"body":${MetaCodec.jsonQuote(body)},"metadata":$m}"""
  }

  /** Distributed export: per-record lines rendered on executors,
    * range-sharded and sorted so shard files concatenate in global id
    * order. Returns (id, line); [[exportPath]] writes it. */
  def exportRecords(records: DataFrame, shards: Int = 0): DataFrame = {
    val spark = records.sparkSession
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = records.select("id", "body", "metadata")
    val arranged =
      (if (shards > 0) base.repartitionByRange(shards, col("id"))
       else base.repartitionByRange(col("id")))
        .sortWithinPartitions("id")
    arranged.map { r =>
      (r.getLong(0), renderLine(r.getLong(0), r.getString(1),
        Option(r.getMap[String, String](2)).map(_.toSeq).getOrElse(Seq.empty)))
    }.toDF("id", "line")
  }

  def exportPath(records: DataFrame, path: String, shards: Int = 0): Unit =
    exportRecords(records, shards).select("line")
      .write.mode("overwrite").text(path)

  /** Driver-side render (CLI-batch-sized twin of [[exportPath]]). */
  def exportTable(records: DataFrame,
      maxRows: Long = YamlIO.DriverExportMaxRows): String = {
    YamlIO.guardDriverExport(records, "JsonlIO.exportTable", "exportPath",
      maxRows)
    val sb = new StringBuilder
    records.select("id", "body", "metadata").orderBy("id").collect()
      .foreach { r =>
        sb.append(renderLine(r.getLong(0), r.getString(1),
          Option(r.getMap[String, String](2)).map(_.toSeq).getOrElse(Seq.empty)))
        sb.append('\n')
      }
    sb.toString
  }

  private def newMapper(): ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS, true)
    m
  }

  /** JSON value → MetaCodec typed encoding (the import-side inverse of
    * [[jsonValue]]; floats re-repr through pyFloatRepr so the stored form
    * is identical whether a value arrived via YAML or JSONL). */
  private def encodeNode(n: JsonNode): String = {
    if (n == null || n.isNull) "z"
    else if (n.isBoolean) { if (n.booleanValue()) "bTrue" else "bFalse" }
    else if (n.isIntegralNumber) "i" + n.bigIntegerValue()
    else if (n.isNumber) "f" + MetaCodec.pyFloatRepr(n.doubleValue())
    else if (n.isTextual) "s" + n.textValue()
    else if (n.isArray) {
      val it = n.elements()
      val parts = Vector.newBuilder[String]
      while (it.hasNext) parts += MetaCodec.jsonQuote(encodeNode(it.next()))
      "l" + parts.result().mkString("[", ",", "]")
    } else if (n.isObject) {
      val it = n.fields()
      val parts = Vector.newBuilder[String]
      while (it.hasNext) {
        val e = it.next()
        parts += MetaCodec.jsonQuote(e.getKey) + ":" +
          MetaCodec.jsonQuote(encodeNode(e.getValue))
      }
      "m" + parts.result().mkString("{", ",", "}")
    } else throw new IllegalArgumentException(s"Unsupported JSON value: $n")
  }

  private def parseLine(mapper: ObjectMapper, line: String): Row = {
    val node = mapper.readTree(line)
    if (node == null || !node.isObject)
      throw new IllegalArgumentException(s"Each JSONL line must be an object: $line")
    val idNode = node.get("id")
    if (idNode == null || !idNode.isIntegralNumber || idNode.longValue() < 0)
      throw new IllegalArgumentException(
        s"Record requires a non-negative integer id, got: $idNode")
    val id = idNode.longValue()
    val bodyNode = node.get("body")
    if (bodyNode == null || !bodyNode.isTextual)
      throw new IllegalArgumentException(s"Record $id missing body")
    val meta = node.get("metadata") match {
      case o if o == null || o.isNull => Map.empty[String, String]
      case o if o.isObject =>
        val it = o.fields()
        val b = scala.collection.immutable.ListMap.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> encodeNode(e.getValue)
        }
        b.result()
      case other => throw new IllegalArgumentException(
        s"Record $id metadata must be an object, got: $other")
    }
    Row(id, bodyNode.textValue(), meta)
  }

  /** Distributed import from a JSONL file or shard directory: splittable
    * text scan, one jackson mapper per partition, blank lines skipped,
    * duplicate-id check as an aggregation (same contract as
    * [[YamlIO.importPath]]). Caller owns the returned cache. */
  def importPath(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.read.textFile(path).rdd.mapPartitions { it =>
      val mapper = newMapper()
      it.flatMap { line =>
        if (line.trim.isEmpty) None else Some(parseLine(mapper, line))
      }
    }
    YamlIO.importRows(spark, rdd)
  }

  /** Driver-side parse (CLI-batch-sized twin of [[importPath]]). */
  def importTable(spark: SparkSession, text: String): DataFrame = {
    val mapper = newMapper()
    val rows = text.split("\n").toSeq.filter(_.trim.nonEmpty)
      .map(parseLine(mapper, _))
    YamlIO.importRows(spark, spark.sparkContext.parallelize(rows, 1))
  }
}
