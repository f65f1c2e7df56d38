package graft.memo

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.filter.FilterAlgebra

/** YAML import/export for memo tables (reference S1/S2/S3:
  * /root/reference/memo_cli.py:66-128, 369-400). The canonical store in this
  * engine is Parquet; YAML is an interchange format, parsed driver-side for
  * small batches or via mapPartitions for bulk import.
  *
  * Record: `{id: Long, body: String (literal block), metadata: map}`.
  * Metadata values are stored string-coerced; lists/nested maps as JSON
  * (matching [[FilterAlgebra]]'s comparison encoding).
  */
object YamlIO {

  val recordSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))

  private def loadAll(text: String): Seq[Any] = {
    val settings = org.snakeyaml.engine.v2.api.LoadSettings.builder().build()
    new org.snakeyaml.engine.v2.api.Load(settings)
      .loadAllFromString(text).asScala.toSeq
  }

  /** Coerce a parsed YAML metadata value to the stored string encoding. */
  def encodeMetaValue(v: Any): String = v match {
    case l: java.util.List[_] =>
      l.asScala.map(e => jsonStr(FilterAlgebra.coerceString(e)))
        .mkString("[", ",", "]")
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) =>
        jsonStr(String.valueOf(k)) + ":" + jsonStr(FilterAlgebra.coerceString(x))
      }.mkString("{", ",", "}")
    case other => FilterAlgebra.coerceString(other)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Parse a save-input YAML batch (multi-doc; null docs skipped; body
    * required non-blank; optional non-negative id for overwrite —
    * memo_cli.py:369-400). Returns (id option, body, metadata). */
  def parseSaveBatch(text: String): Seq[(Option[Long], String, Map[String, String])] =
    loadAll(text).flatMap {
      case null => None
      case m: java.util.Map[_, _] =>
        val mm = m.asScala.map { case (k, v) => String.valueOf(k) -> v }.toMap
        val body = mm.get("body").map(String.valueOf).getOrElse("")
        if (body.trim.isEmpty)
          throw new IllegalArgumentException("Save entry requires a non-empty 'body'")
        val id = mm.get("id").map {
          case n: java.lang.Number if n.longValue() >= 0 => n.longValue()
          case bad => throw new IllegalArgumentException(
            s"Invalid id in save entry: $bad")
        }
        val meta = mm.get("metadata") match {
          case Some(mp: java.util.Map[_, _]) =>
            mp.asScala.map { case (k, v) =>
              String.valueOf(k) -> encodeMetaValue(v)
            }.toMap
          case Some(null) | None => Map.empty[String, String]
          case Some(bad) => throw new IllegalArgumentException(
            s"metadata must be a mapping, got: $bad")
        }
        Some((id, body, meta))
      case bad =>
        throw new IllegalArgumentException(s"Save entry must be a mapping: $bad")
    }

  /** Parse a full DB YAML (id required unique, body required —
    * memo_cli.py:66-109) into a records DataFrame. */
  def importTable(spark: SparkSession, text: String): DataFrame = {
    val recs = loadAll(text).flatMap {
      case null => None
      case m: java.util.Map[_, _] =>
        val mm = m.asScala.map { case (k, v) => String.valueOf(k) -> v }.toMap
        val id = mm.get("id") match {
          case Some(n: java.lang.Number) if n.longValue() >= 0 => n.longValue()
          case other => throw new IllegalArgumentException(
            s"Record requires a non-negative integer id, got: $other")
        }
        val body = mm.get("body") match {
          case Some(b) if b != null => String.valueOf(b)
          case _ => throw new IllegalArgumentException(s"Record $id missing body")
        }
        val meta = mm.get("metadata") match {
          case Some(mp: java.util.Map[_, _]) =>
            mp.asScala.map { case (k, v) =>
              String.valueOf(k) -> encodeMetaValue(v) }.toMap
          case _ => Map.empty[String, String]
        }
        Some((id, body, meta))
      case bad => throw new IllegalArgumentException(s"Bad record: $bad")
    }
    val dup = recs.groupBy(_._1).collectFirst { case (id, rs) if rs.size > 1 => id }
    dup.foreach(id => throw new IllegalArgumentException(s"Duplicate id $id"))
    val rows = recs.map { case (id, body, meta) => Row(id, body, meta) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), recordSchema)
  }

  /** Serialize records (id, body, metadata) as explicit-start multi-doc YAML
    * with body as a literal block scalar (memo_cli.py:112-128, 27-35). */
  def exportTable(records: DataFrame): String = {
    val rows = records.select("id", "body", "metadata")
      .orderBy("id").collect()
    val sb = new StringBuilder
    rows.foreach { r =>
      val id = r.getLong(0)
      val body = r.getString(1)
      val meta = Option(r.getMap[String, String](2))
        .map(_.toMap).getOrElse(Map.empty)
      sb.append("---\n")
      sb.append(s"id: $id\n")
      if (meta.isEmpty) sb.append("metadata: {}\n")
      else {
        sb.append("metadata:\n")
        meta.toSeq.sortBy(_._1).foreach { case (k, v) =>
          sb.append(s"  ${yamlKey(k)}: ${yamlScalar(v)}\n")
        }
      }
      sb.append("body: |-\n")
      val lines = if (body.isEmpty) Seq("") else body.split("\n", -1).toSeq
      lines.foreach(ln => sb.append(s"  $ln\n"))
    }
    sb.toString
  }

  private def yamlKey(s: String): String =
    if (s.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*")) s else "'" + s.replace("'", "''") + "'"

  private def yamlScalar(s: String): String =
    if (s.matches("-?[0-9.]+") || s.matches("[A-Za-z0-9_][A-Za-z0-9_ .-]*")) s
    else "'" + s.replace("'", "''") + "'"
}
