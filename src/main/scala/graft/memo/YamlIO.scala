package graft.memo

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** YAML import/export for memo tables (reference S1/S2/S3:
  * /root/reference/memo_cli.py:66-128, 369-400). The canonical store in this
  * engine is Parquet; YAML is an interchange format. Small batches parse
  * driver-side; bulk imports split into docs and parse inside
  * `mapPartitions` (SURVEY §2.1 row S1), so a 100 TB multi-doc ingest is a
  * distributed scan, not a driver loop.
  *
  * Record: `{id: Long, body: String (literal block), metadata: map}`.
  * Metadata values are stored in [[MetaCodec]]'s typed string encoding, so
  * the original YAML types survive the round trip — a quoted "007" re-exports
  * quoted, `deleted: 1` stays an int, and the filter algebra can reproduce
  * the reference's typed comparisons.
  */
object YamlIO {

  val recordSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))

  /** Above this many docs, importTable parses distributed. */
  val BulkParseThreshold = 512

  private def loadAll(text: String): Seq[Any] = {
    val settings = org.snakeyaml.engine.v2.api.LoadSettings.builder().build()
    new org.snakeyaml.engine.v2.api.Load(settings)
      .loadAllFromString(text).asScala.toSeq
  }

  /** Coerce a parsed YAML metadata value to the stored typed encoding. */
  def encodeMetaValue(v: Any): String = MetaCodec.encode(v)

  /** Parse a save-input YAML batch (multi-doc; null docs skipped; body
    * required non-blank; optional non-negative id for overwrite —
    * memo_cli.py:369-400). Returns (id option, body, metadata). */
  def parseSaveBatch(text: String): Seq[(Option[Long], String, Map[String, String])] =
    {
      val entries = loadAll(text).flatMap {
        case null => None
        case m: java.util.Map[_, _] =>
          val mm = m.asScala.map { case (k, v) => String.valueOf(k) -> v }.toMap
          if (!mm.contains("body")) throw new IllegalArgumentException(
            "each YAML document requires 'body'") // memo_cli.py:381
          val body = mm.get("body") match {
            case Some(s: String) if s.trim.nonEmpty => s
            case _ => throw new IllegalArgumentException(
              "body must be a non-empty string") // memo_cli.py:385
          }
          val id = mm.get("id").map {
            case n: java.lang.Number if n.longValue() >= 0 => n.longValue()
            case _ => throw new IllegalArgumentException(
              "id must be a non-negative integer when provided")
          }
          val meta = mm.get("metadata") match {
            case Some(mp: java.util.Map[_, _]) => orderedMeta(mp)
            case Some(null) | None => Map.empty[String, String]
            case Some(_) => throw new IllegalArgumentException(
              "metadata must be a mapping when provided")
          }
          Some((id, body, meta))
        case _ =>
          throw new IllegalArgumentException("each YAML document must be a mapping")
      }
      if (entries.isEmpty)
        throw new IllegalArgumentException("input YAML contains no entries")
      entries
    }

  /** Parse one full-DB YAML document into (id, body, metadata) — validation
    * per memo_cli.py:66-109. */
  private def parseRecord(m: java.util.Map[_, _]): (Long, String, Map[String, String]) = {
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
      case Some(mp: java.util.Map[_, _]) => orderedMeta(mp)
      case _ => Map.empty[String, String]
    }
    (id, body, meta)
  }

  /** Encode a metadata mapping preserving KEY ORDER (Python dicts are
    * insertion-ordered; format_cell's flow dump and YAML export must render
    * keys in original order). Iterate via `.iterator` — `.map` on the java
    * wrapper would rebuild into an unordered HashMap — and materialize as
    * ListMap (insertion-ordered AND java-serializable, unlike VectorMap). */
  private def orderedMeta(mp: java.util.Map[_, _]): Map[String, String] =
    scala.collection.immutable.ListMap.from(
      mp.asScala.iterator.map { case (k, v) =>
        String.valueOf(k) -> encodeMetaValue(v) })

  /** Split a multi-doc YAML text on explicit `---` document starts at
    * column 0. Literal-block body lines are always indented, so a bare
    * col-0 `---` only occurs as a document separator in this format. */
  private[memo] def splitDocs(text: String): Seq[String] =
    text.split("(?m)^---[ \t]*\r?\n").toSeq.filter(_.trim.nonEmpty)

  /** Parse a full DB YAML (id required unique, body required —
    * memo_cli.py:66-109) into a records DataFrame. Small inputs parse on
    * the driver; large inputs are split into docs and parsed distributed
    * with a dup-id check as an aggregation. */
  def importTable(spark: SparkSession, text: String): DataFrame = {
    val docs = splitDocs(text)
    if (docs.length <= BulkParseThreshold) importDriverSide(spark, text)
    else importDistributed(spark, docs)
  }

  private def importDriverSide(spark: SparkSession, text: String): DataFrame = {
    val recs = loadAll(text).flatMap {
      case null => None
      case m: java.util.Map[_, _] => Some(parseRecord(m))
      case bad => throw new IllegalArgumentException(s"Bad record: $bad")
    }
    val dup = recs.groupBy(_._1).collectFirst { case (id, rs) if rs.size > 1 => id }
    dup.foreach(id => throw new IllegalArgumentException(s"Duplicate id $id"))
    val rows = recs.map { case (id, body, meta) => Row(id, body, meta) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), recordSchema)
  }

  private def importDistributed(spark: SparkSession, docs: Seq[String]): DataFrame = {
    val slices = math.min(spark.sparkContext.defaultParallelism,
      math.max(1, docs.length / 256))
    val rdd = spark.sparkContext.parallelize(docs, slices).mapPartitions { it =>
      it.flatMap { doc =>
        loadAll(doc).flatMap {
          case null => None
          case m: java.util.Map[_, _] =>
            val (id, body, meta) = parseRecord(m)
            Some(Row(id, body, meta))
          case bad => throw new IllegalArgumentException(s"Bad record: $bad")
        }
      }
    }
    val df = spark.createDataFrame(rdd, recordSchema)
    df.cache()
    try {
      import org.apache.spark.sql.functions._
      val dup = df.groupBy(col("id")).count()
        .filter(col("count") > 1).limit(1).collect()
      if (dup.nonEmpty) throw new IllegalArgumentException(
        s"Duplicate id ${dup(0).getLong(0)}")
    } catch {
      case e: Exception =>
        df.unpersist()
        throw rootIllegalArgument(e).getOrElse(e)
    }
    df
  }

  private def rootIllegalArgument(e: Throwable): Option[IllegalArgumentException] = {
    var cur = e
    while (cur != null) {
      cur match {
        case iae: IllegalArgumentException => return Some(iae)
        case _ => cur = cur.getCause
      }
    }
    None
  }

  /** Serialize records (id, body, metadata) as explicit-start multi-doc YAML
    * with body as a literal block scalar (memo_cli.py:112-128, 27-35).
    * Scalars are quoted so that re-importing reproduces the identical typed
    * values ("007" stays a string, 1 stays an int); body chomping preserves
    * trailing newlines (`|-` none, `|` one, `|+` several). */
  def exportTable(records: DataFrame): String = {
    val rows = records.select("id", "body", "metadata")
      .orderBy("id").collect()
    val sb = new StringBuilder
    rows.foreach(r => appendRecord(sb,
      r.getLong(0), r.getString(1),
      Option(r.getMap[String, String](2)).map(_.toSeq).getOrElse(Seq.empty)))
    sb.toString
  }

  /** Distributed export (S2 at scale): render each record's YAML document
    * on the executors and return `(id, doc)` — write `doc` with the text
    * sink for sharded output. `repartitionByRange(id)` + in-partition sort
    * makes shard files globally id-ordered (shard N's docs all precede
    * shard N+1's), so concatenating part files reproduces [[exportTable]]
    * byte-for-byte; the driver never materializes the table. */
  def exportRecordsDistributed(records: DataFrame, shards: Int = 0): DataFrame = {
    val spark = records.sparkSession
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = records.select("id", "body", "metadata")
    val arranged =
      (if (shards > 0) base.repartitionByRange(shards, col("id"))
       else base.repartitionByRange(col("id")))
        .sortWithinPartitions("id")
    arranged.map { r =>
      val sb = new StringBuilder
      appendRecord(sb, r.getLong(0), r.getString(1),
        Option(r.getMap[String, String](2)).map(_.toSeq).getOrElse(Seq.empty))
      (r.getLong(0), sb.toString)
    }.toDF("id", "doc")
  }

  /** One record as an explicit-start YAML document (shared by the driver
    * and distributed exporters — byte-identical output). */
  private def appendRecord(sb: StringBuilder, id: Long, body: String,
      meta: Seq[(String, String)]): Unit = {
    sb.append("---\n")
    sb.append(s"id: $id\n")
    if (meta.isEmpty) sb.append("metadata: {}\n")
    else {
      sb.append("metadata:\n")
      meta.foreach { case (k, v) =>
        sb.append("  ").append(MetaCodec.yamlScalar(k, flow = false))
          .append(": ").append(MetaCodec.exportValue(v)).append("\n")
      }
    }
    appendBody(sb, body)
  }

  private def appendBody(sb: StringBuilder, body: String): Unit = {
    if (body.trim.isEmpty) {
      // empty / whitespace-only bodies can't be block scalars reliably
      sb.append("body: ").append(
        if (body.isEmpty) "''" else MetaCodec.jsonQuote(body)).append("\n")
      return
    }
    var t = 0
    while (t < body.length && body.charAt(body.length - 1 - t) == '\n') t += 1
    val content = body.substring(0, body.length - t)
    val lines = content.split("\n", -1)
    val indentInd = if (lines.head.startsWith(" ")) "2" else ""
    val chomp = if (t == 0) "-" else if (t == 1) "" else "+"
    sb.append(s"body: |$indentInd$chomp\n")
    lines.foreach(ln => sb.append(if (ln.isEmpty) "\n" else s"  $ln\n"))
    var extra = t - 1
    while (extra > 0) { sb.append("\n"); extra -= 1 }
  }
}
