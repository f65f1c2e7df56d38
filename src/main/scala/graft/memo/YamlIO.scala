package graft.memo

import scala.jdk.CollectionConverters._

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
import org.apache.spark.rdd.{NewHadoopRDD, RDD}
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
    // [[Yaml11Schema]]: PyYAML-compatible scalar typing (reference parity)
    new org.snakeyaml.engine.v2.api.Load(Yaml11Schema.loadSettings)
      .loadAllFromString(text).asScala.toSeq
  }

  /** Coerce a parsed YAML metadata value to the stored typed encoding. */
  def encodeMetaValue(v: Any): String = MetaCodec.encode(v)

  /** Parse a save-input YAML batch (multi-doc; null docs skipped; body
    * required non-blank; optional non-negative id for overwrite —
    * memo_cli.py:369-400). Returns (id option, body, metadata). */
  def parseSaveBatch(text: String): Seq[(Option[Long], String, Map[String, String])] =
    {
      val entries = loadAll(text).flatMap(parseSaveEntry)
      if (entries.isEmpty)
        throw new IllegalArgumentException("input YAML contains no entries")
      entries
    }

  /** Validate one parsed save-input document (memo_cli.py:369-400). Shared
    * by the driver-side [[parseSaveBatch]] and the distributed
    * [[parseSavePath]] so both paths throw the identical error contract. */
  private def parseSaveEntry(doc: Any): Option[(Option[Long], String, Map[String, String])] =
    doc match {
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
    importDocsRdd(spark, spark.sparkContext.parallelize(docs, slices))
  }

  /** Distributed full-DB import from a file PATH (reference S1 as a file
    * scan, memo_cli.py:66-109, at scale): the YAML never exists as one
    * driver-held String. The file is split on `---` document separators by
    * a Hadoop record-delimiter scan ([[docRdd]]) — splittable, so a 100 TB
    * multi-doc file fans out across executors — and each doc parses inside
    * `mapPartitions`. Accepts a single file or a directory of shards (as
    * written by [[exportPath]]); the duplicate-id check runs as an
    * aggregation. `maxSplitBytes` forces smaller input splits (testing). */
  def importPath(spark: SparkSession, path: String,
      maxSplitBytes: Long = 0L): DataFrame =
    importDocsRdd(spark, docRdd(spark, path, maxSplitBytes).map(_._3))

  /** Split YAML file(s) into per-document text fragments, distributed.
    *
    * Uses `textinputformat.record.delimiter` = `"\n---\n"`: the 5-byte
    * sequence only occurs where a line is exactly `---` at column 0, which
    * in this format is always a document separator (metadata lines are
    * 2-space indented, non-empty body lines too, and embedded newlines in
    * scalars are JSON-quoted). Two repairs per record: (a) the scan eats
    * the doc's trailing `\n` as part of the delimiter — restored for every
    * record except the file-final one (`offset + byteLen == fileLen`),
    * which matters for `|+` bodies whose trailing blank lines are content;
    * (b) each file's first record carries the leading `---` line — stripped.
    */
  private[memo] def docRdd(spark: SparkSession, path: String,
      maxSplitBytes: Long = 0L): RDD[(String, Long, String)] = {
    val sc = spark.sparkContext
    val conf = new org.apache.hadoop.conf.Configuration(sc.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\n---\n")
    if (maxSplitBytes > 0)
      conf.setLong("mapreduce.input.fileinputformat.split.maxsize", maxSplitBytes)
    // file lengths resolved once on the driver (O(#files) namenode calls)
    // so executors can tell the file-final record apart without FS access
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(conf)
    val statuses =
      if (fs.getFileStatus(hPath).isDirectory)
        fs.listStatus(hPath).toSeq.filter { s =>
          val n = s.getPath.getName; s.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
      else Seq(fs.getFileStatus(hPath))
    val fileLens = sc.broadcast(
      statuses.map(s => s.getPath.toString -> s.getLen).toMap)
    sc.newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .asInstanceOf[NewHadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit { (split, it) =>
        val file = split.asInstanceOf[FileSplit].getPath.toString
        val fileLen = fileLens.value(file)
        it.flatMap { case (off, text) =>
          val offset = off.get()
          val isFileLast = offset + text.getLength >= fileLen
          val raw = text.toString // copy now: Hadoop reuses the Text buffer
          val headless =
            if (offset == 0L && (raw.startsWith("---\n") || raw == "---"))
              raw.stripPrefix("---").stripPrefix("\n")
            else raw
          val doc = if (isFileLast) headless else headless + "\n"
          if (doc.trim.isEmpty) None else Some((file, offset, doc))
        }
      }
  }

  private def importDocsRdd(spark: SparkSession, docs: RDD[String]): DataFrame =
    importRows(spark, docs.mapPartitions { it =>
      it.flatMap { doc =>
        loadAll(doc).flatMap {
          case null => None
          case m: java.util.Map[_, _] =>
            val (id, body, meta) = parseRecord(m)
            Some(Row(id, body, meta))
          case bad => throw new IllegalArgumentException(s"Bad record: $bad")
        }
      }
    })

  /** Finish a distributed record import: materialize (cache), run the
    * duplicate-id check as an aggregation, surface parse errors with the
    * reference message. Shared by the YAML and JSONL importers; the caller
    * owns the returned DataFrame's cache (unpersist when done). */
  private[memo] def importRows(spark: SparkSession, rdd: RDD[Row]): DataFrame = {
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

  /** Schema of [[parseSavePath]]: input-order key (file, off, seq) + the
    * parsed entry; `id` is null for append entries (no id in the doc). */
  val saveEntrySchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("off", LongType, nullable = false),
    StructField("seq", IntegerType, nullable = false),
    StructField("id", LongType, nullable = true),
    StructField("body", StringType, nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))

  /** Distributed save-input parse (S3 at scale): split + validate the batch
    * file on executors with the same error contract as [[parseSaveBatch]].
    * `(file, off, seq)` orders entries exactly as they appear in the input
    * — `seq` disambiguates multiple docs inside ONE scanned fragment (a
    * CRLF or `--- `-separated file the byte-delimiter scan can't split;
    * `loadAll` still parses every doc) — so id assignment and echo order
    * match the reference's sequential loop (memo_cli.py:404-440) without a
    * driver-held batch String. */
  def parseSavePath(spark: SparkSession, path: String,
      maxSplitBytes: Long = 0L): DataFrame = {
    val rdd = docRdd(spark, path, maxSplitBytes).mapPartitions { it =>
      it.flatMap { case (file, off, doc) =>
        loadAll(doc).flatMap(parseSaveEntry).zipWithIndex.map {
          case ((id, body, meta), j) =>
            Row(file, off, j, id.map(Long.box).orNull, body, meta)
        }
      }
    }
    spark.createDataFrame(rdd, saveEntrySchema)
  }

  /** Unwrap the root IllegalArgumentException from a Spark job failure so
    * distributed parse errors surface with the reference's message. */
  private[memo] def asUserError(e: Throwable): Throwable =
    rootIllegalArgument(e).getOrElse(e)

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
  def exportTable(records: DataFrame,
      maxRows: Long = DriverExportMaxRows): String = {
    guardDriverExport(records, "YamlIO.exportTable", "exportPath", maxRows)
    val rows = records.select("id", "body", "metadata")
      .orderBy("id").collect()
    val sb = new StringBuilder
    rows.foreach(r => appendRecord(sb,
      r.getLong(0), r.getString(1),
      Option(r.getMap[String, String](2)).map(_.toSeq).getOrElse(Seq.empty)))
    sb.toString
  }

  /** Ceiling for the driver-materializing export twins. The String forms
    * exist for CLI-batch-sized stores (the reference's whole database is a
    * file a human edits); an unbounded corpus must go through the sharded
    * path forms, the way `save` switches to the bulk path at 8 MB. 50k
    * records ≈ tens of MB of YAML — comfortably a driver String, far below
    * any corpus that needs the distributed path. */
  val DriverExportMaxRows = 50000L

  /** Refuse to render an over-large table on the driver, pointing the
    * caller at the distributed path form. Bounded probe: scans at most
    * maxRows+1 rows, never the full table. */
  private[memo] def guardDriverExport(records: DataFrame, form: String,
      pathForm: String, maxRows: Long = DriverExportMaxRows): Unit = {
    val n = records.limit(maxRows.min(Int.MaxValue - 1L).toInt + 1).count()
    if (n > maxRows) throw new IllegalArgumentException(
      s"$form renders the whole table as one driver String and refuses " +
        s"more than $maxRows rows (this table has >= $n); use $pathForm " +
        "for sharded distributed export")
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

  /** Distributed export to a directory of shard files (S2 at scale): each
    * range-partition renders and writes its own part file; concatenating
    * the part files in name order reproduces [[exportTable]] byte-for-byte
    * ([[importPath]] reads the directory back directly). The driver never
    * holds the corpus. The text sink appends one `\n` per row, so the
    * rendered doc's own trailing `\n` is stripped before writing. */
  def exportPath(records: DataFrame, path: String, shards: Int = 0): Unit = {
    import org.apache.spark.sql.functions.{col, expr}
    exportRecordsDistributed(records, shards)
      .select(expr("substring(doc, 1, length(doc) - 1)").as("value"))
      .write.mode("overwrite").text(path)
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
