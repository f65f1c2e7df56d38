package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** End-to-end streaming smoke: MemoryStream → tumbling-window agg →
  * memory sink; prints the materialized windows. */
object StreamSmoke {
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosFlag, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("smoke_windows")
      .outputMode(OutputMode.Complete()).start()
    input.addData(
      Ev(0, Timestamp.valueOf("2026-01-01 00:05:00"), 1, "view", 1.0, "{}"),
      Ev(1, Timestamp.valueOf("2026-01-01 00:40:00"), 1, "view", 2.5, "{}"),
      Ev(2, Timestamp.valueOf("2026-01-01 01:10:00"), 2, "purchase", 9.0, "{}"))
    q.processAllAvailable()
    val rows = spark.table("smoke_windows").orderBy("hour", "event_type").collect()
    rows.foreach(r => println(s"window: $r"))
    require(rows.length == 2, s"expected 2 windows, got ${rows.length}")
    q.stop()

    // streaming dedup leg: send the same 3 events twice, expect 3 out
    val input2 = MemoryStream[Ev]
    val q2 = EventStreams.dedupedEvents(input2.toDF())
      .writeStream.format("memory").queryName("smoke_dedup")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    input2.addData(
      Ev(0, Timestamp.valueOf("2026-01-01 00:05:00"), 1, "view", 1.0, "{}"),
      Ev(1, Timestamp.valueOf("2026-01-01 00:06:00"), 1, "view", 2.0, "{}"),
      Ev(2, Timestamp.valueOf("2026-01-01 00:07:00"), 2, "view", 3.0, "{}"))
    input2.addData(
      Ev(0, Timestamp.valueOf("2026-01-01 00:05:00"), 1, "view", 1.0, "{}"),
      Ev(1, Timestamp.valueOf("2026-01-01 00:06:00"), 1, "view", 2.0, "{}"))
    q2.processAllAvailable()
    val n = spark.table("smoke_dedup").count()
    println(s"dedup: 5 events in (2 dupes) -> $n unique out")
    require(n == 3, s"expected 3 deduped events, got $n")
    q2.stop()

    // file-source leg: stream the driver's events parquet end-to-end
    val q3 = EventStreams.tumblingCounts(
        EventStreams.eventFileStream(spark, "/root/testdata/sf0.001"))
      .writeStream.format("memory").queryName("smoke_file")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    q3.processAllAvailable()
    val fileRows = spark.table("smoke_file").count()
    println(s"file stream: $fileRows windows from events.parquet")
    require(fileRows > 0, "file stream produced no windows")
    q3.stop()

    // stream-stream interval join leg over the real events file stream
    val q4 = EventStreams.errorThenPurchase(
        EventStreams.eventFileStream(spark, "/root/testdata/sf0.001"))
      .writeStream.format("memory").queryName("smoke_join")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    q4.processAllAvailable()
    val joins = spark.table("smoke_join").count()
    println(s"stream-stream join: $joins error->purchase pairs")
    require(joins > 0, "interval join produced no pairs")
    q4.stop()
    spark.stop()
  }
}
