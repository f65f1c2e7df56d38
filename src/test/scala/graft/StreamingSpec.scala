package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** Top-level so Spark can derive an Encoder (inner classes can't). */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Streaming ≡ batch parity: the same EventStreams transform fed through a
  * MemoryStream must produce the rows the batch plan produces. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def mkEv(id: Long, minute: Int, user: Long, typ: String,
      v: Double): Ev =
    Ev(id, Timestamp.valueOf(f"2026-01-01 00:$minute%02d:00"), user, typ, v, "{}")

  private val sample = Seq(
    mkEv(0, 1, 1, "view", 1.0), mkEv(1, 5, 1, "view", 2.0),
    mkEv(2, 9, 2, "purchase", 10.0), mkEv(3, 30, 1, "view", 3.0),
    mkEv(4, 59, 2, "error", 0.0))

  test("tumbling window agg over a MemoryStream matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Complete()).start()
    input.addData(sample: _*)
    q.processAllAvailable()
    val streamed = spark.table("tumbling_out")
      .orderBy("hour", "event_type").collect().toSeq
    q.stop()
    val batch = EventStreams.tumblingCounts(sample.toDF())
      .orderBy("hour", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("session windows close on the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Complete()).start()
    input.addData(sample: _*)
    q.processAllAvailable()
    val rows = spark.table("sessions_out")
      .select("user_id", "n_events").as[(Long, Long)]
      .collect().toSeq.sorted
    q.stop()
    // user 1: events at :01,:05 then :30 (gap 25min < 30 → same session) = 1 session of 3
    // user 2: :09 and :59 → gap 50min → two sessions (1 event each)
    assert(rows == Seq((1L, 3L), (2L, 1L), (2L, 1L)))
  }

  test("stream-stream interval join pairs errors with later purchases") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.errorThenPurchase(input.toDF())
      .writeStream.format("memory").queryName("joined_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      mkEv(0, 5, 1, "error", 0.0),
      mkEv(1, 15, 1, "purchase", 9.5),   // within 30min of error 0 → match
      mkEv(2, 50, 1, "purchase", 4.0),   // 45min later → outside interval
      mkEv(3, 10, 2, "purchase", 7.0))   // different user, no error
    q.processAllAvailable()
    val rows = spark.table("joined_out")
      .select("error_id", "purchase_id").as[(Long, Long)].collect().toSeq
    q.stop()
    assert(rows == Seq((0L, 1L)))
  }

  test("streaming dedup drops repeated event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.dedupedEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(sample: _*)
    input.addData(sample.take(2): _*) // duplicates of ids 0 and 1
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("event_id").as[Long]
      .collect().toSeq.sorted
    q.stop()
    assert(ids == Seq(0L, 1L, 2L, 3L, 4L)) // each id exactly once
  }

  test("file-source stream over events parquet matches the batch aggregate") {
    val streamed = EventStreams.tumblingCounts(
        EventStreams.eventFileStream(spark, sfDir))
      .writeStream.format("memory").queryName("file_stream_out")
      .outputMode(OutputMode.Complete()).start()
    streamed.processAllAvailable()
    val got = spark.table("file_stream_out")
      .orderBy("hour", "event_type").collect().toSeq
    streamed.stop()
    val batch = EventStreams.tumblingCounts(Tables(spark, sfDir, "events"))
      .orderBy("hour", "event_type").collect().toSeq
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("sliding window agg over a MemoryStream matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.slidingCounts(input.toDF(),
        win = "10 minutes", slide = "5 minutes")
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode(OutputMode.Complete()).start()
    input.addData(sample: _*)
    q.processAllAvailable()
    val streamed = spark.table("sliding_out")
      .orderBy("win_start", "event_type").collect().toSeq
    q.stop()
    val batch = EventStreams.slidingCounts(sample.toDF(),
        win = "10 minutes", slide = "5 minutes")
      .orderBy("win_start", "event_type").collect().toSeq
    assert(streamed == batch)
    // event at :01 must appear in the 23:55 and 00:00 windows → 2 rows min
    assert(streamed.size >= 2)
  }

  test("flatMapGroupsWithState emits each closed session exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionizeWithState(input.toDF(), gapMinutes = 30,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("state_sessions_out")
      .outputMode(OutputMode.Append()).start()
    // user 1: events at :01 and :05 (one session), then a gap
    input.addData(mkEv(0, 1, 1, "view", 1.0), mkEv(1, 5, 1, "view", 2.0))
    q.processAllAvailable()
    // same user far past the gap → closes the first session inline
    input.addData(Ev(2, java.sql.Timestamp.valueOf("2026-01-01 03:00:00"),
      1, "view", 1.0, "{}"))
    q.processAllAvailable()
    // another user much later advances the watermark past 03:00 + gap →
    // user 1's second session times out and is emitted by the callback
    input.addData(Ev(3, java.sql.Timestamp.valueOf("2026-01-01 09:00:00"),
      2, "view", 1.0, "{}"))
    q.processAllAvailable()
    input.addData(Ev(4, java.sql.Timestamp.valueOf("2026-01-01 12:00:00"),
      2, "view", 1.0, "{}"))
    q.processAllAvailable()
    val rows = spark.table("state_sessions_out")
      .select("userId", "sessStart", "nEvents")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSeq.sortBy(_._2.getTime)
    q.stop()
    assert(rows.map(r => (r._1, r._2.toString, r._3)) == Seq(
      (1L, "2026-01-01 00:01:00.0", 2L),  // closed inline by the 03:00 event
      (1L, "2026-01-01 03:00:00.0", 1L),  // closed by event-time timeout
      (2L, "2026-01-01 09:00:00.0", 1L))) // timed out once watermark hit 10:00
  }

  test("sessionizeWithState merges a late within-watermark event backwards") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionizeWithState(input.toDF(), gapMinutes = 30,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("late_sessions_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(Ev(0, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"),
      1, "view", 1.0, "{}"))
    q.processAllAvailable()
    // 09:50 is late but inside the 2h watermark: it must EXTEND the
    // session's start backwards, like session_window would merge it
    input.addData(Ev(1, java.sql.Timestamp.valueOf("2026-01-01 09:50:00"),
      1, "view", 1.0, "{}"))
    q.processAllAvailable()
    // same-user event past the gap closes the session inline
    input.addData(Ev(2, java.sql.Timestamp.valueOf("2026-01-01 15:00:00"),
      1, "view", 1.0, "{}"))
    q.processAllAvailable()
    val rows = spark.table("late_sessions_out")
      .select("userId", "sessStart", "nEvents")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSeq
    q.stop()
    assert(rows.map(r => (r._1, r._2.toString, r._3)) ==
      Seq((1L, "2026-01-01 09:50:00.0", 2L)))
  }

  test("streaming throughput smoke completes and reports a positive rate") {
    // The BENCH streaming entries (s90-s94) run through this same harness.
    // The unit suite asserts only that both paths complete and yield finite
    // positive rates — a wall-clock floor here is flaky on a loaded shared
    // VM (local[4], contention-prone). Set SPARK_GRAFT_SLOW_TESTS=1 to also
    // enforce the conservative floor that catches a state-store catastrophe
    // (e.g. an accidental per-batch full-state rescan turning throughput
    // quadratic); the bench box enforces it implicitly via the s90/s91
    // round-over-round numbers.
    val n = 5000
    val tumbling = graft.streaming.StreamBench.tumblingEps(spark, n,
      nBatches = 4)
    assert(tumbling > 0 && java.lang.Double.isFinite(tumbling),
      s"tumbling throughput $tumbling events/s")
    val sess = graft.streaming.StreamBench.sessionizeEps(spark, n,
      nBatches = 4)
    assert(sess > 0 && java.lang.Double.isFinite(sess),
      s"sessionize throughput $sess events/s")
    val dedup = graft.streaming.StreamBench.dedupEps(spark, n, nBatches = 4)
    assert(dedup > 0 && java.lang.Double.isFinite(dedup),
      s"dedup throughput $dedup events/s")
    val join = graft.streaming.StreamBench.joinEps(spark, n, nBatches = 4)
    assert(join > 0 && java.lang.Double.isFinite(join),
      s"stream-stream join throughput $join events/s")
    val ingest = graft.streaming.StreamBench.ingestEps(spark, n, nBatches = 4)
    assert(ingest > 0 && java.lang.Double.isFinite(ingest),
      s"store-ingest throughput $ingest events/s")
    // the s93 workload must actually produce matches — with a user count
    // divisible by the type count every user emits one type and the join
    // measures nothing but misses (run the transform in batch to check)
    val matched = EventStreams.errorThenPurchase(
      spark.createDataFrame(graft.streaming.StreamBench.syntheticEvents(n)))
      .count()
    assert(matched > 0, "s93's synthetic stream yields zero join matches")
    if (sys.env.get("SPARK_GRAFT_SLOW_TESTS").exists(_.nonEmpty)) {
      assert(tumbling >= 500.0, s"tumbling floor: $tumbling events/s")
      assert(sess >= 500.0, s"sessionize floor: $sess events/s")
      assert(dedup >= 500.0, s"dedup floor: $dedup events/s")
      assert(join >= 500.0, s"stream-stream join floor: $join events/s")
      // the commit-path catastrophe s94 exists to catch: an O(corpus)
      // rewrite per micro-batch would land far below this floor
      assert(ingest >= 100.0, s"store-ingest floor: $ingest events/s")
    }
  }

  test("mapGroupsWithState accumulates per-user running stats") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.runningUserStats(input.toDF())
      .writeStream.format("memory").queryName("stats_out")
      .outputMode(OutputMode.Update()).start()
    input.addData(sample.take(3): _*)
    q.processAllAvailable()
    input.addData(sample.drop(3): _*)
    q.processAllAvailable()
    val last = spark.table("stats_out")
      .groupBy("userId").agg(max("nEvents").as("n"), max("total").as("t"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    q.stop()
    assert(last == Seq((1L, 3L, 6.0), (2L, 2L, 10.0)))
  }
}
