package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming event analytics. Each transform takes the events
  * schema (event_id, ts TIMESTAMP, user_id, event_type, value, props) and is
  * batch/stream agnostic — the same logical plan runs under `readStream`
  * with watermarks (incremental state, late-data eviction) or as a batch
  * DataFrame (the EventQueries twins, used for the DuckDB oracle).
  *
  * At scale: all aggregations shuffle once on their grouping key; state
  * store size is bounded by the watermark horizon.
  */
object EventStreams {

  /** File-source stream over the driver's events parquet: explicit schema
    * (file streams can't infer), probed ONCE from the static footer so the
    * stream and batch sides agree whatever ts layout the generator used
    * (plain timestamp µs today, legacy TIMESTAMP(NANOS)-as-long before) —
    * the production shape for directory-watching ingestion at scale. */
  def eventFileStream(spark: SparkSession, dir: String): DataFrame = {
    // Tables handles the legacy-nanos opt-in if the footer needs it; the
    // second footer read then sees the file schema the stream must declare.
    graft.Tables(spark, dir, "events")
    val fileSchema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    val raw = spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    fileSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // watermarks demand TIMESTAMP (LTZ); reinterpret the naive value
        // in the session zone (UTC in every harness), which keeps the
        // stream's wall-clock strings identical to the batch side's NTZ
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Tumbling 1-hour window counts/sums per event type, 2h watermark. */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))

  /** Sliding window counts per event type (each event lands in
    * window/slide overlapping windows); same plan runs batch or streamed
    * with the watermark bounding state. */
  def slidingCounts(events: DataFrame, win: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"))

  /** Session windows with a 30-minute inactivity gap per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("n_events"))

  /** Stream-stream interval join: for each error event, the purchases by
    * the same user within `within` AFTER the error. Watermarks bound both
    * join states; the time-range condition lets Spark evict rows once the
    * interval passes — the canonical watermarked stream-stream join shape. */
  def errorThenPurchase(events: DataFrame, within: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("e_user"), col("ts").as("error_ts"),
        col("event_id").as("error_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    errors.join(purchases,
      col("e_user") === col("p_user") &&
        col("purchase_ts") >= col("error_ts") &&
        col("purchase_ts") <= col("error_ts") + expr(s"INTERVAL $within"))
      .select(col("error_id"), col("purchase_id"), col("e_user").as("user_id"),
        col("value"))
  }

  /** Streaming exact dedup: drop repeated event_ids arriving within the
    * watermark horizon — state is bounded by the watermark, so this runs
    * indefinitely at any rate (the streaming twin of exact-dedup). */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Explicit-state sessionization via flatMapGroupsWithState with an
    * event-time timeout: sessions close either when a same-user event
    * arrives past the gap (emitted inline) or when the WATERMARK passes
    * last-event + gap (emitted by the timeout callback) — the
    * custom-state twin of [[sessionCounts]], for session semantics
    * `session_window` can't express (e.g. emitting each closed session
    * exactly once in append mode). State per user is one (start, last, n)
    * triple, evicted on close: bounded by active users, not history. */
  case class SessState(start: Long, last: Long, n: Long)
  case class ClosedSession(userId: Long, sessStart: java.sql.Timestamp,
      nEvents: Long)

  def sessionizeWithState(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "2 hours"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events.withWatermark("ts", watermark)
      .select(col("user_id").as("uid"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, new java.sql.Timestamp(s.start), s.n))
          } else {
            val times = rows.map(_._2.getTime).toSeq.sorted
            val out = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                // merge iff the event's [t, t+gap) window overlaps the
                // session's [start, last+gap) window — an out-of-order
                // (late but within-watermark) event can EXTEND THE START
                // backwards, matching session_window's merge semantics
                case Some(s) if t <= s.last + gapMs && t >= s.start - gapMs =>
                  cur = Some(SessState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  out += ClosedSession(uid, new java.sql.Timestamp(s.start), s.n)
                  cur = Some(SessState(t, t, 1))
                case None => cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.result().iterator
          }
      }
  }

  /** Per-user running event count + total value via mapGroupsWithState —
    * the custom-state path (KeyValueGroupedDataset) for semantics window
    * aggs can't express. */
  case class UserStat(userId: Long, nEvents: Long, total: Double)

  def runningUserStats(events: DataFrame): Dataset[UserStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var n = prev.nEvents
          var tot = prev.total
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserStat(uid, n, math.round(tot * 100.0) / 100.0)
          state.update(next)
          next
      }
  }
}
