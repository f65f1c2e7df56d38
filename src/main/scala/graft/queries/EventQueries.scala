package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.round2

/** Event-stream analytics in batch form (the streaming equivalents — same
  * transforms behind readStream + watermark — are exercised in the
  * StreamingSpec): tumbling windows, sessionization, JSON props.
  */
object EventQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour window counts per event type. */
  private val q60Tumbling: Q = (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round2(sum(col("value"))).as("total"))
      .orderBy(col("hour"), col("event_type"))

  /** Sessionization (30-min inactivity gap) via gaps-and-islands — the
    * batch twin of session_window/flatMapGroupsWithState. */
  private val q61Sessionize: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > expr("INTERVAL 1800 SECONDS"), 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** JSON props extraction + aggregation. */
  private val q62JsonProps: Q = (s, dir) =>
    Tables(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  /** Sliding-window style: per user running total of purchase values over
    * the previous 5 events (window frame). */
  private val q63Running: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, 0)
    Tables(s, dir, "events")
      .withColumn("run_sum", round2(sum(col("value")).over(w)))
      .select(col("event_id"), col("user_id"), col("run_sum"))
      .orderBy(col("event_id"))
  }

  /** Sliding windows (1h window / 30min slide) — the SAME
    * [[graft.streaming.EventStreams.slidingCounts]] plan run in batch mode
    * (withWatermark is a no-op on batch); each event lands in exactly two
    * windows, which the oracle expands explicitly. */
  private val q65Sliding: Q = (s, dir) =>
    graft.streaming.EventStreams.slidingCounts(Tables(s, dir, "events"))
      .orderBy(col("win_start"), col("event_type"))

  /** Interval join (errors → purchases within 30min by the same user) —
    * the stream-stream join plan ([[graft.streaming.EventStreams
    * .errorThenPurchase]]) run in batch mode, oracled in SQL. */
  private val q66ErrorPurchase: Q = (s, dir) =>
    graft.streaming.EventStreams.errorThenPurchase(Tables(s, dir, "events"))
      .orderBy(col("error_id"), col("purchase_id"))

  /** Gap-fill / time-spine resample: per-user DAILY rollup joined onto a
    * generated contiguous day spine (`sequence` + explode — rows are
    * generated on executors, never the driver), missing days filled with
    * zero counts and a carry-forward of the last seen daily value
    * (`last(…, ignoreNulls)` window). The regularization step every
    * time-series feature pipeline runs before ML consumption; the spine
    * side scales as days × keys, independent of event volume. */
  private val q91GapFill: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events").filter(col("user_id") < 5)
    val daily = ev
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), round2(sum(col("value"))).as("daily_value"))
    // the spine's two inputs — day bounds and the key set — in ONE
    // aggregation over one events scan (r6 shape re-scanned events for
    // span and again for the distinct keys: three scans in the plan).
    // collect_set is bounded here by the user slice (≤ 5 keys), the
    // packBins numGroups-bounded-driver-state contract; an unbounded key
    // domain would keep the keys distributed (the r6 crossJoin shape)
    val f = ev.agg(date_trunc("day", min(col("ts"))).as("lo"),
      date_trunc("day", max(col("ts"))).as("hi"),
      collect_set(col("user_id")).as("users")).head()
    val users: Seq[Long] =
      if (f.isNullAt(2)) Seq.empty else f.getSeq[Long](2).sorted
    val spine =
      if (f.isNullAt(0) || users.isEmpty)
        Seq.empty[(Long, java.sql.Timestamp)].toDF("user_id", "day")
      else users.toDF("user_id")
        // generated on EXECUTORS (sequence + explode of literal bounds):
        // spine cost = days × keys, independent of event volume
        .crossJoin(s.range(1).select(explode(sequence(
          lit(f.getTimestamp(0)), lit(f.getTimestamp(1)),
          expr("interval 1 day"))).as("day")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("carried",
        last(col("daily_value"), ignoreNulls = true).over(w))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("carried"))
      .orderBy(col("user_id"), col("day"))
  }

  val defs: Map[String, Q] = Map(
    "q91_gapfill" -> q91GapFill,
    "q60_tumbling" -> q60Tumbling,
    "q61_sessionize" -> q61Sessionize,
    "q62_json_props" -> q62JsonProps,
    "q63_running" -> q63Running,
    "q65_sliding" -> q65Sliding,
    "q66_error_purchase" -> q66ErrorPurchase,
  )

  val oracles: Map[String, String] = Map(
    "q91_gapfill" ->
      """WITH ev AS (SELECT user_id, date_trunc('day', ts) AS day, value
        |            FROM events WHERE user_id < 5),
        |daily AS (SELECT user_id, day, count(*) AS n,
        |            floor(sum(value) * 100.0 + 0.5) / 100.0 AS daily_value
        |          FROM ev GROUP BY 1, 2),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
        |days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        |         FROM span),
        |spine AS (SELECT u.user_id, d.day FROM days d
        |          CROSS JOIN (SELECT DISTINCT user_id FROM ev) u)
        |SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
        |  coalesce(d.n, 0) AS n,
        |  last_value(d.daily_value IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.day) AS carried
        |FROM spine s LEFT JOIN daily d USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,
    "q60_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, count(*) AS n, floor((sum(value))*100.0 + 0.5)/100.0 AS total
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q61_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q62_json_props" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
        |   AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q63_running" ->
      """SELECT event_id, user_id,
        | floor((sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))*100.0 + 0.5)/100.0 AS run_sum
        |FROM events ORDER BY event_id""".stripMargin,
    // each event belongs to the two 1h windows whose 30min-aligned starts
    // are floor30(ts) and floor30(ts) - 30min — expanded via a 2-row cross.
    // make_timestamp keeps the value a NAIVE timestamp: to_timestamp would
    // return TIMESTAMPTZ and strftime would then render it in the HOST
    // session timezone, silently diverging from Spark's UTC on non-UTC hosts
    "q65_sliding" ->
      """WITH w AS (
        |  SELECT event_type,
        |    make_timestamp(CAST((floor(epoch(ts)/1800)*1800 - k*1800)
        |      * 1000000 AS BIGINT)) AS ws
        |  FROM events CROSS JOIN (VALUES (0),(1)) t(k))
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        | count(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q66_error_purchase" ->
      """SELECT e.event_id AS error_id, p.event_id AS purchase_id,
        | e.user_id, p.value
        |FROM events e JOIN events p
        |  ON e.user_id = p.user_id
        | AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 30 MINUTE
        |WHERE e.event_type = 'error' AND p.event_type = 'purchase'
        |ORDER BY error_id, purchase_id""".stripMargin,
  )
}
