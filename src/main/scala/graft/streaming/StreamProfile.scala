package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** One-off profiler for the streaming throughput entries: where does a
  * micro-batch's time go, and how does it move with the state-partition
  * count?
  *
  * Motivation: s93 (watermarked stream-stream interval join) has measured
  * 3–5× below its single-state-store siblings every round. The join keeps
  * FOUR state stores per shuffle partition (each side: key→numValues and
  * keyWithIndex→value), so at `spark.sql.shuffle.partitions`=32 every
  * micro-batch pays 128 store commits + checkpoint files for ~12k events
  * — plausibly commit overhead, not row work. The number of state
  * partitions is FIXED at query start from `spark.sql.shuffle.partitions`,
  * so the lever is setting that conf before `.start()` (the production
  * guidance for state-heavy streams on small-to-medium volumes).
  *
  * Prints, per (entry × partition count): events/sec plus the per-batch
  * mean of addBatch/commit durations and state-operator totals from
  * `recentProgress` — the breakdown that says "commit overhead" vs "row
  * work" mechanically.
  *
  * Usage: `runMain graft.streaming.StreamProfile [nEvents] [parts,parts,…]`
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val lexMode = args.headOption.contains("lex")
    val cdcMode = args.headOption.contains("cdc")
    val pairsMode = args.headOption.contains("pairs")
    val maintMode = args.headOption.contains("maint")
    val rest = if (lexMode || cdcMode || pairsMode || maintMode) args.drop(1)
      else args
    val n = rest.headOption.map(_.toInt)
      .getOrElse(
        if (lexMode || cdcMode || pairsMode) 20000
        else if (maintMode) 4000 else 100000)
    val partList = rest.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(32, 16, 8, 4))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (pairsMode) {
      // the s94 sidecar-cost PAIRS measurement: the same ingest with and
      // without the per-commit `_metastats` aggregation (and, for
      // completeness, with materializeFeeds=false — append-only commits
      // never write a feed, so that leg SHOULD read flat). Legs
      // interleave A/B/C per round so load drift hits all three alike;
      // report per-leg eps and the median.
      val reps = 3
      val legs = Seq[(String, () => Double)](
        ("base        ", () => StreamBench.ingestEps(spark, n)),
        ("noMetaStats ", () => StreamBench.ingestEps(spark, n,
          metaStats = false)),
        ("noFeeds     ", () => StreamBench.ingestEps(spark, n,
          feeds = false)))
      val acc = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      for (r <- 0 until reps; (tag, f) <- legs) {
        val eps = f()
        acc(tag) = acc(tag) :+ eps
        println(f"[pairs] s94_ingest rep=$r $tag eps=$eps%9.0f")
      }
      for ((tag, _) <- legs) {
        val v = acc(tag).sorted
        println(f"[pairs] s94_ingest MEDIAN $tag eps=${v(v.size / 2)}%9.0f")
      }
    } else if (maintMode) {
      maintainEveryProfile(spark, n)
    } else if (cdcMode) {
      cdcProfile(spark, n)
    } else if (lexMode) {
      // s95 sweep: the foreachBatch sink runs ordinary BATCH jobs, so
      // spark.sql.shuffle.partitions applies per job (no query-start
      // latch) — pin it for the whole run and watch eps move. A
      // commit-overhead-dominated entry lifts as partitions drop (the
      // s93 diagnosis shape: per-batch fixed cost, not row work).
      for (parts <- partList) {
        val prior = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        try {
          val eps = StreamBench.lexicalIngestEps(spark, n)
          println(f"[profile] s95_lex_ingest parts=$parts%-3d eps=$eps%9.0f")
        } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
      }
    } else {
      val events = StreamBench.syntheticEvents(n)
      for (parts <- partList) {
        profile(spark, s"s93_join parts=$parts", events, parts)(df =>
          EventStreams.errorThenPurchase(df))
        profile(spark, s"s90_tumbling parts=$parts", events, parts)(df =>
          EventStreams.tumblingCounts(df))
      }
    }
    spark.stop()
  }

  /** The `streamSink(maintainEvery)` amortization measurement (r19): a
    * foreachBatch ingest pipeline with NO in-stream maintenance leaves
    * every engine-maintained artifact stale, so the first post-ingest
    * read pays the whole catch-up at once; `maintainEvery = k` runs the
    * one-call [[graft.memo.MemoEngine.maintain]] every k-th committed
    * micro-batch INSIDE the stream, amortizing the terminal catch-up to
    * ~one cadence window of work. Measures both shapes at the same
    * volume/batch count: ingest wall (for the cadenced runs this
    * INCLUDES the in-stream walks) and the terminal `maintain()` wall
    * (the deferred catch-up a first read would pay). Run via
    * `runMain graft.streaming.StreamProfile maint [nEvents]`. */
  def maintainEveryProfile(spark: SparkSession, n: Int,
      nBatches: Int = 8): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def run(every: Int): (Double, Double) = {
      val base = java.nio.file.Files.createTempDirectory("graft_maint_ev")
      val engine = new graft.memo.MemoEngine(spark,
        base.resolve("db").toString)
      val ckpt = base.resolve("ckpt").toString
      val sink: (DataFrame, Long) => Unit =
        if (every > 0) engine.streamSink(ckpt, every)
        else engine.streamSink(ckpt)
      val input = MemoryStream[BenchEvent]
      val q = input.toDF()
        .select(concat_ws(" ", lit("event"), col("event_id"),
          col("event_type")).as("body"))
        .writeStream.foreachBatch((b: DataFrame, id: Long) => sink(b, id))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      val elapsed =
        try StreamBench.feedSeconds(input, q,
          StreamBench.syntheticEvents(n), nBatches)
        finally q.stop()
      val t0 = System.nanoTime()
      engine.maintain()
      val catchUp = (System.nanoTime() - t0) / 1e9
      StreamBench.deleteTree(base)
      (elapsed, catchUp)
    }
    for ((tag, every) <- Seq(("off", 0), ("k=4", 4), ("k=2", 2))) {
      val (ing, catchUp) = run(every)
      println(f"[maint] n=$n%6d batches=$nBatches maintainEvery=$tag%-4s " +
        f"ingest=$ing%7.2fs terminal_maintain=$catchUp%6.2fs " +
        f"total=${ing + catchUp}%7.2fs")
    }
  }

  /** Where does the s96 replication overhead go? Runs the exact
    * [[StreamBench.replicationEps]] pipeline (leader `streamAppend` →
    * `emitChanges` → follower `applyChanges` off the file-source log)
    * with wall-clock split into leader / emit / follower legs, and the
    * follower leg further split by the engine's `cdcPhaseHook` into
    * collapse (feed read + window + arm stats), probe (id-chain work —
    * ~0 when the id-watermark shortcut proves disjointness), and commit
    * (the append/merge write). The residual (follower − phases) is the
    * file source's own listing/offset bookkeeping. s94's raw-ingest
    * number at the same volume is printed alongside as the overhead
    * denominator. */
  def cdcProfile(spark: SparkSession, n: Int, nBatches: Int = 8): Unit = {
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rawEps = StreamBench.ingestEps(spark, n, nBatches)
    val base = java.nio.file.Files.createTempDirectory("graft_cdc_prof")
    val leader = new graft.memo.MemoEngine(spark,
      base.resolve("leader").toString)
    val follower = new graft.memo.MemoEngine(spark,
      base.resolve("follower").toString)
    val phases = new java.util.concurrent.ConcurrentHashMap[String,
      java.lang.Double]()
    follower.cdcPhaseHook = (ph, s) =>
      phases.merge(ph, s, (a, b) => a + b)
    val log = base.resolve("log").toString
    java.nio.file.Files.createDirectories(base.resolve("log"))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[BenchEvent]
    val lq = input.toDF()
      .select(concat_ws(" ", lit("event"), col("event_id"),
        col("event_type")).as("body"))
      .writeStream.foreachBatch(leader.streamAppend _)
      .option("checkpointLocation", base.resolve("lckpt").toString)
      .outputMode("append")
      .start()
    val fq = follower.changeLogStream(log).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        follower.applyChanges(b, id, lineage = "profile"); ()
      }
      .option("checkpointLocation", base.resolve("fckpt").toString)
      .start()
    val events = StreamBench.syntheticEvents(n)
    val per = math.max(1, n / math.max(1, nBatches))
    var (tLeader, tEmit, tFollower) = (0.0, 0.0, 0.0)
    def clock(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try {
      events.grouped(per).foreach { chunk =>
        tLeader += clock { input.addData(chunk: _*)
          lq.processAllAvailable() }
        tEmit += clock(leader.emitChanges(log))
        tFollower += clock(fq.processAllAvailable())
      }
      val (l, f) = (leader.records.count(), follower.records.count())
      require(l == f && l > 0, s"follower diverged: leader=$l follower=$f")
      val total = tLeader + tEmit + tFollower
      import scala.jdk.CollectionConverters._
      val ph = phases.asScala.toMap.map { case (k, v) => k -> v.toDouble }
      val residual = tFollower - ph.values.sum
      println(f"[profile] s96_cdc n=$n eps=${n / total}%9.0f " +
        f"(raw s94 eps=$rawEps%9.0f overhead=${rawEps * total / n}%4.2fx) " +
        f"leader=$tLeader%6.2fs emit=$tEmit%6.2fs follower=$tFollower%6.2fs")
      println(f"[profile] s96_cdc follower breakdown: " +
        ph.toSeq.sortBy(_._1).map { case (k, v) =>
          f"$k=$v%6.2fs" }.mkString(" ") +
        f" source-overhead=$residual%6.2fs")
    } finally {
      lq.stop(); fq.stop()
      follower.cdcPhaseHook = null
      deleteTree(base)
    }
  }

  /** Run one entry at an explicit state-partition count and print the
    * throughput + per-batch progress breakdown. Mirrors
    * [[StreamBench.runSeconds]] with the conf pinned around query start
    * (state partitioning latches at first start) and progress kept. */
  def profile(spark: SparkSession, label: String,
      events: IndexedSeq[BenchEvent], parts: Int, nBatches: Int = 8)(
      f: DataFrame => Dataset[_]): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_prof")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val input = MemoryStream[BenchEvent]
      val q = f(input.toDF()).writeStream.format("noop")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .start()
      try {
        val per = math.max(1, events.length / nBatches)
        val t0 = System.nanoTime()
        events.grouped(per).foreach { chunk =>
          input.addData(chunk: _*)
          q.processAllAvailable()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
        def meanOf(k: String): Long = {
          val vs = prog.flatMap(p => Option(p.durationMs.get(k)).map(_.toLong))
          if (vs.isEmpty) -1 else vs.sum / vs.size
        }
        val stateCommitMs = prog.flatMap(_.stateOperators.toSeq)
          .map(_.commitTimeMs).sum / math.max(1, prog.size)
        val stateRows = prog.flatMap(_.stateOperators.toSeq)
          .map(_.numRowsTotal).maxOption.getOrElse(0L)
        println(f"[profile] $label%-24s eps=${events.length / sec}%9.0f " +
          f"batches=${prog.size}%2d addBatch=${meanOf("addBatch")}%5dms " +
          f"commitOffsets=${meanOf("commitOffsets")}%4dms " +
          f"walCommit=${meanOf("walCommit")}%4dms " +
          f"stateCommit/batch=$stateCommitMs%5dms maxStateRows=$stateRows%7d")
      } finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prior)
      deleteTree(ckpt)
    }
  }

  /** Best-effort recursive delete (throwaway checkpoint dirs). */
  private def deleteTree(root: java.nio.file.Path): Unit =
    try {
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse.foreach { p =>
          try java.nio.file.Files.deleteIfExists(p)
          catch { case _: java.io.IOException => () }
        }
      } finally walk.close()
    } catch { case _: java.io.IOException => () }
}
