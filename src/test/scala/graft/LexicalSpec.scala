package graft

import org.apache.spark.sql.functions._

import graft.ops.Lexical

/** BM25 retrieval over the postings artifact: formula correctness on a
  * hand-checkable corpus, artifact lifecycle (build-once, O(batch)
  * append equivalence, stats compaction), and the probe plan (pushed
  * term filter). */
class LexicalSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.resolve("idx").toString
  }

  private val corpus = Seq(
    (0L, "apple banana apple"),       // tf(apple)=2, dl=3
    (1L, "apple cherry"),             // tf(apple)=1, dl=2
    (2L, "banana banana banana date"),
    (3L, "cherry date elderberry fig grape"),
    (4L, ""))                         // zero tokens: counts toward N only

  test("bm25 matches a hand-computed score on a tiny corpus") {
    val docs = corpus.toDF("doc_id", "text")
    val path = tmp("graft_lex_tiny")
    Lexical.writeIndex(docs, "doc_id", "text", path)
    val got = Lexical.searchBm25(spark, path, Seq("apple"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // N=5, sumdl=3+2+4+5+0=14, avgdl=2.8, df(apple)=2
    val idf = math.floor(math.log(1.0 + (5.0 - 2.0 + 0.5) / (2.0 + 0.5))
      * 10000.0 + 0.5) / 10000.0
    def score(tf: Double, dl: Double): Double = {
      val c = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / 2.8))))
      math.floor(c * 1000000.0 + 0.5) / 1000000.0
    }
    assert(got.map(_._1).toSeq == Seq(0L, 1L))
    assert(math.abs(got(0)._2 - score(2, 3)) < 1e-9)
    assert(math.abs(got(1)._2 - score(1, 2)) < 1e-9)
  }

  test("searchBm25Batch equals per-query searchBm25 — ids and scores, " +
      "mask and duplicate terms included") {
    val docs = corpus.toDF("doc_id", "text")
    val path = tmp("graft_lex_batch")
    Lexical.writeIndex(docs, "doc_id", "text", path)
    // query 1 carries a DUPLICATE term: the batch must dedup to the
    // single path's bag-of-distinct-terms contract
    val qsets = Map(0L -> Seq("apple", "banana"),
      1L -> Seq("cherry", "date", "cherry"))
    val qt = qsets.toSeq.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    def groupedOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val batch = groupedOf(Lexical.searchBm25Batch(spark, path, qt, k = 10))
    qsets.foreach { case (qid, ts) =>
      val single = Lexical.searchBm25(spark, path, ts.distinct, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(qid) == single,
        s"batch BM25 diverged from single for query $qid")
    }
    // the candidate mask applies to every query; df/N stay global, so
    // surviving docs keep their UNMASKED scores (filter-as-mask)
    val mask = Seq(0L, 2L, 3L).toDF("id")
    val masked = groupedOf(
      Lexical.searchBm25Batch(spark, path, qt, k = 10,
        allowedIds = Some(mask)))
    qsets.foreach { case (qid, ts) =>
      val single = Lexical.searchBm25(spark, path, ts.distinct, k = 10,
          allowedIds = Some(mask))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(masked(qid) == single,
        s"masked batch BM25 diverged for query $qid")
      masked(qid).foreach { case (id, _) =>
        assert(Set(0L, 2L, 3L).contains(id), s"mask leaked id $id") }
    }
    // THRESHOLD SWITCH: past isinTermLimit distinct terms the prune is a
    // broadcast semi-join, not a collected literal — identical results
    // (ids AND scores), and the scan plan carries no giant IN list. The
    // batch has 4 distinct terms; limit=2 forces the semi-join arm.
    val semiDf = Lexical.searchBm25Batch(spark, path, qt, k = 10,
      isinTermLimit = 2)
    assert(groupedOf(semiDf) == batch,
      "semi-join term pruning diverged from the isin arm")
    val inSets = semiDf.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case i: org.apache.spark.sql.catalyst.expressions.InSet => i
        case i: org.apache.spark.sql.catalyst.expressions.In => i
      })
    }.flatten
    assert(inSets.isEmpty,
      s"semi-join arm still plans a literal IN list: $inSets")
    // masked variant exercises both prunes together on the semi-join arm
    val semiMasked = groupedOf(Lexical.searchBm25Batch(spark, path, qt,
      k = 10, allowedIds = Some(mask), isinTermLimit = 2))
    assert(semiMasked == masked,
      "masked semi-join pruning diverged from the masked isin arm")
    // emptyOk: an empty vocabulary answers with the EMPTY frame instead
    // of throwing — the hybrid batch caller's no-extra-probe-job contract
    val noTerms = Seq.empty[(Long, String)].toDF("query_id", "term")
    assertThrows[IllegalArgumentException](
      Lexical.searchBm25Batch(spark, path, noTerms, k = 10).collect())
    assert(Lexical.searchBm25Batch(spark, path, noTerms, k = 10,
      emptyOk = true).isEmpty,
      "emptyOk must answer an empty vocabulary with the empty frame")
  }

  test("multi-term scores sum per doc; absent terms contribute nothing") {
    val docs = corpus.toDF("doc_id", "text")
    val path = tmp("graft_lex_multi")
    Lexical.writeIndex(docs, "doc_id", "text", path)
    val single = Seq("apple", "cherry").map { t =>
      Lexical.searchBm25(spark, path, Seq(t), k = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val both = Lexical.searchBm25(spark, path, Seq("apple", "cherry"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // decimal summation: multi-term score is exactly the sum of the
    // single-term scores (up to the final decimal→double cast)
    for ((id, s) <- both)
      assert(math.abs(s - single.map(_.getOrElse(id, 0.0)).sum) < 1e-9,
        s"doc $id: $s vs ${single.map(_.getOrElse(id, 0.0)).sum}")
    assert(!both.contains(4L), "token-less doc must never score")
  }

  test("append equals a fresh full build, and never rewrites postings files") {
    val docs = LexCorpus.docs(spark, sfDir)
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val grown = tmp("graft_lex_grown")
    val full = tmp("graft_lex_full")
    Lexical.writeIndex(half1, "doc_id", "text", grown)
    val before = listFiles(grown + "/postings")
    Lexical.append(half2, "doc_id", "text", grown)
    val after = listFiles(grown + "/postings")
    assert(before.subsetOf(after), "append must not rewrite existing files")
    assert(after.size > before.size, "append must add files")
    Lexical.writeIndex(docs, "doc_id", "text", full)
    val terms = Seq("batch", "scan", "vector", "merge")
    val a = Lexical.searchBm25(spark, grown, terms, 25).collect().toSeq
    val b = Lexical.searchBm25(spark, full, terms, 25).collect().toSeq
    assert(a == b, "appended artifact must serve identical rankings")
    // and the grown artifact validates: no rebuild on writeIfAbsent
    Lexical.writeIfAbsent(docs, "doc_id", "text", grown)
    assert(listFiles(grown + "/postings") == after,
      "writeIfAbsent over the grown corpus must reuse the appended artifact")
  }

  test("compactStats folds df deltas without changing rankings") {
    val docs = LexCorpus.docs(spark, sfDir)
    val path = tmp("graft_lex_compact")
    Lexical.writeIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
    Lexical.append(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", path)
    val terms = Seq("batch", "scan", "vector")
    val before = Lexical.searchBm25(spark, path, terms, 25).collect().toSeq
    val filesBefore = listFiles(path + "/termstats").size
    Lexical.compactStats(spark, path)
    assert(listFiles(path + "/termstats").size < filesBefore,
      "compaction must reduce the delta file count")
    val after = Lexical.searchBm25(spark, path, terms, 25).collect().toSeq
    assert(before == after)
  }

  test("content change with identical row count invalidates the stamp") {
    val docs = corpus.toDF("doc_id", "text")
    val path = tmp("graft_lex_stale")
    Lexical.writeIfAbsent(docs, "doc_id", "text", path)
    val top0 = Lexical.searchBm25(spark, path, Seq("apple"), 10)
      .collect().map(_.getLong(0)).toSeq
    val changed = corpus.map { case (id, t) =>
      (id, if (id == 2L) "apple apple apple apple" else t) }
      .toDF("doc_id", "text")
    Lexical.writeIfAbsent(changed, "doc_id", "text", path)
    val top1 = Lexical.searchBm25(spark, path, Seq("apple"), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(top1 != top0 && top1.contains(2L),
      s"stale artifact served after in-place content change: $top1")
  }

  test("scoreBm25 (artifact-free) serves the identical ranking to the artifact") {
    val docs = LexCorpus.docs(spark, sfDir)
    val path = tmp("graft_lex_inline")
    Lexical.writeIndex(docs, "doc_id", "text", path)
    val terms = Seq("batch", "scan", "vector", "merge")
    val inline = Lexical.scoreBm25(docs, "doc_id", "text", terms, 25)
      .collect().toSeq
    val artifact = Lexical.searchBm25(spark, path, terms, 25)
      .collect().toSeq
    assert(inline == artifact, "the two serving paths must agree bit-for-bit")
  }

  test("appendOnce: replayed micro-batches never double-count") {
    import java.nio.file.{Files, Paths}
    val docs = LexCorpus.docs(spark, sfDir)
    val path = tmp("graft_lex_stream")
    Lexical.writeIndex(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", path)
    val b0 = docs.filter(col("doc_id") % 3 === 1)
    val b1 = docs.filter(col("doc_id") % 3 === 2)
    Lexical.appendOnce(b0, "doc_id", "text", path, batchId = 0)
    val stampBeforeB1 = Files.readString(Paths.get(path, "_lex_meta"))
    Lexical.appendOnce(b1, "doc_id", "text", path, batchId = 1)
    val terms = Seq("batch", "scan", "vector", "merge")
    val expect = Lexical.searchBm25(spark, path, terms, 25).collect().toSeq
    val files = listFiles(path + "/postings")
    // restart replay: watermark at 1 → the whole call no-ops
    Lexical.appendOnce(b1, "doc_id", "text", path, batchId = 1)
    assert(listFiles(path + "/postings") == files, "replay must not write")
    assert(Lexical.searchBm25(spark, path, terms, 25).collect().toSeq == expect)
    // crash-window replay: data landed but the stamp did NOT advance
    // (simulated by restoring the pre-batch stamp) — the deterministic
    // ingest directory is overwritten in place, never duplicated
    Files.writeString(Paths.get(path, "_lex_meta"), stampBeforeB1)
    // the raw rewrite bypassed the Hadoop local FS checksum sidecar
    Files.deleteIfExists(Paths.get(path, "._lex_meta.crc"))
    Lexical.appendOnce(b1, "doc_id", "text", path, batchId = 1)
    assert(Lexical.searchBm25(spark, path, terms, 25).collect().toSeq == expect,
      "crash-window replay must rewrite, not double-append")
    // and the grown artifact still validates as the full corpus
    Lexical.writeIfAbsent(docs, "doc_id", "text", path)
    assert(Lexical.searchBm25(spark, path, terms, 25).collect().toSeq == expect,
      "writeIfAbsent after stream ingest must reuse, not rebuild")
  }

  test("a crashed append is detected, refused, and repairable") {
    import java.nio.file.{Files, Paths}
    val docs = LexCorpus.docs(spark, sfDir)
    val path = tmp("graft_lex_torn")
    Lexical.writeIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
    val terms = Seq("batch", "scan")
    Lexical.searchBm25(spark, path, terms, 5).collect() // healthy baseline
    // simulate a crash mid-append: journal present, expected stamp ≠ live
    Files.writeString(Paths.get(path, "_lex_journal"), "adhoc_dead|999:999:fp0\n")
    // the lock-free probe can't tell in-flight from crashed — the typed
    // error + retry-first message let callers absorb the transient case
    // instead of paying the O(corpus) rebuild a crash needs
    val probeErr = intercept[Lexical.PendingAppendException] {
      Lexical.searchBm25(spark, path, terms, 5)
    }
    assert(probeErr.getMessage.contains("retry shortly"),
      s"probe must refuse a torn artifact: ${probeErr.getMessage}")
    // a foreign append must refuse too (its stats would land beside
    // inconsistent data)
    val appendErr = intercept[IllegalStateException] {
      Lexical.append(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", path)
    }
    assert(appendErr.getMessage.contains("incomplete append"))
    // writeIfAbsent sees the pending journal as stale and rebuilds
    Lexical.writeIfAbsent(docs, "doc_id", "text", path)
    assert(!Files.exists(Paths.get(path, "_lex_journal")),
      "rebuild must clear the journal")
    assert(Lexical.searchBm25(spark, path, terms, 5).collect().nonEmpty)
    // a journal whose expected stamp IS live is a completed append's
    // stale marker: probes serve, the next append reconciles it away
    val live = Files.readString(Paths.get(path, "_lex_meta")).trim
    Files.writeString(Paths.get(path, "_lex_journal"), s"adhoc_done|$live\n")
    assert(Lexical.searchBm25(spark, path, terms, 5).collect().nonEmpty,
      "stale completed-append marker must not block probes")
    Lexical.append(
      Seq((900L, "reconcile probe doc")).toDF("doc_id", "text"),
      "doc_id", "text", path)
    assert(!Files.exists(Paths.get(path, "_lex_journal")))
  }

  test("appendOnce drives as a real foreachBatch sink over a MemoryStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmp("graft_lex_sink")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lex_ckpt")
    // seed the artifact (appendOnce maintains, writeIndex creates)
    Lexical.writeIndex(
      Seq((1000L, "seed doc about parquet")).toDF("doc_id", "text"),
      "doc_id", "text", path)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        Lexical.appendOnce(df, "doc_id", "text", path, id))
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      input.addData((0L, "kafka stream topics"), (1L, "parquet files"))
      q.processAllAvailable()
      input.addData((2L, "kafka connect parquet sink"))
      q.processAllAvailable()
    } finally q.stop()
    val kafka = Lexical.searchBm25(spark, path, Seq("kafka"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(kafka == Set(0L, 2L), s"streamed docs not served: $kafka")
    val parquet = Lexical.searchBm25(spark, path, Seq("parquet"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(parquet == Set(1L, 2L, 1000L))
  }

  test("rrfFuse sums reciprocal ranks, null rank where a list missed") {
    val bm = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val vec = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Lexical.rrfFuse(Seq("bm25" -> bm, "vec" -> vec), k = 10)
      .collect()
    def c(r: Int) = math.floor(1.0 / (60.0 + r) * 1e8 + 0.5) / 1e8
    val expect = Map(20L -> (c(2) + c(1)), 10L -> c(1), 30L -> c(3),
      40L -> c(2))
    assert(out.map(_.getLong(0)).toSet == expect.keySet)
    assert(out.head.getLong(0) == 20L, "doubly-ranked id must fuse highest")
    for (r <- out)
      assert(math.abs(r.getDouble(1) - expect(r.getLong(0))) < 1e-9)
    val ranks = out.map(r =>
      r.getLong(0) -> (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(ranks(10L) == ((Some(1), None)), "vec must be null for id 10")
    assert(ranks(40L) == ((None, Some(2))), "bm25 must be null for id 40")
    assert(ranks(20L) == ((Some(2), Some(1))))
  }

  test("probe plan pushes the term filter into the postings scan") {
    val docs = corpus.toDF("doc_id", "text")
    val path = tmp("graft_lex_plan")
    Lexical.writeIndex(docs, "doc_id", "text", path)
    val plan = Lexical.searchBm25(spark, path, Seq("apple", "cherry"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"term IN filter not pushed to parquet:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must not be a global sort")
  }

  test("compactPostings folds ingest dirs to one term-sorted base") {
    val docs = LexCorpus.docs(spark, sfDir)
    val path = tmp("graft_lex_pfold")
    Lexical.writeIndex(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", path)
    Lexical.append(docs.filter(col("doc_id") % 3 === 1), "doc_id", "text", path)
    Lexical.append(docs.filter(col("doc_id") % 3 === 2), "doc_id", "text", path)
    val terms = Seq("batch", "scan", "vector", "merge")
    val before = Lexical.searchBm25(spark, path, terms, 25).collect().toSeq
    val dirsBefore = ingestDirs(path + "/postings")
    assert(dirsBefore.size == 3, s"expected 3 ingest dirs, got $dirsBefore")
    val filesBefore = listFiles(path + "/postings").size
    Lexical.compactPostings(spark, path)
    val foldedDirs = ingestDirs(path + "/postings")
    assert(foldedDirs.size == 1 && foldedDirs.head.startsWith("ingest=base"),
      s"postings must fold to a single base directory, got $foldedDirs")
    assert(listFiles(path + "/postings").size < filesBefore,
      "compaction must reduce the probe's file count")
    assert(Lexical.searchBm25(spark, path, terms, 25).collect().toSeq == before,
      "folding must not change rankings")
    // stamp still validates: no rebuild on writeIfAbsent
    val files = listFiles(path + "/postings")
    Lexical.writeIfAbsent(docs, "doc_id", "text", path)
    assert(listFiles(path + "/postings") == files,
      "writeIfAbsent after compaction must reuse the folded artifact")
  }

  test("appendOnce auto-folds level-0 dirs into a tier; replays still no-op") {
    val docs = LexCorpus.docs(spark, sfDir)
    val path = tmp("graft_lex_autofold")
    Lexical.writeIndex(docs.filter(col("doc_id") % 4 === 0), "doc_id", "text", path)
    def once(m: Int, id: Long) = Lexical.appendOnce(
      docs.filter(col("doc_id") % 4 === m), "doc_id", "text", path,
      batchId = id, maxIngestDirs = 1)
    once(1, 0) // base + 1 level-0 dir: at threshold, no fold
    assert(ingestDirs(path + "/postings").size == 2)
    once(2, 1) // 2 level-0 dirs > 1 → cheap tier merge (base untouched)
    val afterFold = ingestDirs(path + "/postings")
    assert(afterFold.size == 2 && afterFold.contains("ingest=base") &&
      afterFold.exists(_.startsWith("ingest=t1_")),
      s"expected base + one tier dir, got $afterFold")
    val terms = Seq("batch", "scan", "vector", "merge")
    val expect = Lexical.searchBm25(spark, path, terms, 25).collect().toSeq
    // a replayed folded batch must still no-op on the watermark (the
    // fold ran after its stamp advance — the safety argument)
    val files = listFiles(path + "/postings")
    once(2, 1)
    assert(listFiles(path + "/postings") == files, "replay wrote after fold")
    assert(Lexical.searchBm25(spark, path, terms, 25).collect().toSeq == expect)
    // stream continues beyond the fold; full corpus serves correctly
    once(3, 2)
    val full = tmp("graft_lex_autofold_full")
    Lexical.writeIndex(docs, "doc_id", "text", full)
    assert(Lexical.searchBm25(spark, path, terms, 25).collect().toSeq ==
      Lexical.searchBm25(spark, full, terms, 25).collect().toSeq)
    // tier accumulation escalates to the full corpus fold
    Lexical.compactDeltas(spark, path, fullAfterTiers = 1)
    val deep = ingestDirs(path + "/postings")
    assert(deep.size == 1 && deep.head.startsWith("ingest=base"),
      s"tier threshold must escalate to the deep fold, got $deep")
    assert(Lexical.searchBm25(spark, path, terms, 25).collect().toSeq ==
      Lexical.searchBm25(spark, full, terms, 25).collect().toSeq)
  }

  test("adversarial churn: 100 micro-batches + deletes under concurrent probes") {
    import spark.implicits._
    val path = tmp("graft_lex_churn")
    val nBatches = 100
    val perBatch = 3
    val maxIngest = 4 // fold every 4 batches; full fold every 4×8
    val fanInBound = 1 + Lexical.MaxTierDirs + maxIngest + 1 // +1 transient
    Lexical.writeIndex(
      Seq((0L, "seed doc alpha batch")).toDF("doc_id", "text"),
      "doc_id", "text", path)
    // shared truth the probe thread snapshots BEFORE each probe: a doc
    // whose delete RETURNED before the snapshot must never be served
    // (the delete's meta swap happens-before the snapshot update)
    val deleted = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()
    val live = scala.collection.mutable.Map(0L -> "seed doc alpha batch")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val probeErrors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val probeOk = new java.util.concurrent.atomic.AtomicLong(0)
    val prober = new Thread(() => {
      while (!stop.get()) {
        val snapshot = new java.util.HashSet(deleted.keySet())
        try {
          val ids = Lexical.searchBm25(spark, path, Seq("alpha", "batch"), 500)
            .collect().map(_.getLong(0))
          if (ids.exists(snapshot.contains))
            probeErrors.add(s"served a doc deleted before the probe: " +
              ids.filter(snapshot.contains).mkString(","))
          probeOk.incrementAndGet()
        } catch {
          // the two DOCUMENTED loud-transient outcomes: an append's
          // journal window, or a probe that resolved the old manifest
          // and lost the file-listing race with a fold's cleanup
          case e: Throwable =>
            val s = e.toString + Option(e.getCause).fold("")(_.toString)
            if (!s.contains("PendingAppend") && !s.contains("FileNotFound") &&
                !s.contains("NoSuchFile") && !s.contains("does not exist"))
              probeErrors.add(s"unexpected probe failure: $s")
        }
      }
    })
    prober.start()
    try {
      for (b <- 1 to nBatches) {
        val docs = (0 until perBatch).map { j =>
          val id = (b.toLong * perBatch) + j
          id -> s"doc $id alpha batch word${id % 17} term${id % 5}"
        }
        docs.foreach { case (id, t) => live(id) = t }
        Lexical.appendOnce(docs.toDF("doc_id", "text"), "doc_id", "text",
          path, batchId = b.toLong, maxIngestDirs = maxIngest)
        if (b % 7 == 0) {
          // delete one previously-ingested live doc (oldest first so a
          // victim is never in the batch just appended)
          val vid = live.keys.min
          Lexical.delete(Seq((vid, live(vid))).toDF("doc_id", "text"),
            "doc_id", "text", path)
          live.remove(vid)
          deleted.put(vid, true)
        }
        val fanIn = ingestDirs(path + "/postings").size
        assert(fanIn <= fanInBound,
          s"probe fan-in $fanIn exceeded bound $fanInBound at batch $b")
      }
    } finally {
      stop.set(true)
      prober.join()
    }
    assert(probeErrors.isEmpty, probeErrors.toArray.mkString("\n"))
    assert(probeOk.get() > 10, s"only ${probeOk.get()} probes completed")
    // final state ≡ a fresh build of the survivors, bit for bit
    val fresh = tmp("graft_lex_churn_fresh")
    Lexical.writeIndex(live.toSeq.toDF("doc_id", "text"),
      "doc_id", "text", fresh)
    val terms = Seq("alpha", "batch", "word3")
    assert(Lexical.searchBm25(spark, path, terms, 500).collect().toSeq ==
      Lexical.searchBm25(spark, fresh, terms, 500).collect().toSeq,
      "churned artifact diverged from a fresh build of the survivors")
  }

  test("reserved tier/base lineages are re-prefixed; replay detection intact") {
    import spark.implicits._
    val path = tmp("graft_lex_lineage")
    Lexical.writeIndex(Seq((1L, "seed doc about batch")).toDF("doc_id", "text"),
      "doc_id", "text", path)
    // a user lineage whose sanitized form collides with the maintenance
    // namespaces (t1_* = merged tier, base* = folded base) must not mint
    // dirs the fold classifier would miscount as tier/base
    for ((lin, bid) <- Seq(("t1", 1L), ("base", 1L), ("base_x", 2L))) {
      Lexical.appendOnce(Seq((100L * bid + lin.length, s"doc via $lin"))
        .toDF("doc_id", "text"), "doc_id", "text", path, bid, lineage = lin)
    }
    val dirs = ingestDirs(path + "/postings")
    assert(dirs.exists(_.startsWith("ingest=u_t1_")), dirs.toString)
    assert(dirs.exists(_.startsWith("ingest=u_base_")), dirs.toString)
    assert(!dirs.exists(d => d.startsWith("ingest=t1_") && !d.startsWith("ingest=u_")),
      s"user lineage leaked into the tier namespace: $dirs")
    // replay of the re-prefixed lineage still no-ops (watermark carries
    // the re-prefixed name consistently)
    val n0 = Lexical.searchBm25(spark, path, Seq("doc"), 100).collect().length
    Lexical.appendOnce(Seq((999L, "replayed doc")).toDF("doc_id", "text"),
      "doc_id", "text", path, 2L, lineage = "base_x")
    assert(Lexical.searchBm25(spark, path, Seq("doc"), 100)
      .collect().length == n0, "replayed reserved-lineage batch landed twice")
  }

  test("manifest gates visibility: orphan dirs invisible, crash-safe folds") {
    import java.nio.file.{Files, Paths}
    val docs = corpus.toDF("doc_id", "text")
    val path = tmp("graft_lex_manifest")
    Lexical.writeIndex(docs, "doc_id", "text", path)
    val expect = Lexical.searchBm25(spark, path, Seq("apple", "banana"), 10)
      .collect().toSeq
    // a crashed fold leaves its half-written output as a directory the
    // manifest does not reference — probes must not see it
    val orphan = Paths.get(path, "postings", "ingest=t1_orphan")
    Files.createDirectories(orphan)
    spark.range(3).selectExpr("'apple' as term", "id + 900 as doc_id",
      "5L as tf", "5L as dl").write.mode("overwrite").parquet(orphan.toString)
    assert(Lexical.searchBm25(spark, path, Seq("apple", "banana"), 10)
      .collect().toSeq == expect,
      "probe served rows from a directory outside the manifest")
    // the next maintenance run sweeps the orphan and serving is unchanged
    Lexical.compactStats(spark, path)
    Lexical.compactPostings(spark, path)
    assert(!Files.exists(orphan), "maintenance must sweep orphan dirs")
    assert(Lexical.searchBm25(spark, path, Seq("apple", "banana"), 10)
      .collect().toSeq == expect)
    // a fully missing meta file (a gutted artifact) still refuses loudly
    Files.delete(Paths.get(path, "_lex_meta"))
    Files.deleteIfExists(Paths.get(path, "._lex_meta.crc"))
    val e = intercept[IllegalStateException] {
      Lexical.searchBm25(spark, path, Seq("apple"), 5)
    }
    assert(e.getMessage.contains("writeIndex first"))
    Lexical.writeIfAbsent(docs, "doc_id", "text", path) // rebuild repairs
    assert(Lexical.searchBm25(spark, path, Seq("apple"), 5).collect().nonEmpty)
  }

  test("delete retracts docs O(batch): scores match a fresh build of the rest") {
    val docs = LexCorpus.docs(spark, sfDir)
    val victims = docs.filter(col("doc_id") % 7 === 0)
    val survivors = docs.filter(col("doc_id") % 7 =!= 0)
    val path = tmp("graft_lex_del")
    val fresh = tmp("graft_lex_del_fresh")
    Lexical.writeIndex(docs, "doc_id", "text", path)
    val postingsFiles = listFiles(path + "/postings")
    Lexical.delete(victims, "doc_id", "text", path)
    // O(batch): no postings file was rewritten or removed by the delete
    assert(listFiles(path + "/postings") == postingsFiles,
      "delete must not touch postings files")
    val terms = Seq("batch", "scan", "vector", "merge")
    val got = Lexical.searchBm25(spark, path, terms, 25).collect().toSeq
    Lexical.writeIndex(survivors, "doc_id", "text", fresh)
    val want = Lexical.searchBm25(spark, fresh, terms, 25).collect().toSeq
    assert(got == want,
      "post-delete serving must be bit-identical to a fresh index of the rest")
    assert(got.nonEmpty)
    // the retreated stamp validates for the surviving corpus: NO rebuild
    Lexical.writeIfAbsent(survivors, "doc_id", "text", path)
    assert(listFiles(path + "/postings") == postingsFiles,
      "writeIfAbsent over corpus ∖ batch must reuse, not rebuild")
    // compaction applies tombstones physically and clears them
    Lexical.compact(spark, path)
    val applied = ingestDirs(path + "/postings")
    assert(applied.size == 1 && applied.head.startsWith("ingest=base"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "tombstones")),
      "compaction must clear applied tombstones")
    assert(Lexical.searchBm25(spark, path, terms, 25).collect().toSeq == want,
      "physical apply must not change rankings")
    // deleted ids never resurface
    val served = Lexical.searchBm25(spark, path, terms, 1000)
      .collect().map(_.getLong(0)).toSet
    val victimIds = victims.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(served.intersect(victimIds).isEmpty)
  }

  test("a tombstoned id is refused by append until deletes apply physically") {
    val docs = LexCorpus.docs(spark, sfDir)
    val victims = docs.filter(col("doc_id") % 11 === 0)
    val path = tmp("graft_lex_reuse")
    Lexical.writeIndex(docs, "doc_id", "text", path)
    Lexical.delete(victims, "doc_id", "text", path)
    // the hazard: the victim's OLD postings rows are still physically
    // present, so a re-append of its id would be anti-joined out of every
    // probe while the stamp advanced to include it — and after the fold
    // the stamp would permanently describe a doc the data lacks
    val vid = victims.agg(min("doc_id")).head().getLong(0)
    val reAdd = spark.range(1)
      .select(lit(vid).as("doc_id"), lit("brand new text").as("text"))
    val e = intercept[IllegalStateException] {
      Lexical.append(reAdd, "doc_id", "text", path)
    }
    assert(e.getMessage.contains("pending delete"), e.getMessage)
    // disjoint ids still append fine through the same guard
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    Lexical.append(reAdd.select((col("doc_id") + maxId + 1).as("doc_id"),
      col("text")), "doc_id", "text", path)
    // physical apply clears the tombstones — the id becomes appendable
    Lexical.compact(spark, path)
    Lexical.append(reAdd, "doc_id", "text", path)
    // and the artifact stays truthful: stamp validates against the
    // corpus it actually serves (survivors + the two appended rows)
    val nowCorpus = docs.filter(col("doc_id") % 11 =!= 0)
      .union(reAdd.select((col("doc_id") + maxId + 1).as("doc_id"),
        col("text")))
      .union(reAdd)
    Lexical.writeIfAbsent(nowCorpus, "doc_id", "text", path)
    val fresh = tmp("graft_lex_reuse_fresh")
    Lexical.writeIndex(nowCorpus, "doc_id", "text", fresh)
    val terms = Seq("batch", "scan", "new")
    assert(Lexical.searchBm25(spark, path, terms, 25).collect().toSeq ==
      Lexical.searchBm25(spark, fresh, terms, 25).collect().toSeq)
  }

  test("searchBm25 allowedIds: filter-as-mask, global stats, exact at any selectivity") {
    val docs = LexCorpus.docs(spark, sfDir)
    val path = tmp("graft_lex_mask")
    Lexical.writeIndex(docs, "doc_id", "text", path)
    val terms = Seq("batch", "scan", "vector")
    // reference: the FULL global ranking, masked post-hoc — filter-as-
    // mask semantics says the semi-join must reproduce exactly this
    // (scores unchanged, order = global (score desc, doc_id))
    val full = Lexical.searchBm25(spark, path, terms, 100000).collect().toSeq
    val want = full.filter(_.getLong(0) % 2 == 0).take(25)
    val evens = docs.select(col("doc_id")).filter(col("doc_id") % 2 === 0)
    val got = Lexical.searchBm25(spark, path, terms, 25,
      allowedIds = Some(evens)).collect().toSeq
    assert(got == want, "mask diverged from post-hoc filtered global ranking")
    // id column name/type from the caller's world is normalized
    val stringIds = evens.select(col("doc_id").cast("string").as("id"))
    assert(Lexical.searchBm25(spark, path, terms, 25,
      allowedIds = Some(stringIds)).collect().toSeq == want)
    // degenerate mask: empty result, no error, no fallback needed
    assert(Lexical.searchBm25(spark, path, terms, 25,
      allowedIds = Some(evens.filter(lit(false)))).collect().isEmpty)
  }

  test("tombstoned probe plan: pushed term filter + BROADCAST anti-join") {
    val docs = LexCorpus.docs(spark, sfDir)
    val path = tmp("graft_lex_delplan")
    Lexical.writeIndex(docs, "doc_id", "text", path)
    Lexical.delete(docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", path)
    val plan = Lexical.searchBm25(spark, path, Seq("batch", "scan"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"term IN filter lost under the tombstone join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstone exclusion must be a broadcast anti-join, not a shuffle:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-sized shuffle join in the probe plan:\n$plan")
  }

  /** Top-level `ingest=` partition directories under `dir`. */
  private def ingestDirs(dir: String): Set[String] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) Set.empty
    else {
      val s = java.nio.file.Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("ingest=")).toSet
      } finally s.close()
    }
  }

  /** All parquet files under `dir`, as ingest-relative paths (the layout
    * nests each batch in its own `ingest=<tag>` directory). */
  private def listFiles(dir: String): Set[String] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) Set.empty
    else {
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .map(p => root.relativize(p).toString).toSet
      } finally walk.close()
    }
  }
}

/** Corpus loader (documents at sfDir, id + text only). */
private object LexCorpus {
  def docs(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
}
