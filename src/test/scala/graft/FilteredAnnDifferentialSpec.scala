package graft

import org.apache.spark.sql.DataFrame

import graft.memo.{MemoEngine, MetaCodec}

/** Randomized differential for the FILTERED ANN serving paths: over a
  * store whose metadata comes from the shared typed case generator
  * ([[FilterCaseGen]] — the same domain the filter-algebra and
  * data-skipping differentials run on), a filtered `annRecall` with
  * k ≥ corpus must return EXACTLY the filtered brute-force `recall`
  * ranking — ids AND scores — for every random filter. This covers the
  * whole filtered serving stack at once: the stats-pruned mask
  * derivation (a wrongly pruned segment loses survivors), the
  * probed-cell semi-join (a leaked id fails set equality), and the
  * widening/shortcut fill (an under-fill fails size equality). The PQ
  * path runs a subset (same contract, ADC-stage mask).
  *
  * Fixture note: every body shares a token with the query, so cosines
  * stay positive and `recall`'s −0.9 score floor never binds — the two
  * paths' contracts (ANN has no floor) coincide by construction. */
class FilteredAnnDifferentialSpec extends SparkTestBase {

  test("filtered annRecall/pqRecall == filtered brute force on random " +
      "typed metadata × random filters") {
    import spark.implicits._
    val gen = new FilterCaseGen(20260815L)
    val n = 60
    val metas = (0 until n).map(i => (i.toLong, gen.randomMeta()))
    val dir = java.nio.file.Files.createTempDirectory("fann_diff").toString
    val engine = new MemoEngine(spark, s"$dir/db")
    // three CDC batches → three segments, so the mask derivation's
    // segment pruning is live too; metadata arrives pre-encoded (the
    // store's typed encoding), bodies all carry the query token
    metas.grouped(n / 3).zipWithIndex.foreach { case (g, b) =>
      val feed = g.map { case (id, m) =>
        (id, "added", s"corpus doc $id batch $b topic${id % 7}",
          m.map { case (k, v) => k -> MetaCodec.encode(v) })
      }.toDF("id", "change", "body", "metadata")
        .withColumn("commit_version",
          org.apache.spark.sql.functions.lit(0L))
      engine.applyChanges(feed)
    }
    def rows(df: DataFrame): Seq[(Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    var nonTrivial = 0
    (0 until 30).foreach { i =>
      val filter = FilterCaseGen.toJson(gen.randomFilter())
      val exact = rows(engine.recall("corpus topic", k = n,
        filterExpr = Some(filter)))
      if (exact.nonEmpty && exact.size < n) nonTrivial += 1
      val ann = rows(engine.annRecall("corpus topic", k = n,
        nprobe = 1, filterExpr = Some(filter)))
      assert(ann == exact,
        s"case $i filter $filter: ann=$ann\nexact=$exact")
      if (i % 3 == 0) {
        val pq = rows(engine.pqRecall("corpus topic", k = n,
          nprobe = 1, refine = 8, filterExpr = Some(filter)))
        assert(pq == exact,
          s"case $i filter $filter: pq=$pq\nexact=$exact")
      }
      if (i % 5 == 0) {
        // the BATCH fill ladder under the same random filter: per query,
        // the widened batch set must equal the single-query widening
        // path — which this loop just proved equals brute force
        val queries = Seq((0L, "corpus topic"), (1L, "batch corpus doc"))
          .toDF("qid", "qtext")
        val batch = engine.annRecallBatch(queries, "qid", "qtext",
            k = n, nprobe = 1, filterExpr = Some(filter))
          .collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        Seq(0L -> "corpus topic", 1L -> "batch corpus doc").foreach {
          case (qid, qt) =>
            val single = rows(engine.annRecall(qt, k = n, nprobe = 1,
              filterExpr = Some(filter))).toSet
            assert(batch.getOrElse(qid, Set.empty) == single,
              s"case $i filter $filter qid=$qid: batch diverged")
        }
      }
    }
    // effectiveness floor: the generator must produce a healthy share of
    // filters that are neither match-all nor match-none, or the
    // differential is vacuous
    assert(nonTrivial >= 8, s"only $nonTrivial non-trivial filters of 30")
    engine.clean()
  }
}
