package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.ops.IvfIndex

/** IVF ANN quality: deterministic build, acceptable recall vs exact, and
  * the storage story — a persisted `partitionBy(cell_id)` index whose probe
  * prunes at the partition level. */
class IvfIndexSpec extends SparkTestBase {

  test("ivf search recall@10 >= 0.5 with nprobe=4/16 cells") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 16)
    assert(centroids.length == 16)
    val query = emb.filter(col("vec_id") === 1)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val recall = IvfIndex.recallAtK(emb, "vec_id", "embedding",
      centroids, query, k = 10, nprobe = 4)
    assert(recall >= 0.5, s"recall@10 = $recall")
    // full probe == exact
    val full = IvfIndex.recallAtK(emb, "vec_id", "embedding",
      centroids, query, k = 10, nprobe = 16)
    assert(full == 1.0, s"recall@10 with all cells probed = $full")
  }

  test("persisted index probe is a storage-level partition prune") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 16)
    val path = java.nio.file.Files.createTempDirectory("ivf")
      .resolve("idx").toString
    IvfIndex.persist(IvfIndex.build(emb, "vec_id", "embedding", centroids), path)
    val idx = IvfIndex.load(spark, path)
    val query = emb.filter(col("vec_id") === 1)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val res = IvfIndex.search(idx, centroids, query, k = 10, nprobe = 4)
    val scan = (res.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }).collect { case f: FileSourceScanExec => f }.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell_id")),
      s"cell filter did not become a partition filter: ${scan.partitionFilters}")
    val pruned = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
    val total = scan.relation.location.listFiles(Nil, Nil)
    assert(pruned.length <= 4, s"probe read ${pruned.length} partitions")
    assert(total.length > pruned.length,
      s"no pruning: ${pruned.length} of ${total.length} partitions")
    // and the pruned scan still returns the right ANN results
    val viaMem = IvfIndex.search(
      IvfIndex.build(emb, "vec_id", "embedding", centroids),
      centroids, query, k = 10, nprobe = 4).collect().map(_.getLong(0)).toSeq
    assert(res.collect().map(_.getLong(0)).toSeq == viaMem)
  }

  test("searchDf keeps the query in the plan and matches search()") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 16)
    val idx = IvfIndex.build(emb, "vec_id", "embedding", centroids)
    val query = emb.filter(col("vec_id") === 1)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val viaDriver = IvfIndex.search(idx, centroids, query, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val queryDf = emb.filter(col("vec_id") === 1).select("embedding")
    val viaPlan = IvfIndex.searchDf(idx, centroids, queryDf, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(viaPlan == viaDriver)
  }

  test("cell assignment is codegen (no ScalaUDF) and matches a driver loop") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 8)
    val built = IvfIndex.build(emb, "vec_id", "embedding", centroids)
    built.queryExecution.optimizedPlan.foreach(_.expressions.foreach(e =>
      e.foreach { x =>
        assert(!x.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF],
          "build plan contains a ScalaUDF")
      }))
    val sample = built.limit(50).collect()
    sample.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      var best = 0; var bestD = Double.MaxValue
      for (c <- centroids.indices) {
        var d = 0.0
        for (i <- centroids(c).indices) {
          val t = v(i) - centroids(c)(i); d += t * t
        }
        if (d < bestD) { bestD = d; best = c }
      }
      assert(r.getInt(2) == best, s"assignment drift for id ${r.getLong(0)}")
    }
  }

  test("buildIfAbsent reuses a valid persisted index, rebuilds on stamp change") {
    val emb = Tables(spark, sfDir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("ivf_ba")
      .resolve("idx").toString
    val c1 = IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    // second call must round-trip the identical centroids from disk
    val c2 = IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    // stamp mismatch (different nlist) forces a rebuild
    val c3 = IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 4, path)
    assert(c3.length == 4)
    assert(IvfIndex.load(spark, path)
      .select("cell_id").distinct().count() <= 4)
  }

  test("searchBatch: recall floor vs brute force, exact at full probe") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 16)
    val idx = IvfIndex.build(emb, "vec_id", "embedding", centroids)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, hits) => q -> hits.map(_._2).toSet }
    val exact = sets(graft.ops.Similarity.bruteForceTopKBatch(
      emb, "vec_id", queries, "query_id", 10,
      graft.functions.GraftFunctions.vecCosine(_, _)))
    val approx = sets(IvfIndex.searchBatch(idx, centroids, queries,
      "query_id", "qv", k = 10, nprobe = 4))
    assert(approx.keySet == exact.keySet, "a query lost its result group")
    val recalls = exact.map { case (q, ids) =>
      approx(q).intersect(ids).size.toDouble / ids.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.5, s"avg recall@10 = $avg (per-query: $recalls)")
    // probing every cell = exact brute force, per query
    val full = sets(IvfIndex.searchBatch(idx, centroids, queries,
      "query_id", "qv", k = 10, nprobe = 16))
    assert(full == exact, "nprobe=nlist must equal exact top-k")
  }

  test("searchBatch with a candidate mask: survivors only, exact filtered " +
      "top-k at full probe") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 16)
    val idx = IvfIndex.build(emb, "vec_id", "embedding", centroids)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // the mask: even vector ids only
    val mask = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id"))
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, hits) => q -> hits.map(_._2).toSet }
    val masked = sets(IvfIndex.searchBatch(idx, centroids, queries,
      "query_id", "qv", k = 10, nprobe = 4, allowed = Some(mask)))
    // every hit satisfies the mask
    masked.values.flatten.foreach(id =>
      assert(id % 2 == 0, s"mask leaked id $id"))
    // full probe = exact brute-force top-k over the masked corpus
    val exact = sets(graft.ops.Similarity.bruteForceTopKBatch(
      emb.filter(col("vec_id") % 2 === 0), "vec_id", queries,
      "query_id", 10, graft.functions.GraftFunctions.vecCosine(_, _)))
    val full = sets(IvfIndex.searchBatch(idx, centroids, queries,
      "query_id", "qv", k = 10, nprobe = 16, allowed = Some(mask)))
    assert(full == exact,
      "masked full-probe batch must equal filtered brute force")
  }

  test("the candidate mask does not defeat the cell_id partition prune") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 16)
    val path = java.nio.file.Files.createTempDirectory("ivf_mask")
      .resolve("idx").toString
    IvfIndex.persist(
      IvfIndex.build(emb, "vec_id", "embedding", centroids), path)
    val idx = IvfIndex.load(spark, path)
    val query = emb.filter(col("vec_id") === 1)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val mask = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id"))
    val res = IvfIndex.search(idx, centroids, query, k = 10, nprobe = 4,
      allowed = Some(mask))
    // the semi-join must ride ABOVE the pruned scan: the probed-cell
    // filter still reaches the index scan as a PARTITION filter, so a
    // filtered ANN query reads the same ≤ nprobe partition dirs the
    // unfiltered one does — the mask narrows rows, never widens I/O
    val scan = (res.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }).collect { case f: FileSourceScanExec => f }
      .find(_.output.exists(_.name == "embedding")).get
    assert(scan.partitionFilters.exists(
        _.references.exists(_.name == "cell_id")),
      s"mask join lost the partition filter: ${scan.partitionFilters}")
    val pruned = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
    assert(pruned.length <= 4,
      s"masked probe read ${pruned.length} partitions")
    // and the result equals filtering the unmasked ranking's source
    val expect = IvfIndex.search(
        IvfIndex.build(emb.filter(col("vec_id") % 2 === 0), "vec_id",
          "embedding", centroids), centroids, query, k = 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(res.collect().map(_.getLong(0)).toSeq == expect)
  }

  test("searchBatch job count does not grow with the query batch") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 16)
    val idx = IvfIndex.build(emb, "vec_id", "embedding", centroids)
    def jobsFor(nQueries: Int): Int = {
      val queries = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val group = s"ivf-batch-$nQueries"
      spark.sparkContext.setJobGroup(group, group)
      try IvfIndex.searchBatch(idx, centroids, queries, "query_id", "qv",
        k = 5, nprobe = 4).count()
      finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val j2 = jobsFor(2)
    val j10 = jobsFor(10)
    assert(j10 <= j2 + 1,
      s"job count grew with the batch: $j2 jobs for 2 queries, $j10 for 10")
    // and the plan never falls back to a cartesian against the corpus
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val plan = IvfIndex.searchBatch(idx, centroids, queries, "query_id",
      "qv", k = 5, nprobe = 4).queryExecution.executedPlan
    plan.foreach { n =>
      assert(!n.isInstanceOf[
        org.apache.spark.sql.execution.joins.CartesianProductExec],
        "searchBatch plan contains a CartesianProduct")
    }
  }

  test("append reuses centroids and never rewrites existing cell files") {
    val emb = Tables(spark, sfDir, "embeddings")
    val seed = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("ivf_app")
      .resolve("idx").toString
    val c1 = IvfIndex.buildIfAbsent(seed, "vec_id", "embedding", 8, path)
    def dataFiles() = {
      val root = java.nio.file.Paths.get(path)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = dataFiles()
    val c2 = IvfIndex.append(batch, "vec_id", "embedding", path)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq,
      "append must reuse the stored centroids")
    val after = dataFiles()
    before.foreach { case (f, mtime) =>
      assert(after.contains(f), s"append removed existing file $f")
      assert(after(f) == mtime, s"append rewrote existing file $f")
    }
    assert(after.size > before.size, "append added no files")
    val idx = IvfIndex.load(spark, path)
    assert(idx.count() == emb.count(), "appended index lost rows")
    // stamp advanced: buildIfAbsent over the grown corpus validates the
    // appended index instead of retraining + rewriting
    val c3 = IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    assert(c3.map(_.toSeq).toSeq == c1.map(_.toSeq).toSeq,
      "grown-corpus buildIfAbsent retrained despite a valid appended stamp")
    assert(dataFiles() == after, "grown-corpus buildIfAbsent rewrote files")
    // recall on the grown index: full probe still equals exact
    val query = emb.filter(col("vec_id") === 1)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val exact = emb
      .withColumn("score",
        graft.functions.GraftFunctions.vecCosine(col("embedding"),
          lit(query)))
      .orderBy(desc("score"), col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val grown = IvfIndex.search(idx, c2, query, k = 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(grown == exact, "full-probe search over appended index drifted")
  }

  test("delete tombstones probes out; applyDeletes rewrites only affected cells") {
    val emb = Tables(spark, sfDir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("ivf_del")
      .resolve("idx").toString
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    def dataFiles() = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path))
        .iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          !p.toString.contains("_tombstones"))
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    }
    // victims: half the members of ONE cell — bounds the later physical
    // apply to exactly that cell's partition directory
    val raw = spark.read.parquet(path)
    val cell = raw.select("cell_id").orderBy("cell_id").head().getInt(0)
    val cellIds = raw.filter(col("cell_id") === cell).select("id")
      .collect().map(_.getLong(0)).sorted
    val victimIds = cellIds.zipWithIndex.collect { case (id, i) if i % 2 == 0 => id }
    val victims = emb.filter(col("vec_id").isin(victimIds: _*))
    val survivors = emb.filter(!col("vec_id").isin(victimIds: _*))
    val before = dataFiles()
    IvfIndex.delete(victims, "vec_id", "embedding", path)
    assert(dataFiles() == before, "delete must not touch data files (O(batch))")
    // probes exclude the victims immediately
    val served = IvfIndex.load(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(served.intersect(victimIds.toSet).isEmpty, "tombstoned ids served")
    assert(served.size == emb.count() - victimIds.length)
    // the retreated stamp validates for corpus ∖ batch: NO rebuild
    IvfIndex.buildIfAbsent(survivors, "vec_id", "embedding", 8, path)
    assert(dataFiles() == before,
      "buildIfAbsent over the surviving corpus must reuse, not retrain")
    // physical apply rewrites ONLY the affected cell's partition
    assert(IvfIndex.applyDeletes(spark, path))
    val after = dataFiles()
    before.filterNot(_._1.contains(s"cell_id=$cell")).foreach {
      case (f, mtime) =>
        assert(after.get(f).contains(mtime), s"unaffected cell file touched: $f")
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "_tombstones")),
      "applied tombstones must be cleared")
    // physically gone: with the tombstone table cleared (asserted above),
    // load IS the raw physical state — resolved through the cell manifest,
    // which now maps the rewritten cell to its _apply_<tag> parent (a
    // plain root read would not see it)
    val phys = IvfIndex.load(spark, path).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(phys == served, "physical apply changed the served set")
    // and no victim row survives in ANY live directory of the manifest
    assert(phys.intersect(victimIds.toSet).isEmpty,
      "victim rows still physically present after apply")
    // and the stamp still validates (apply preserves it)
    IvfIndex.buildIfAbsent(survivors, "vec_id", "embedding", 8, path)
    assert(dataFiles() == after, "post-apply buildIfAbsent rebuilt")
  }

  test("a tombstoned id is refused by append until applyDeletes") {
    val emb = Tables(spark, sfDir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("ivf_reuse")
      .resolve("idx").toString
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    val victims = emb.filter(col("vec_id") % 13 === 0)
    IvfIndex.delete(victims, "vec_id", "embedding", path)
    // old rows still live in the cells: a re-append of a pending-delete
    // id would be masked by the tombstone while the stamp advanced
    val vid = victims.agg(min("vec_id")).head().getLong(0)
    val reAdd = emb.filter(col("vec_id") === vid)
    val e = intercept[IllegalStateException] {
      IvfIndex.append(reAdd, "vec_id", "embedding", path)
    }
    assert(e.getMessage.contains("pending delete"), e.getMessage)
    assert(IvfIndex.applyDeletes(spark, path))
    IvfIndex.append(reAdd, "vec_id", "embedding", path) // now legal
    val served = IvfIndex.load(spark, path).select("id")
      .collect().map(_.getLong(0))
    assert(served.count(_ == vid) == 1, "re-added id must serve exactly once")
  }

  test("tombstoned load keeps partition pruning AND broadcasts the anti-join") {
    val emb = Tables(spark, sfDir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("ivf_delplan")
      .resolve("idx").toString
    val centroids = IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    IvfIndex.delete(emb.filter(col("vec_id") % 9 === 0), "vec_id",
      "embedding", path)
    val query = emb.filter(col("vec_id") === 1)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val res = IvfIndex.search(IvfIndex.load(spark, path), centroids, query,
      k = 10, nprobe = 3)
    val plan = res.queryExecution.executedPlan
    val scan = (plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }).collect { case f: FileSourceScanExec => f }
      .find(_.relation.location.rootPaths.exists(_.toString.contains("idx")))
      .get
    // the cell filter must still prune partitions THROUGH the anti-join
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell_id")),
      s"cell filter lost under the tombstone join: ${scan.partitionFilters}")
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftAnti"),
      s"tombstone exclusion must be a broadcast anti-join:\n$s")
    assert(!s.contains("SortMergeJoin"), s"shuffle join in the probe plan:\n$s")
  }

  test("a torn append (journal ≠ stamp) is refused and forces a rebuild") {
    val emb = Tables(spark, sfDir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("ivf_torn")
      .resolve("idx").toString
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    // simulate a crash between the data write and the stamp advance
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_ivf_journal"), "999:8:1.0:0:fp0\n")
    val e = intercept[IllegalStateException] {
      IvfIndex.append(emb.limit(5), "vec_id", "embedding", path)
    }
    assert(e.getMessage.contains("incomplete append"))
    // freshness check sees the torn artifact as stale → rebuild arm
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "_ivf_journal")),
      "rebuild must clear the journal")
    // healthy again: append round-trips
    val ids = IvfIndex.load(spark, path).count()
    assert(ids == emb.count())
  }

  test("training is deterministic under the fixed seed") {
    val emb = Tables(spark, sfDir, "embeddings")
    val c1 = IvfIndex.trainCentroids(emb, "embedding", nlist = 8)
    val c2 = IvfIndex.trainCentroids(emb, "embedding", nlist = 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("distributed refinement cuts sample bias, stays layout-independent") {
    val emb = Tables(spark, sfDir, "embeddings")
    // a deliberately biased start: train on a thin sample
    val coarse = IvfIndex.trainCentroids(emb, "embedding", nlist = 8,
      sampleFraction = 0.05)
    val before = IvfIndex.quantizationError(emb, "embedding", coarse)
    val refined = IvfIndex.refineCentroids(emb, "embedding", coarse, iters = 2)
    val after = IvfIndex.quantizationError(emb, "embedding", refined)
    // Lloyd iterations never increase the objective
    assert(after <= before + 1e-9,
      s"refinement worsened quantization error: $before -> $after")
    // decimal means make the refined matrix layout-independent: the same
    // refinement over a repartitioned corpus is bit-identical
    val refined2 = IvfIndex.refineCentroids(emb.repartition(7), "embedding",
      coarse, iters = 2)
    assert(refined.map(_.toSeq).toSeq == refined2.map(_.toSeq).toSeq,
      "refined centroids differ across partition layouts")
    // an empty cell keeps its previous centroid
    val far = coarse.map(_.clone())
    far(7) = far(7).map(_ + 1e6f) // nothing assigns to a centroid 1e6 away
    val keep = IvfIndex.refineCentroids(emb, "embedding", far, iters = 1)
    assert(keep(7).toSeq == far(7).toSeq,
      "empty cell's centroid moved during refinement")
    // lifecycle: refinement rides the stamp — a refined build revalidates
    // (the paid scans are not discarded) and the knob is a config change
    val path = java.nio.file.Files.createTempDirectory("ivf_refined")
      .resolve("idx").toString
    val built = IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path,
      sampleFraction = 0.05, refineIters = 2)
    assert(built.map(_.toSeq).toSeq == refined.map(_.toSeq).toSeq,
      "persisted matrix is not the refined one")
    val reloaded = IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path,
      sampleFraction = 0.05, refineIters = 2)
    assert(reloaded.map(_.toSeq).toSeq == built.map(_.toSeq).toSeq,
      "refined build did not revalidate — the refinement was re-paid")
    val plain = IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path,
      sampleFraction = 0.05)
    assert(plain.map(_.toSeq).toSeq == coarse.map(_.toSeq).toSeq,
      "knob change must rebuild to the unrefined matrix")
  }

  test("compact: metadata-only no-op when balanced, rebalance when skewed") {
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("ivf_cmp")
      .resolve("idx").toString
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    def files() = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally s.close()
    }
    val fresh = files()
    // below-threshold skew: the check reads only the stamp, nothing moves
    assert(!IvfIndex.compact(emb, "vec_id", "embedding", path,
      maxSkew = 1e9), "compact must no-op when occupancy is within bounds")
    assert(files() == fresh, "a no-op compact rewrote index files")

    // a drifting ingest: a tight cluster (one vector + per-dim jitter) that
    // the frozen centroids funnel into one hot cell
    val v0 = emb.filter(col("vec_id") === 1)
      .select("embedding").head().getSeq[Float](0).toArray
    val hot = (0 until 500).map { i =>
      val v = v0.clone()
      v(i % v.length) += 0.002f * ((i % 7) + 1)
      (10000L + i, v)
    }.toDF("vec_id", "embedding")
    IvfIndex.append(hot, "vec_id", "embedding", path)
    val occBefore = IvfIndex.cellOccupancy(spark, path, 8)
    val skewBefore = IvfIndex.occupancySkew(occBefore.toSeq)
    assert(skewBefore > 4.0,
      s"hot-cluster append should skew occupancy, got $skewBefore")

    val grown = emb.select(col("vec_id"), col("embedding")).unionAll(hot)
    assert(IvfIndex.compact(grown, "vec_id", "embedding", path,
      maxSkew = 4.0), "compact must trigger above the skew threshold")
    val occAfter = IvfIndex.cellOccupancy(spark, path, 8)
    val skewAfter = IvfIndex.occupancySkew(occAfter.toSeq)
    assert(skewAfter < skewBefore,
      s"retrain did not rebalance: $skewBefore -> $skewAfter")
    assert(occAfter.sum == grown.count(), "compaction lost rows")

    // the compacted index still answers exactly at full probe...
    val meta = IvfIndex.buildIfAbsent(grown, "vec_id", "embedding", 8, path)
    assert(files().nonEmpty)
    // score with search()'s own round4: the hot cluster is a wall of
    // near-ties, so the comparison must use the same rounding + id
    // tie-break the operator does
    val exact = grown
      .withColumn("score", graft.functions.GraftFunctions.round4(
        graft.functions.GraftFunctions.vecCosine(col("embedding"), lit(v0))))
      .orderBy(desc("score"), col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val viaIdx = IvfIndex.search(IvfIndex.load(spark, path), meta, v0,
      k = 10, nprobe = 8).collect().map(_.getLong(0)).toSet
    assert(viaIdx == exact, "full-probe search drifted through compaction")
    // ...and the recall floor holds again at a partial probe
    val part = IvfIndex.search(IvfIndex.load(spark, path), meta, v0,
      k = 10, nprobe = 4).collect().map(_.getLong(0)).toSet
    assert(part.intersect(exact).size >= 5,
      s"recall@10 after compaction = ${part.intersect(exact).size / 10.0}")
  }

  test("buildIfAbsent validates the compacted stamp without rebuilding") {
    val emb = Tables(spark, sfDir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("ivf_cmp2")
      .resolve("idx").toString
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path,
      sampleFraction = 0.5)
    // force a rewrite regardless of skew, then ensure the stamp it wrote
    // is the one buildIfAbsent computes (fingerprint + config round-trip)
    IvfIndex.compact(emb, "vec_id", "embedding", path, maxSkew = 0.0)
    def files() = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally s.close()
    }
    val compacted = files()
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path,
      sampleFraction = 0.5)
    assert(files() == compacted,
      "buildIfAbsent rebuilt over a freshly compacted index")
  }

  test("searchBatch range-splits above maxBatch with identical results") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 16)
    val idx = IvfIndex.build(emb, "vec_id", "embedding", centroids)
    val queries = emb.filter(col("vec_id") < 9)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, -t._3, t._2)).toSeq
    val whole = IvfIndex.searchBatch(idx, centroids, queries, "query_id",
      "qv", k = 5, nprobe = 4)
    val split = IvfIndex.searchBatch(idx, centroids, queries, "query_id",
      "qv", k = 5, nprobe = 4, maxBatch = 2)
    // the oversized batch actually took the sliced path (a Union of
    // per-slice probe joins), and the union IS the unsplit answer
    assert(split.queryExecution.logical.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.nonEmpty, "maxBatch=2 with 9 queries did not range-split")
    assert(whole.queryExecution.logical.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.isEmpty, "an in-bounds batch must not split")
    assert(rows(split) == rows(whole),
      "range-split changed the result set")
  }

  test("adversarial apply churn: probes never silently lose a cell") {
    // The manifest-gated visibility contract under PHYSICAL apply churn
    // (the IVF twin of LexicalSpec's fold churn), now including the
    // nastiest interleaving: each cycle deletes 5 rows, applies the
    // tombstones physically (rewriting their cells out of base), then
    // APPENDS the same 5 rows back — recreating root `cell_id=` dirs an
    // apply just moved out of base, the exact sequence that could once
    // satisfy a stale manifest's path with only the batch's rows
    // (serving ~a whole cell short, silently). With the generation
    // re-check every successful load().count() must sit inside
    // [n-5, n]: victims masked/removed (n-5), fully restored (n), or a
    // mid-append partial batch (between) — a silently lost cell would
    // read ~60 rows short of the floor here. Loud failures are allowed
    // only in the documented transient classes (old-manifest probe
    // racing the post-swap deletes, or the gen re-check exhausting its
    // attempts under churn).
    val emb = Tables(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    val path = java.nio.file.Files.createTempDirectory("ivf_churn")
      .resolve("idx").toString
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val probeErrors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val probeOk = new java.util.concurrent.atomic.AtomicLong(0)
    val prober = new Thread(() => {
      while (!stop.get()) {
        try {
          val c = IvfIndex.load(spark, path).count()
          if (c < n - 5 || c > n)
            probeErrors.add(s"probe saw count $c outside [${n - 5}, $n] " +
              "— a cell went silently missing")
          probeOk.incrementAndGet()
        } catch {
          case e: Throwable =>
            val s = e.toString + Option(e.getCause).fold("")(_.toString)
            // the documented loud-transient class: an old-manifest probe
            // racing the post-swap deletes (missing file, missing dir,
            // or a parent dir gone entirely — which surfaces as the
            // basePath option failing validation)
            // ("Invalid directory": the tombstone table's dir listing
            // racing its post-apply clear — loud is CORRECT there; an
            // old-manifest probe silently skipping the mask would serve
            // the victims instead)
            // ("manifest generation": stableRead exhausted its bounded
            // re-resolutions under relentless churn — loud and
            // retriable, the designed alternative to a silent miss)
            // ("NoSuchFile": the java.nio shape of the same mid-scan
            // delete on a Linux local FS — Spark wraps it in
            // FAILED_READ_FILE when a superseded dir's parquet or .crc
            // vanishes between the probe's listing and its read)
            if (!s.contains("FileNotFound") && !s.contains("NoSuchFile") &&
                !s.contains("does not exist") &&
                !s.contains("FILE_NOT_EXIST") && !s.contains("PATH_NOT_FOUND") &&
                !s.contains("basePath") && !s.contains("Invalid directory") &&
                !s.contains("manifest generation"))
              probeErrors.add(s"unexpected probe failure: $s")
        }
      }
    })
    val allIds = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    prober.start()
    try {
      for (i <- 0 until 12) {
        val victims = allIds.slice(i * 5, i * 5 + 5).toSeq
        val batch = emb.filter(col("vec_id").isin(victims: _*))
        IvfIndex.delete(batch, "vec_id", "embedding", path)
        assert(IvfIndex.applyDeletes(spark, path))
        // recreate the just-applied cells from the batch — the stale-
        // manifest trap the generation re-check exists to detect
        IvfIndex.append(batch, "vec_id", "embedding", path)
      }
      // quiescent tail: on a loaded box every mid-churn probe can land
      // in a transient window — give the prober a post-churn interval
      // where probes must succeed, so the success floor below measures
      // the contract, not the box
      val tailDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (probeOk.get() <= 10 && System.nanoTime() < tailDeadline)
        Thread.sleep(100)
    } finally {
      stop.set(true)
      prober.join()
    }
    assert(probeErrors.isEmpty, probeErrors.toArray.mkString("\n"))
    assert(probeOk.get() > 10, s"only ${probeOk.get()} probes completed")
    // end state: every delete was appended back — full contents restored
    val finalIds = IvfIndex.load(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(finalIds == allIds.toSet, "post-churn contents diverged")
    emb.unpersist()
    ()
  }

  test("every meta write bumps the manifest generation nonce") {
    // The stableRead contract rests on one invariant: any maintenance
    // completion changes `gen:` in the meta header, so a probe that
    // resolved under a manifest and re-reads an UNCHANGED gen knows no
    // op published mid-resolution. Pin the bump across the lifecycle
    // (build → delete → apply → append → compact), each write distinct.
    val emb = Tables(spark, sfDir, "embeddings").cache()
    val path = java.nio.file.Files.createTempDirectory("ivf_gen")
      .resolve("idx").toString
    val conf = spark.sparkContext.hadoopConfiguration
    def gen() = IvfIndex.readHeaderManifest(conf, path, IvfIndex.MetaName).gen
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    val g0 = gen()
    assert(g0.nonEmpty, "build wrote no generation nonce")
    val batch = emb.filter(col("vec_id") < 5)
    IvfIndex.delete(batch, "vec_id", "embedding", path)
    val g1 = gen()
    IvfIndex.applyDeletes(spark, path)
    val g2 = gen()
    IvfIndex.append(batch, "vec_id", "embedding", path)
    val g3 = gen()
    IvfIndex.compact(emb, "vec_id", "embedding", path, maxSkew = 0.0)
    val g4 = gen()
    val gens = Seq(g0, g1, g2, g3, g4)
    assert(gens.distinct.size == gens.size,
      s"meta writes reused a generation nonce: $gens")
    emb.unpersist()
    ()
  }

  test("rawFloor cuts on the RAW cosine before rounding AND before the " +
      "top-k — the serving front doors' brute-arm floor parity") {
    import spark.implicits._
    // unit 2-d vectors: the cosine against q=(1,0) IS the x component,
    // so the floor boundary is exactly controllable. id 1's raw −0.90004
    // ROUNDS to −0.9000 (it would pass a post-round `score >= −0.9`
    // filter — the bug this pins against) but sits BELOW the raw floor;
    // id 2's −0.89996 rounds to the same −0.9000 and sits above it.
    def v(x: Double) =
      Seq(x.toFloat, math.sqrt(math.max(0.0, 1 - x * x)).toFloat)
    val emb = Seq((1L, v(-0.90004)), (2L, v(-0.89996)), (3L, v(0.5)))
      .toDF("id", "embedding")
    val centroids = Array(Array(1f, 0f), Array(-1f, 0f))
    val idx = IvfIndex.build(emb, "id", "embedding", centroids)
    val q = Array(1f, 0f)
    val unfloored = IvfIndex.search(idx, centroids, q, k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(unfloored == Set(1L, 2L, 3L))
    val floored = IvfIndex.search(idx, centroids, q, k = 10, nprobe = 2,
        rawFloor = Some(-0.9))
      .collect().map(_.getLong(0)).toSet
    assert(floored == Set(2L, 3L),
      "raw −0.90004 rounds to −0.9000 but must not pass the raw floor")
    // the floor runs BEFORE the top-k: with k=2 the sub-floor row must
    // not occupy a slot (a post-top-k filter would return only {3})
    val batchQ = Seq((7L, q.toSeq)).toDF("query_id", "qv")
    val batch = IvfIndex.searchBatch(idx, centroids, batchQ,
        "query_id", "qv", k = 2, nprobe = 2, rawFloor = Some(-0.9))
      .collect().map(_.getLong(1)).toSet
    assert(batch == Set(2L, 3L),
      s"sub-floor row wasted a top-k slot: $batch")
  }
}
