package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.queries.DedupQueries

/** Near-dup recovery: planted mutant pairs (doc_id, doc_id+100000) must be
  * found by each candidate-generation scheme at sf0.001. */
class DedupSpec extends SparkTestBase {

  test("minhash LSH recovers planted near-dup pairs with high recall") {
    val docs = DedupQueries.withMutants(spark, sfDir)
    val planted = docs.filter(col("doc_id") >= 100000).count()
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .filter(col("b") === col("a") + 100000).count()
    assert(planted > 0)
    // short docs mutate past the 0.5 Jaccard threshold legitimately —
    // require >= 90% recall, not exactness
    assert(pairs >= planted * 9 / 10, s"recovered $pairs of $planted planted pairs")
  }

  test("simhash banding recovers planted pairs within hamming budget") {
    val docs = DedupQueries.withMutants(spark, sfDir)
    val planted = docs.filter(col("doc_id") >= 100000).count()
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .filter(col("b") === col("a") + 100000).count()
    // simhash with hamming<=3 is stricter; expect the large majority
    assert(pairs >= planted * 7 / 10, s"recovered $pairs of $planted")
  }

  test("ngram jaccard of planted pairs is high; disjoint pairs low") {
    val docs = DedupQueries.withMutants(spark, sfDir)
    val l = docs.select(col("doc_id").as("a"), col("text").as("texta"))
    val r = docs.select(col("doc_id").as("b"), col("text").as("textb"))
    val pairs = l.join(r, col("b") === col("a") + 100000)
    val jac = Dedup.ngramJaccard(pairs).agg(min(col("jaccard"))).collect()(0)
      .getDouble(0)
    assert(jac > 0.5, s"min planted jaccard=$jac")
  }

  test("removeNearDups leaves a corpus with no remaining candidate pairs") {
    val docs = DedupQueries.withMutants(spark, sfDir)
    val cleaned = Dedup.removeNearDups(docs, "doc_id", "text", minJaccard = 0.5)
    // the larger side of every pair is dropped, so no pair can survive
    val leftover = Dedup.minHashPairs(cleaned, "doc_id", "text",
      minJaccard = 0.5).count()
    assert(leftover == 0, s"$leftover near-dup pairs survived cleaning")
    // most planted mutants are gone (short docs may miss the threshold)
    val originals = Tables(spark, sfDir, "documents").count()
    val planted = docs.count() - originals
    val mutantsLeft = cleaned.filter(col("doc_id") >= 100000).count()
    assert(mutantsLeft <= planted / 10, s"$mutantsLeft of $planted mutants survived")
  }

  test("winnowing inverted index recovers planted pairs") {
    val docs = DedupQueries.withMutants(spark, sfDir)
    val planted = docs.filter(col("doc_id") >= 100000).count()
    val recovered = Dedup.winnowPairs(docs, "doc_id", "text")
      .filter(col("b") === col("a") + 100000).count()
    assert(recovered >= planted * 9 / 10, s"recovered $recovered of $planted")
  }

  test("hot LSH buckets are capped: no quadratic blowup, cold pairs kept") {
    import spark.implicits._
    import graft.ops.BucketCap
    // 1000 docs sharing identical boilerplate (one degenerate bucket per
    // band) + one planted near-dup pair off in a cold region
    val boiler = "standard corporate boilerplate header legal notice " +
      "all rights reserved confidential do not distribute"
    val hot = (0L until 1000L).map(i => (i, boiler))
    val planted = Seq(
      (5000L, "unique quarterly revenue report for the northwest region office"),
      (5001L, "unique quarterly revenue report for the northwest region branch"))
    val docs = (hot ++ planted).toDF("doc_id", "text")
    val cap = 32
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
      minJaccard = 0.5, bucketCap = cap).collect()
    // without the cap the hot mass alone is C(1000,2) ≈ 500k pairs; capped,
    // each band keeps the same 32 lowest ids → ≤ C(32,2) hot pairs
    val hotPairs = pairs.count(r => r.getLong(0) < 1000)
    assert(hotPairs <= cap * (cap - 1) / 2, s"hot bucket produced $hotPairs pairs")
    assert(hotPairs > 0, "capped bucket should still yield some dup pairs")
    // the planted cold pair survives capping
    assert(pairs.exists(r => r.getLong(0) == 5000L && r.getLong(1) == 5001L),
      "planted cold near-dup pair lost")
    // simhash and winnowing are capped the same way
    // (simhash recall for planted pairs is covered by the mutants spec; a
    // one-word SUBSTITUTION can legitimately exceed the hamming budget)
    val simPairs = Dedup.simHashPairs(docs, "doc_id", "text", bucketCap = cap)
    assert(simPairs.filter(col("a") < 1000).count() <= cap.toLong * cap)
    val winPairs = Dedup.winnowPairs(docs, "doc_id", "text", bucketCap = cap)
    assert(winPairs.filter(col("a") < 1000).count() <= cap.toLong * cap)
    // dropped mass is observable for tuning
    val banded = docs.select(col("doc_id").as("id"),
      graft.functions.GraftFunctions.simhash64(col("text")).as("bkt"))
    val report = BucketCap.oversized(banded, Seq("bkt"), cap).collect()
    assert(report.length == 1 && report(0).getAs[Long]("dropped") == 1000L - cap)
  }

  test("exactTopPairs refuses an unbounded corpus (quadratic guard)") {
    import spark.implicits._
    val big = spark.range(20001)
      .select(col("id"), array(lit(1.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Similarity.exactTopPairs(big, "id", 10)
    }
    assert(e.getMessage.contains("quadratic"))
    // a bounded corpus still works
    val small = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("id", "embedding")
    val top = graft.ops.Similarity.exactTopPairs(small, "id", 1).collect()
    assert(top.length == 1 && top(0).getLong(0) == 0L && top(0).getLong(1) == 1L)
  }

  test("kernel word_shingles equals the HOF pipeline on the real corpus") {
    import graft.functions.GraftFunctions.tokens
    val docs = Tables(spark, sfDir, "documents")
    // the HOF twin the kernel replaced (order-insensitive set equality;
    // both construct distinct space-joined n-grams of the embed tokenizer)
    def hofShingles(n: Int) = {
      val toks = tokens(col("text"))
      array_distinct(filter(
        transform(toks, (_, i) =>
          when(i + n <= size(toks),
            concat_ws(" ", slice(toks, i + 1, lit(n))))),
        s => s.isNotNull))
    }
    for (n <- Seq(1, 2, 3, 5)) {
      val mismatch = docs.select(
        array_sort(Dedup.shingles(col("text"), n)).as("k"),
        array_sort(hofShingles(n)).as("h"))
        .filter(col("k") =!= col("h")).count()
      assert(mismatch == 0, s"kernel/HOF shingle mismatch at n=$n")
    }
    // degenerate inputs: fewer tokens than n, empty, punctuation-only
    import spark.implicits._
    val edge = Seq("one two", "", "?!.,", "single").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("s")).collect()
    assert(edge.forall(_.getSeq[String](0).isEmpty))
  }

  test("exact text dedup finds the exact duplicate copies") {
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"))
    val out = Dedup.exactText(docs.unionByName(copies), "doc_id", "text")
    val dupGroups = out.filter(col("n_dupes") === 2).count()
    assert(dupGroups == copies.count())
  }

  test("semanticPairs recovers planted embedding twins within cells") {
    import graft.ops.IvfIndex
    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val union = emb.unionByName(planted)
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 4)
    val assigned = IvfIndex.build(union, "vec_id", "embedding", centroids)
    val pairs = Dedup.semanticPairs(assigned, minCos = 0.95)
    // identical embeddings: same cell by determinism, cosine 1.0 → every
    // planted pair must surface (no cross-cell miss possible for twins)
    val twinPairs = pairs.filter(col("b") === col("a") + 100000)
    assert(twinPairs.count() == planted.count(),
      "every planted identical-embedding pair must be recovered")
    assert(twinPairs.agg(min(col("score"))).head().getDouble(0) == 1.0)
    // candidate volume (threshold -1 keeps every within-cell pair) is the
    // sum of per-cell squares, strictly below the all-pairs C(n,2) — the
    // SemDeDup cost bound that makes the method survive scale
    val n = union.count()
    val candidates = Dedup.semanticPairs(assigned, minCos = -1.0).count()
    assert(candidates < n * (n - 1) / 2 * 3 / 4,
      s"candidate volume $candidates suggests all-pairs over $n rows")
    assert(candidates >= pairs.count(), "threshold can only shrink output")
  }

  test("semanticPairs caps degenerate hot cells deterministically") {
    import spark.implicits._
    // 300 identical embeddings → one hot cell; cap keeps smallest ids
    val dim = 8
    val e = Array.fill(dim)(0.5f)
    val rows = (0L until 300L).map(i => (i, e.toSeq))
    val assigned = rows.toDF("id", "embedding")
      .withColumn("cell_id", lit(0))
    val cap = 16
    val pairs = Dedup.semanticPairs(assigned, minCos = 0.9, bucketCap = cap)
      .collect()
    assert(pairs.length == cap * (cap - 1) / 2,
      s"capped cell must yield C($cap,2) pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(0) < cap && r.getLong(1) < cap),
      "cap must keep the smallest ids")
  }

  private def comps(edges: Seq[(Long, Long)],
      driverFoldEdges: Int = 1 << 16): Map[Long, Long] = {
    import spark.implicits._
    Dedup.components(edges.toDF("a", "b"), "a", "b",
        driverFoldEdges = driverFoldEdges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side union-find oracle for the differential. */
  private def ufOracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  test("components: chains, stars, cycles, and disjoint pieces label by " +
      "component MIN; a long path converges inside the log-diameter " +
      "budget; randomized graphs match a union-find oracle — BOTH " +
      "threshold arms (driver union-find and distributed)") {
    // a 64-node path (diameter 63): pointer jumping must converge well
    // under the 20-round budget (plain propagation would need 63) —
    // driverFoldEdges = 0 forces the distributed arm, which the default
    // threshold would otherwise never take on a graph this small
    val path = (0L until 63L).map(i => (i, i + 1))
    val pc = comps(path, driverFoldEdges = 0)
    assert(pc.size == 64 && pc.values.forall(_ == 0L),
      s"path must collapse to component 0: $pc")
    assert(comps(path) == pc,
      "driver union-find arm diverged from the distributed arm on the path")
    // star with high-id hub + cycle + disjoint pair, one frame
    val mixed = Seq((100L, 7L), (100L, 9L), (100L, 8L), // star, min 7
      (20L, 21L), (21L, 22L), (22L, 20L),               // cycle, min 20
      (40L, 41L))                                       // pair
    val mc = comps(mixed)
    assert(Seq(100L, 7L, 8L, 9L).forall(mc(_) == 7L), s"star: $mc")
    assert(Seq(20L, 21L, 22L).forall(mc(_) == 20L), s"cycle: $mc")
    assert(mc(40L) == 40L && mc(41L) == 40L, s"pair: $mc")
    assert(mc.size == 9, "singletons must not be emitted")
    // self-loops ignored; duplicate/reversed edges harmless
    assert(comps(Seq((5L, 5L))).isEmpty)
    assert(comps(Seq((1L, 2L), (2L, 1L), (1L, 2L))) ==
      Map(1L -> 1L, 2L -> 1L))
    // randomized differential vs union-find, three seeds, both arms
    Seq(11L, 23L, 47L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(150)(
        (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter(e => e._1 != e._2)
      assert(comps(edges) == ufOracle(edges),
        s"seed $seed diverged from union-find (driver arm)")
      assert(comps(edges, driverFoldEdges = 0) == ufOracle(edges),
        s"seed $seed diverged from union-find (distributed arm)")
    }
  }

  private def compsInc(prior: Seq[(Long, Long)],
      delta: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.componentsIncremental(prior.toDF("id", "component"),
        delta.toDF("a", "b"), "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("componentsIncremental: a delta batch folds into a prior " +
      "labeling — cross-component merges, a NEW global-min id " +
      "relabeling a whole merged group, untouched components verbatim, " +
      "and the corpus-scale relabel is a broadcast join") {
    import spark.implicits._
    // prior: {0,1,2} -> 0, {10,11,12} -> 10, {40,41} -> 40
    val base = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 12L), (40L, 41L))
    val prior = ufOracle(base).toSeq
    // one new edge merges two old components transitively
    val m1 = compsInc(prior, Seq((2L, 10L)))
    assert(Seq(0L, 1L, 2L, 10L, 11L, 12L).forall(m1(_) == 0L),
      s"merged group must relabel to the global min: $m1")
    assert(m1(40L) == 40L && m1(41L) == 40L,
      s"untouched component must pass through verbatim: $m1")
    assert(m1.size == 8)
    // a NEW id SMALLER than every old min bridges two components: the
    // whole merged group — old members included — takes the new min
    val m2 = compsInc(Seq((5L, 5L), (6L, 5L), (8L, 8L), (9L, 8L)),
      Seq((3L, 5L), (3L, 8L)))
    assert(Seq(3L, 5L, 6L, 8L, 9L).forall(m2(_) == 3L),
      s"new-node bridge must relabel both components to 3: $m2")
    // delta edges INSIDE one component collapse to self-loops: no-op
    val m3 = compsInc(prior, Seq((0L, 2L), (11L, 12L)))
    assert(m3 == prior.toMap, s"intra-component delta must be a no-op: $m3")
    // an empty delta returns the prior labeling unchanged
    assert(compsInc(prior, Seq.empty) == prior.toMap)
    // two previously-UNLABELED ids joined by a delta edge get labels
    val m4 = compsInc(prior, Seq((90L, 91L)))
    assert(m4(90L) == 90L && m4(91L) == 90L && m4.size == 10)
    // plan pin: the prior-side relabel must be a map-side BROADCAST
    // join, never a corpus shuffle
    val planned = Dedup.componentsIncremental(
      prior.toDF("id", "component"), Seq((2L, 10L)).toDF("a", "b"),
      "a", "b")
    assert(planned.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
      "prior relabel must broadcast the delta-scale map")
  }

  test("componentsIncremental: randomized differential vs a full " +
      "recompute over base ∪ delta, and CHAINED folds stay exact " +
      "(the output is a valid prior for the next batch)") {
    // regression coverage for the round-boundary stats explosion: before
    // roundCheckpoint reset inherited LogicalRDD statistics, this exact
    // chained fold drove Catalyst's sizeInBytes product past 2M bits and
    // hung the driver in BigInteger multiplication — if this test slows
    // from seconds to minutes, that truncation broke (the distributed
    // arm below, forced via driverFoldEdges = 0, keeps the iterative
    // operator on the canary path now that small folds default to the
    // driver union-find)
    import spark.implicits._
    var sawMerge = false
    Seq(11L, 23L, 47L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(120)(
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(e => e._1 != e._2)
      val (base, rest) = edges.splitAt(edges.length / 2)
      val (d1, d2) = rest.splitAt(rest.length / 2)
      val full = ufOracle(edges)
      val prior = Dedup.components(base.toDF("a", "b"), "a", "b")
      // non-vacuity: the deltas must merge prior components somewhere
      val priorMap = prior.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      sawMerge ||= rest.exists { case (a, b) =>
        priorMap.contains(a) && priorMap.contains(b) &&
          priorMap(a) != priorMap(b)
      }
      // one fold — BOTH labeling arms of the collapsed graph: the
      // driver union-find (default threshold covers these sizes) and
      // the distributed operator (threshold 0 forces it)
      val once = Dedup.componentsIncremental(prior,
          rest.toDF("a", "b"), "a", "b").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(once == full, s"seed $seed single fold diverged (driver arm)")
      val onceDist = Dedup.componentsIncremental(prior,
          rest.toDF("a", "b"), "a", "b", driverFoldEdges = 0).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(onceDist == full,
        s"seed $seed single fold diverged (distributed arm)")
      // two chained folds — the first fold's OUTPUT is the next prior
      val step1 = Dedup.componentsIncremental(prior,
        d1.toDF("a", "b"), "a", "b")
      val twice = Dedup.componentsIncremental(step1,
          d2.toDF("a", "b"), "a", "b").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(twice == full, s"seed $seed chained fold diverged")
    }
    assert(sawMerge, "differential never exercised a cross-component " +
      "merge — fixture too sparse to mean anything")
  }

  test("nearDupClusters groups TRANSITIVE duplicates — one component " +
      "per group, the keep-one anti-join is strictly stronger than the " +
      "pairwise removeNearDups rule") {
    import spark.implicits._
    // three mutual near-dups + a distinct pair + unrelated docs, with
    // unique filler so the distinct docs never collide
    val grp = "the quick brown fox jumps over the lazy dog again and again"
    def mut(tag: String) = s"$grp $tag"
    val docs = Seq(
      (0L, mut("alpha")), (1L, mut("beta")), (2L, mut("gamma")),
      (10L, "completely different subject matter concerning the price " +
        "of tea and shipping routes variant one"),
      (11L, "completely different subject matter concerning the price " +
        "of tea and shipping routes variant two"),
      (20L, "a third standalone document about winter gardening " +
        "practices in cold climates with frost covers")
    ).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text",
        minJaccard = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L).forall(clusters.get(_).contains(0L)),
      s"mutant group must share component 0: $clusters")
    assert(clusters.get(10L) == clusters.get(11L) &&
      clusters.get(10L).forall(_ == 10L), s"pair group: $clusters")
    assert(!clusters.contains(20L), "singletons are not emitted")
    // keep-one-per-group: anti-join on id != component
    val keep = docs.join(
      Dedup.nearDupClusters(docs, "doc_id", "text", minJaccard = 0.5)
        .filter(col("id") =!= col("component"))
        .select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    assert(keep == Set(0L, 10L, 20L), s"kept $keep")
  }
}
