package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{ArtifactMeta, Curation, Dedup, IvfIndex}
import graft.queries.ScaleQueries

/** Content-fingerprint freshness across the stamped artifact families
  * covered here (IVF index, MinHash signatures, train-gram snapshot,
  * bucketed tables, month-partitioned fact copy — the PQ and IVF-PQ
  * families are pinned in PqIndexSpec): data regenerated IN PLACE with an
  * IDENTICAL row count must invalidate the artifact — the hole a
  * count-only stamp leaves open — while an unchanged source must keep
  * reusing it (no rewrite).
  *
  * "Rebuilt" is asserted from the artifact's data files: Spark writes fresh
  * randomized part-file names on every overwrite, so an unchanged file-name
  * set proves reuse and a changed set proves a rewrite. */
class ArtifactStampSpec extends SparkTestBase {

  private def dataFiles(path: String): Set[String] = {
    val root = java.nio.file.Paths.get(path)
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(root)
    try s.iterator().asScala.map(_.toString)
      .filter(_.endsWith(".parquet")).toSet
    finally s.close()
  }

  /** 50 documents; `mutate` rewrites the text in place (same ids, same
    * count, different bytes — the regeneration scenario). */
  private def docs: DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(50)
  private def mutated(df: DataFrame): DataFrame =
    df.withColumn("text", concat(col("text"), lit(" regenerated")))

  test("fingerprint is order-independent and additive") {
    val a = Tables(spark, sfDir, "documents").filter(col("doc_id") < 100)
    val b = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") >= 100 && col("doc_id") < 150)
    val cols = Seq("doc_id", "text")
    val (na, fa) = ArtifactMeta.fingerprint(a, cols)
    val (nb, fb) = ArtifactMeta.fingerprint(b, cols)
    val (nu, fu) = ArtifactMeta.fingerprint(a.unionAll(b), cols)
    assert((na + nb, fa + fb) == ((nu, fu)), "fingerprint must be additive")
    val (nr, fr) = ArtifactMeta.fingerprint(a.repartition(7), cols)
    assert((na, fa) == ((nr, fr)), "fingerprint must ignore row order")
    val (nm, fm) = ArtifactMeta.fingerprint(mutated(a), cols)
    assert(nm == na && fm != fa, "content change must move the fingerprint")
  }

  test("minhash signatures: same-count content change rebuilds the artifact") {
    val path = java.nio.file.Files.createTempDirectory("sig_fp")
      .resolve("sigs").toString
    Dedup.signaturesIfAbsent(docs, "doc_id", "text", path, 16, 3)
    val first = dataFiles(path)
    Dedup.signaturesIfAbsent(docs, "doc_id", "text", path, 16, 3)
    assert(dataFiles(path) == first, "unchanged corpus must reuse the artifact")
    val sigs = Dedup.signaturesIfAbsent(mutated(docs), "doc_id", "text",
      path, 16, 3)
    assert(dataFiles(path) != first,
      "same-count content change must rebuild the signature artifact")
    // and the rebuilt artifact carries the NEW corpus's signatures
    val expected = Dedup.computeSignatures(mutated(docs), "doc_id", "text",
      16, 3).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sigs.collect().foreach(r =>
      assert(r.getSeq[Long](1) == expected(r.getLong(0))))
  }

  test("train grams: same-count content change rebuilds the snapshot") {
    val path = java.nio.file.Files.createTempDirectory("grams_fp")
      .resolve("grams").toString
    Curation.trainGramsIfAbsent(docs, "doc_id", "text", path, n = 3)
    val first = dataFiles(path)
    Curation.trainGramsIfAbsent(docs, "doc_id", "text", path, n = 3)
    assert(dataFiles(path) == first, "unchanged train set must reuse the snapshot")
    Curation.trainGramsIfAbsent(mutated(docs), "doc_id", "text", path, n = 3)
    assert(dataFiles(path) != first,
      "same-count content change must rebuild the gram snapshot")
  }

  test("ivf index: same-count content change rebuilds the index") {
    val emb = Tables(spark, sfDir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("ivf_fp")
      .resolve("idx").toString
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    val first = dataFiles(path)
    IvfIndex.buildIfAbsent(emb, "vec_id", "embedding", 8, path)
    assert(dataFiles(path) == first, "unchanged corpus must reuse the index")
    val scaled = emb.withColumn("embedding",
      transform(col("embedding"), x => x + lit(0.25f)))
    IvfIndex.buildIfAbsent(scaled, "vec_id", "embedding", 8, path)
    assert(dataFiles(path) != first,
      "same-count content change must rebuild the IVF index")
  }

  test("month-partitioned fact copy: same-count content change rebuilds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpp_stamp").toString
    def writeSrc(price: Double): Unit =
      Seq((1L, price, "1996-01-05"), (2L, price + 1, "1996-02-07"))
        .toDF("l_orderkey", "l_extendedprice", "ship")
        .select(col("l_orderkey"), col("l_extendedprice"),
          to_date(col("ship")).as("l_shipdate"))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    writeSrc(10.0)
    val path = graft.queries.ScaleQueries.dppLineitemIfAbsent(spark, dir)
    val files1 = dataFiles(path)
    assert(files1.nonEmpty)
    // unchanged source → reuse
    graft.queries.ScaleQueries.dppLineitemIfAbsent(spark, dir)
    assert(dataFiles(path) == files1, "fresh partitioned copy was rewritten")
    // same row count, different content → fingerprint mismatch → rebuild
    writeSrc(99.0)
    graft.queries.ScaleQueries.dppLineitemIfAbsent(spark, dir)
    assert(dataFiles(path) != files1,
      "content change with identical row count did not rebuild")
  }

  test("bucketed table: same-count content change rewrites the layout") {
    // a throwaway "dir" tag isolates this lifecycle from q38's real tables
    val tag = java.nio.file.Files.createTempDirectory("bkt_fp").toString
    val src = Tables(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).limit(40)
    def make(df: DataFrame): String =
      ScaleQueries.bucketedTable(spark, tag, "t", "c_custkey", 4)(df)
    val tbl = make(src)
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"${tbl}_data").toString
    val first = dataFiles(path)
    spark.sql(s"DROP TABLE $tbl")
    make(src)
    assert(dataFiles(path) == first,
      "unchanged source must re-register, not rewrite")
    spark.sql(s"DROP TABLE $tbl")
    make(src.withColumn("c_mktsegment", lit("REGEN")))
    assert(dataFiles(path) != first,
      "same-count content change must rewrite the bucketed layout")
  }

  test("build lock: mutual exclusion per path, re-entrant, parallel paths") {
    val path = java.nio.file.Files.createTempDirectory("bl").toString + "/a"
    val other = path + "_other"
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val d = docs
      val racers = (0 until 4).map { _ =>
        Future {
          ArtifactMeta.withBuildLock(d, path) {
            val now = inside.incrementAndGet()
            maxSeen.getAndUpdate(m => math.max(m, now))
            // nested acquisition of the SAME path must not deadlock or
            // throw OverlappingFileLockException (the IfAbsent → write
            // primitive shape)
            ArtifactMeta.withBuildLock(d, path) { Thread.sleep(30) }
            inside.decrementAndGet()
          }
        }
      }
      Await.result(Future.sequence(racers), 60.seconds)
      assert(maxSeen.get() == 1,
        s"build lock admitted ${maxSeen.get()} writers to one artifact path")
      // a DIFFERENT path must be lockable WHILE `path` is held: the
      // holder blocks inside the lock until `release` counts down, which
      // only happens after the independent acquisition completes — a
      // regression to one global lock deadlocks here and times out
      val holding = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val holder = Future {
        ArtifactMeta.withBuildLock(d, path) {
          holding.countDown()
          release.await(30, java.util.concurrent.TimeUnit.SECONDS)
        }
      }
      holding.await(30, java.util.concurrent.TimeUnit.SECONDS)
      val independent = Future {
        ArtifactMeta.withBuildLock(d, other) { true }
      }
      assert(Await.result(independent, 15.seconds),
        "independent artifact path blocked behind an unrelated build lock")
      release.countDown()
      Await.result(holder, 30.seconds)
    } finally pool.shutdown()
  }

  test("racing signaturesIfAbsent builders yield one valid artifact") {
    val path = java.nio.file.Files.createTempDirectory("sig_race").toString + "/sigs"
    val d = docs.cache()
    val n = d.count()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val both = Seq.fill(2)(Future {
        Dedup.signaturesIfAbsent(d, "doc_id", "text", path).count()
      })
      assert(Await.result(Future.sequence(both), 120.seconds).toSet == Set(n),
        "racing builders must both serve the full signature table")
      // the loser validated the winner's stamp instead of re-appending:
      // exactly one row per doc survives the race
      assert(Dedup.loadSignatures(spark, path)
        .groupBy("id").count().filter(col("count") > 1).isEmpty,
        "race duplicated signature rows")
      d.unpersist()
    } finally pool.shutdown()
  }

  test("racing lexical writeIfAbsent builders yield one valid artifact") {
    import graft.ops.Lexical
    val path = java.nio.file.Files.createTempDirectory("lex_race").toString + "/idx"
    val d = docs.cache()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val terms = Seq("batch", "scan", "vector")
      val both = Seq.fill(2)(Future {
        Lexical.writeIfAbsent(d, "doc_id", "text", path)
        Lexical.searchBm25(spark, path, terms, 25).collect().toSeq
      })
      val results = Await.result(Future.sequence(both), 120.seconds)
      assert(results(0) == results(1),
        "racing builders must serve identical rankings")
      // the loser reused the winner's artifact: postings hold exactly one
      // row per (term, doc) — a double build under append would duplicate
      val posts = spark.read.parquet(s"$path/postings")
      assert(posts.groupBy("term", "doc_id").count()
        .filter(col("count") > 1).isEmpty,
        "race duplicated postings rows")
      d.unpersist()
    } finally pool.shutdown()
  }
}
