package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.memo.MemoEngine

/** Incremental materialized views ([[MemoEngine.viewState]]): a persisted
  * group-by aggregate maintained O(delta) from the store's changefeed.
  * Every test pins BOTH correctness (incremental state equals a direct
  * group-by over the live records) and the cost class (which files the
  * refresh actually scanned — delta segments for appends, the
  * materialized feed for patch commits, never the base snapshot).
  */
class MemoViewSpec extends SparkTestBase {

  private val Chars = Seq("chars" -> "length(body)")

  private def freshEngine(): (MemoEngine, String) = {
    val dir = Files.createTempDirectory("memo_view").toString
    (new MemoEngine(spark, s"$dir/db"), s"$dir/db")
  }

  /** The oracle: the same aggregate computed directly over live records. */
  private def direct(engine: MemoEngine, groupKey: String): Set[(String, Long, Long)] =
    engine.records
      .groupBy(expr(groupKey).cast("string").as("group_key"))
      .agg(count(lit(1)).as("doc_count"),
        sum(coalesce(expr("length(body)").cast("long"), lit(0L))).as("chars"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def collected(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def mode(engine: MemoEngine): String =
    engine.lastViewRefresh.map(_._1).getOrElse("none")

  private def scanned(engine: MemoEngine): Seq[String] =
    engine.lastViewRefresh.map(_._2).getOrElse(Nil)

  private def yamlDoc(body: String, cat: Option[String]): String =
    cat match {
      case Some(c) => s"---\nbody: $body\nmetadata: {category: $c}\n"
      case None => s"---\nbody: $body\n"
    }

  test("view equals a direct group-by; a fresh view serves without work") {
    val (engine, _) = freshEngine()
    engine.save(Seq(
      yamlDoc("peanut allergy note", Some("health")),
      yamlDoc("dark mode preferred", Some("ui")),
      yamlDoc("no category on this one", None),
      yamlDoc("second health note here", Some("health"))).mkString)
    val key = "metadata['category']"
    val v1 = engine.viewState("bycat", key, Chars)
    assert(mode(engine) == "rebuild") // first materialization pays the scan
    assert(collected(v1) == direct(engine, key))
    // the null group (docs without the key) is one merged row, not a row
    // per refresh
    assert(v1.filter(col("group_key").isNull).count() == 1)
    val v2 = engine.viewState("bycat", key, Chars)
    assert(mode(engine) == "fresh", "watermark-current view must serve lock-free")
    assert(collected(v2) == direct(engine, key))
    engine.clean()
  }

  test("append refresh is O(delta): scans ONLY the new segments") {
    val (engine, _) = freshEngine()
    val key = "metadata['category']"
    engine.save(yamlDoc("first note body", Some("a")) +
      yamlDoc("uncategorized one", None))
    engine.viewState("bycat", key, Chars)
    engine.save(yamlDoc("second commit note", Some("a")) +
      yamlDoc("third with new group", Some("b")) +
      yamlDoc("another uncategorized", None))
    val v = engine.viewState("bycat", key, Chars)
    assert(mode(engine) == "incremental")
    assert(scanned(engine).nonEmpty &&
      scanned(engine).forall(_.contains("/v1/")),
      s"append refresh must read only v1's delta: ${scanned(engine)}")
    assert(collected(v) == direct(engine, key))
    // two appends behind: a multi-step walk stays incremental
    engine.save(yamlDoc("fourth note here", Some("b")))
    engine.save(yamlDoc("fifth and last", Some("c")))
    val v2 = engine.viewState("bycat", key, Chars)
    assert(mode(engine) == "incremental")
    assert(scanned(engine).forall(f => f.contains("/v2/") || f.contains("/v3/")),
      s"two-step refresh must read only v2+v3 deltas: ${scanned(engine)}")
    assert(collected(v2) == direct(engine, key))
    assert(v2.filter(col("group_key").isNull).count() == 1)
    engine.clean()
  }

  test("patch refresh retracts from the materialized feed, not the corpus") {
    val (engine, base) = freshEngine()
    val key = "metadata['category']"
    // three segments so the update lands as a segment-pruned PATCH commit
    engine.save((0 until 4).map(i => yamlDoc(s"note number $i words", Some("a"))).mkString)
    engine.save((4 until 8).map(i => yamlDoc(s"note number $i words", Some("b"))).mkString)
    engine.save((8 until 12).map(i => yamlDoc(s"note number $i words", Some("c"))).mkString)
    engine.viewState("bycat", key, Chars)
    // one update that MOVES a row between groups (b -> moved) and one remove
    import spark.implicits._
    // metadata arrives pre-encoded on the CDC path (the store's typed
    // encoding: strings carry the 's' prefix, YamlIO.coerce)
    val feed = Seq(
      (5L, "updated", "rewritten body text", Map("category" -> "smoved")),
      (9L, "removed", "", Map.empty[String, String]))
      .toDF("id", "change", "body", "metadata")
      .withColumn("commit_version", lit(0L))
    engine.applyChanges(feed)
    // pin the premise: the merge really was segment-pruned (manifest keeps
    // untouched segments by reference), so the feed sidecar exists
    val mf = Files.readAllLines(java.nio.file.Paths.get(base)
      .resolve(s"v${engine.versions.max}").resolve("records.manifest"))
    assert(mf.size() < 4, s"expected a pruned manifest, got $mf")
    val feedDir = java.nio.file.Paths.get(base)
      .resolve(s"v${engine.versions.max}").resolve("changefeed")
    assert(Files.exists(feedDir.resolve("_prev")), "patch feed must carry prev")
    // the persisted feed carries the FROM side for updated rows
    val prev = spark.read.schema(MemoEngine.FeedWithPrevSchema)
      .parquet(feedDir.toString)
      .filter(col("change") === "updated").collect()
    assert(prev.length == 1 && prev(0).getString(4) == "note number 5 words")
    val v = engine.viewState("bycat", key, Chars)
    assert(mode(engine) == "incremental")
    assert(scanned(engine).nonEmpty &&
      scanned(engine).forall(_.contains("/changefeed/")),
      s"patch refresh must read only the feed: ${scanned(engine)}")
    assert(collected(v) == direct(engine, key))
    // the retraction really moved the group: b lost a row, moved gained
    // one, c lost the removed row (group values carry the store's typed
    // string encoding, hence the 's' prefix)
    assert(v.filter(col("group_key") === "smoved").count() == 1)
    assert(collected(v).find(_._1 == "sb").map(_._2).contains(3L))
    assert(collected(v).find(_._1 == "sc").map(_._2).contains(3L))
    engine.clean()
  }

  test("rewrite commits (reindex, restore) fall back to a full recompute") {
    val (engine, _) = freshEngine()
    val key = "metadata['category']"
    engine.save(yamlDoc("first note", Some("a")) + yamlDoc("second note", Some("b")))
    engine.save(yamlDoc("third note", Some("a")))
    engine.viewState("bycat", key, Chars)
    engine.save("---\nid: 1\nbody: gone\nmetadata: {deleted: true}\n")
    engine.reindex() // re-sequences ids, compacts the chain
    val v = engine.viewState("bycat", key, Chars)
    assert(mode(engine) == "rebuild",
      "a reindex rewrite cannot be proven incremental and must recompute")
    assert(collected(v) == direct(engine, key))
    val restored = engine.restore(engine.versions.head)
    assert(restored > 0)
    val v2 = engine.viewState("bycat", key, Chars)
    assert(mode(engine) == "rebuild")
    assert(collected(v2) == direct(engine, key))
    engine.clean()
  }

  test("changing the spec under the same name rebuilds, same spec reuses") {
    val (engine, _) = freshEngine()
    engine.save(yamlDoc("alpha note", Some("x")) + yamlDoc("beta note", Some("y")))
    engine.viewState("v", "metadata['category']", Chars)
    assert(mode(engine) == "rebuild")
    // same name, different group key: detected, recomputed under new spec
    val byLen = engine.viewState("v", "CAST(length(body) % 2 AS STRING)", Chars)
    assert(mode(engine) == "rebuild")
    assert(collected(byLen) == direct(engine, "CAST(length(body) % 2 AS STRING)"))
    // and back: the spec is recorded verbatim, so this rebuilds again
    engine.viewState("v", "metadata['category']", Chars)
    assert(mode(engine) == "rebuild")
    engine.clean()
  }

  test("a commit racing the refresh lands AFTER the captured watermark") {
    val (engine, _) = freshEngine()
    val key = "metadata['category']"
    engine.save(yamlDoc("first note", Some("a")))
    engine.viewState("bycat", key, Chars)
    engine.save(yamlDoc("second note", Some("b")))
    // interleave a foreign commit inside the locked refresh window: the
    // refresh must aggregate the version it CAPTURED, never the live view
    engine.beforeViewBuildHook =
      () => { engine.save(yamlDoc("racing note", Some("c"))); () }
    try {
      val v = engine.viewState("bycat", key, Chars)
      assert(collected(v).map(_._1) == Set("sa", "sb"),
        "refresh must not see the commit that raced it")
    } finally engine.beforeViewBuildHook = () => ()
    // the next call catches up incrementally with the raced commit
    val v2 = engine.viewState("bycat", key, Chars)
    assert(mode(engine) == "incremental")
    assert(collected(v2) == direct(engine, key))
    assert(collected(v2).map(_._1) == Set("sa", "sb", "sc"))
    engine.clean()
  }

  test("measures referencing metadata sum with nulls counted as zero") {
    val (engine, _) = freshEngine()
    engine.save(
      "---\nbody: priced note\nmetadata: {category: x, weight: 3}\n" +
      "---\nbody: unpriced note\nmetadata: {category: x}\n")
    // the measure yields '' / null on weightless rows — the engine's
    // try_cast coercion turns both into 0 instead of an ANSI cast error
    val measures = Seq("weight_sum" ->
      "regexp_extract(metadata['weight'], '^i?(-?\\\\d+)$', 1)")
    val v = engine.viewState("wv", "metadata['category']", measures)
    val row = v.collect()(0)
    assert(row.getString(0) == "sx" && row.getLong(1) == 2 && row.getLong(2) == 3,
      s"null measure must count as 0: $row")
    // incremental path agrees on the null-as-zero rule
    engine.save("---\nbody: another unpriced\nmetadata: {category: x}\n")
    val v2 = engine.viewState("wv", "metadata['category']", measures)
    assert(mode(engine) == "incremental")
    val row2 = v2.collect()(0)
    assert(row2.getLong(1) == 3 && row2.getLong(2) == 3)
    engine.clean()
  }
}
