package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.memo.MemoOps
import graft.functions.GraftFunctions._

/** Memo-engine operator invariants: recall edges (score floor, k clamp,
  * blank skip), dense-id mutations, overwrite validation (memo_cli.py:288-298,
  * 424-443, 334-366). */
class MemoOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def records: DataFrame =
    Seq(
      (0L, "alpha beta gamma", Map("lang" -> "sen")),
      (1L, "alpha beta delta", Map("lang" -> "sen")),
      (2L, "unrelated words entirely", Map("lang" -> "sde")),
      (3L, "   ", Map("lang" -> "sen")),          // blank body — skipped
      (4L, "alpha beta gamma", Map.empty[String, String]) // no metadata
    ).toDF("id", "body", "metadata")
      .withColumn("embedding", embedText(col("body")))

  test("recall ranks by cosine, skips blanks, applies top-k") {
    val qv = records.filter($"id" === 0).select($"embedding".as("qv"))
    val scored = records.crossJoin(broadcast(qv))
    val out = MemoOps.recall(scored, col("qv"), k = 3).collect()
    assert(out.length == 3)
    assert(out.head.getLong(0) == 0 || out.head.getLong(0) == 4) // exact match ranks first
    assert(out.head.getDouble(1) == 1.0)
    assert(!out.map(_.getLong(0)).contains(3L)) // blank body excluded
  }

  test("recall filter applies before limit (V4 ordering)") {
    val qv = records.filter($"id" === 0).select($"embedding".as("qv"))
    val scored = records.crossJoin(broadcast(qv))
    val out = MemoOps.recall(scored, col("qv"), k = 2,
      filterExpr = Some("{lang: en}")).collect()
    // id 4 (no metadata) and id 2 (de) excluded; survivors ranked then cut
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
  }

  test("k is clamped to [1, 100]") {
    assert(MemoOps.clampK(0) == 1)
    assert(MemoOps.clampK(-5) == 1)
    assert(MemoOps.clampK(1000) == 100)
    assert(MemoOps.clampK(7) == 7)
  }

  test("reindex drops deleted/blank and re-sequences ids densely") {
    val recs = Seq(
      (0L, "keep a", Map("x" -> "i1")),
      (1L, "drop me", Map("deleted" -> "bTrue")),
      (2L, "keep b", Map("x" -> "i1")),
      (3L, " ", Map("x" -> "i1")) // blank → dropped
    ).toDF("id", "body", "metadata")
    val out = MemoOps.reindex(recs).select("id", "old_id").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 0L), (1L, 2L)))
  }

  test("isDeleted follows Python truthiness over metadata AND body YAML") {
    import graft.memo.MetaCodec
    // (typed metadata `deleted` value, body, expected deleted)
    val cases = Seq(
      (Some("bTrue"), "x", true),
      (Some("bFalse"), "x", false),
      (Some("i1"), "x", true),
      (Some("i0"), "x", false),
      (Some("f0.5"), "x", true),
      (Some("f0.0"), "x", false),
      (Some("sfalse"), "x", true), // non-empty string — Python-truthy!
      (Some("syes"), "x", true),
      (Some("s"), "x", false), // empty string — falsy
      (Some("z"), "x", false), // explicit null — falsy
      (Some("l[]"), "x", false),
      (Some("l[\"si\"]"), "x", true),
      (None, "x", false),
      // body-YAML variant (memo_cli.py:148-154)
      (None, "deleted: true", true),
      (None, "deleted: 1", true),
      (None, "deleted: \"false\"", true), // quoted string — truthy
      (None, "deleted: false", false),
      (None, "deleted: null", false),
      (None, "note: deleted", false), // no deleted key
      (None, "- deleted", false), // not a mapping
      (None, ": : :", false) // unparseable YAML — never deleted
    )
    // sanity: the encoder produces the sigils the table assumes
    assert(MetaCodec.encode(java.lang.Boolean.TRUE) == "bTrue")
    assert(MetaCodec.encode("false") == "sfalse")
    val df = cases.zipWithIndex.map { case ((meta, body, _), i) =>
      (i.toLong, body, meta.map(v => Map("deleted" -> v)).getOrElse(Map.empty))
    }.toDF("id", "body", "metadata")
    val got = df.select(col("id"),
        MemoOps.isDeleted(col("metadata"), col("body")).as("del"))
      .as[(Long, Boolean)].collect().toMap
    cases.zipWithIndex.foreach { case ((meta, body, want), i) =>
      assert(got(i.toLong) == want, s"case $i: meta=$meta body=$body")
    }
  }

  test("appendIds continues from max(existing)+1 in order") {
    val existing = Seq((5L, "a"), (9L, "b")).toDF("id", "body")
    val batch = Seq((100L, "x"), (50L, "y")).toDF("id", "body")
    val out = MemoOps.appendIds(existing, batch, "id")
      .select("new_id", "id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((10L, 50L), (11L, 100L)))
  }

  test("overwrite validates every id exists, else aborts the whole batch") {
    val existing = Seq((0L, "a"), (1L, "b")).toDF("id", "body")
    val good = Seq((1L, "b2")).toDF("id", "body")
    val merged = MemoOps.overwrite(existing, good)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(merged.toSeq == Seq((0L, "a"), (1L, "b2")))
    val bad = Seq((1L, "ok"), (7L, "nope")).toDF("id", "body")
    intercept[IllegalArgumentException](MemoOps.overwrite(existing, bad))
  }

  test("statsTopK rolls up beyond-top-N values into 'other'") {
    val recs = (0 until 20).map { i =>
      val v = if (i < 8) "a" else if (i < 13) "b" else if (i < 16) "c"
              else if (i < 18) "d" else if (i < 19) "e" else "f"
      (i.toLong, s"body$i", Map("k" -> ("s" + v)))
    }.toDF("id", "body", "metadata")
    val out = MemoOps.statsTopK(recs, "{}", "k").as[(String, Long)].collect()
    assert(out.take(4).toSeq == Seq(("a", 8L), ("b", 5L), ("c", 3L), ("d", 2L)))
    assert(out.last == ("other", 2L)) // e + f
  }

  test("statsDates yields ISO min/max when all values parse") {
    val recs = Seq(
      (0L, "a", Map("ts" -> "s2026-01-05")),
      (1L, "b", Map("ts" -> "s2026-03-01"))
    ).toDF("id", "body", "metadata")
    val out = MemoOps.statsDates(recs, "{}", "ts").as[(String, String)].collect()
    assert(out.toSeq == Seq(("2026-01-05", "2026-03-01")))
  }
}
