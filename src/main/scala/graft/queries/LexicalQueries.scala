package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Lexical, Similarity}

/** Lexical (BM25) + hybrid retrieval coverage — the keyword-search side
  * of the serving surface, over the build-once postings artifact
  * ([[graft.ops.Lexical]]). The oracles replay the ENTIRE pipeline in
  * DuckDB: tokenization (the same regex contract as q50), postings,
  * document frequencies, the BM25 formula with identical operand order,
  * fixed-decimal idf, exact DECIMAL summation — and for q90 the
  * reciprocal-rank fusion on top — so the rankings, not just row counts,
  * are hash-verified.
  */
object LexicalQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Fixed query-term bag (mixed document frequencies in the synthetic
    * corpus, so tf/dl differences actually move the ranking). */
  private[graft] val QueryTerms =
    Seq("vector", "stream", "merge", "query", "spark")

  private def lexPath(dir: String): String =
    SessionHandles.tmpArtifactPath("q85_lex", dir)

  /** Build-once / validate-once-per-session postings artifact (the
    * [[ScaleQueries]] handle lifecycle: first use pays the stamp check or
    * build, later probes reuse the path). */
  private def lexIndex(s: SparkSession, dir: String): String =
    SessionHandles.cached(s, s"q85_lex:$dir") {
      val p = lexPath(dir)
      Lexical.writeIfAbsent(Tables(s, dir, "documents"), "doc_id", "text", p)
      p
    }

  /** BM25 top-20 for the fixed term bag, served off the artifact. */
  private val q85Bm25: Q = (s, dir) =>
    Lexical.searchBm25(s, lexIndex(s, dir), QueryTerms, k = 20)

  /** Hybrid retrieval: BM25 top-50 and exact-cosine top-50 fused by
    * reciprocal rank ([[Lexical.rrfFuse]]) — the two serving paths this
    * engine maintains (postings artifact + vector ranking) composed the
    * way a retrieval stack actually deploys them. Each side's rank window
    * runs over its own top-50 only (k-bounded, post-limit). */
  private val q90HybridRrf: Q = (s, dir) => {
    val w = Window.orderBy(desc("score"), col("id"))
    val bm = Lexical.searchBm25(s, lexIndex(s, dir), QueryTerms, k = 50)
      .select(col("doc_id").as("id"), col("score"))
      .withColumn("rank", row_number().over(w))
    val emb = Tables(s, dir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val vec = Similarity.bruteForceTopK(emb, "vec_id", qv, k = 50)
      .select(col("vec_id").as("id"), col("score"))
      .withColumn("rank", row_number().over(w))
    Lexical.rrfFuse(Seq("bm25" -> bm, "vec" -> vec), k = 15)
  }

  /** Second fixed term bag for the batch hybrid (disjoint mix of
    * common corpus words, so the two queries rank differently). */
  private[graft] val QueryTerms2 = Seq("table", "scan", "row", "batch")

  /** Hybrid retrieval, BATCHED (the r15 one-probe-per-leg shape): TWO
    * query term bags answered by ONE probe of the postings artifact
    * ([[Lexical.searchBm25Batch]] — the union term list prunes the scan,
    * contributions fan out per query), the exact-cosine leg by ONE pass
    * of the batch kNN ([[Similarity.bruteForceTopKBatch]]), per-(query,
    * list) dense ranks fused by [[Lexical.rrfFuseBatch]] with the
    * identical floor-8 DECIMAL arithmetic — so the oracle is q90's
    * replay parameterized by query_id, and the rankings (not row
    * counts) hash-verify per query. */
  private val q110HybridBatch: Q = (s, dir) => {
    import s.implicits._
    val wq = Window.partitionBy("query_id")
      .orderBy(desc("score"), col("id"))
    val qt = (QueryTerms.map(t => (0L, t)) ++ QueryTerms2.map(t => (1L, t)))
      .toDF("query_id", "term")
    val bm = Lexical.searchBm25Batch(s, lexIndex(s, dir), qt, k = 50)
      .select(col("query_id"), col("doc_id").as("id"), col("score"))
      .withColumn("rank", row_number().over(wq))
    val emb = Tables(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val vec = Similarity.bruteForceTopKBatch(emb, "vec_id", queries,
        "query_id", k = 50)
      .select(col("query_id"), col("vec_id").as("id"), col("score"))
      .withColumn("rank", row_number().over(wq))
    Lexical.rrfFuseBatch(Seq("bm25" -> bm, "vec" -> vec), k = 15)
      .orderBy(col("query_id"), desc("rrf_score"), col("id"))
  }

  /** BM25 serving AFTER an O(batch) delete — the artifact lifecycle's
    * retraction path (tombstones + retreated stamp + negative df deltas,
    * [[Lexical.delete]]) exercised end-to-end against a DuckDB replay
    * over the surviving corpus: the tombstone anti-join, the adjusted
    * stats, and the stamp all have to agree with a from-scratch index of
    * corpus ∖ batch for the hash to match. Fresh build + delete once per
    * session (the artifact handle lifecycle); probes serve off the
    * tombstoned artifact. */
  private def lexDelIndex(s: SparkSession, dir: String): String =
    SessionHandles.cached(s, s"q93_lexdel:$dir") {
      val p = SessionHandles.tmpArtifactPath("q93_lexdel", dir)
      val docs = Tables(s, dir, "documents")
      Lexical.writeIndex(docs, "doc_id", "text", p)
      Lexical.delete(docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", p)
      p
    }

  private val q93Bm25Delete: Q = (s, dir) =>
    Lexical.searchBm25(s, lexDelIndex(s, dir), QueryTerms, k = 20)

  val defs: Map[String, Q] = Map(
    "q85_bm25" -> q85Bm25,
    "q90_hybrid_rrf" -> q90HybridRrf,
    "q93_bm25_delete" -> q93Bm25Delete,
    "q110_hybrid_batch" -> q110HybridBatch)

  private def termList: String =
    QueryTerms.map(t => s"'$t'").mkString("(", ",", ")")

  /** The BM25 replay CTE chain (shared by q85 and q90's lexical leg).
    * Operand order mirrors Lexical.searchBm25 EXACTLY (left-assoc sums,
    * pre-evaluated 0.25/2.2 literals, idf floored to 4 decimals before
    * use, per-term contribution floored to 6 and summed as DECIMAL) —
    * double arithmetic is then bit-identical in both engines, and the
    * decimal sum is order-independent by construction. */
  private def bm25Ctes: String = bm25CtesOver("documents")

  /** [[bm25Ctes]] over an arbitrary source relation (q93 replays the
    * post-delete corpus by filtering the deleted slice out here — the
    * oracle for "a deleted artifact serves exactly a fresh index of the
    * survivors"). */
  private def bm25CtesOver(src: String): String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(
       |    regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
       |    x -> x <> '') AS ts
       |  FROM $src),
       |meta AS (SELECT count(*) AS n, sum(len(ts)) AS sumdl FROM toks),
       |post AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks),
       |tf AS (SELECT term, doc_id, dl, count(*) AS tf FROM post
       |       WHERE term IN $termList GROUP BY 1, 2, 3),
       |dfx AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
       |        FROM post WHERE term IN $termList GROUP BY 1),
       |bsc AS (SELECT t.doc_id,
       |  CAST(floor(
       |    (floor(ln(1.0 + (CAST(m.n AS DOUBLE) - d.df + 0.5) /
       |       (d.df + 0.5)) * 10000.0 + 0.5) / 10000.0) *
       |    ((CAST(t.tf AS DOUBLE) * 2.2) /
       |     (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
       |       (CAST(t.dl AS DOUBLE) /
       |        (CAST(m.sumdl AS DOUBLE) / CAST(m.n AS DOUBLE))))))
       |    * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS s
       |  FROM tf t JOIN dfx d USING (term) CROSS JOIN meta m)""".stripMargin

  private def qtermsValues: String =
    (QueryTerms.map(t => s"(0, '$t')") ++
      QueryTerms2.map(t => s"(1, '$t')")).mkString(", ")

  private def unionTermList: String =
    (QueryTerms ++ QueryTerms2).distinct
      .map(t => s"'$t'").mkString("(", ",", ")")

  val oracles: Map[String, String] = Map(
    // q110: q90's replay parameterized by query_id — the BM25 chain runs
    // once over the UNION term list (global df/N/avgdl, the batch
    // contract), contributions fan out per query through the qterms
    // table, and both rank windows + the fusion partition by query
    "q110_hybrid_batch" ->
      s"""WITH qterms(query_id, term) AS (VALUES $qtermsValues),
         |toks AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
         |    x -> x <> '') AS ts
         |  FROM documents),
         |meta AS (SELECT count(*) AS n, sum(len(ts)) AS sumdl FROM toks),
         |post AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks),
         |tf AS (SELECT term, doc_id, dl, count(*) AS tf FROM post
         |       WHERE term IN $unionTermList GROUP BY 1, 2, 3),
         |dfx AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
         |        FROM post WHERE term IN $unionTermList GROUP BY 1),
         |bsc AS (SELECT q.query_id, t.doc_id,
         |  CAST(floor(
         |    (floor(ln(1.0 + (CAST(m.n AS DOUBLE) - d.df + 0.5) /
         |       (d.df + 0.5)) * 10000.0 + 0.5) / 10000.0) *
         |    ((CAST(t.tf AS DOUBLE) * 2.2) /
         |     (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
         |       (CAST(t.dl AS DOUBLE) /
         |        (CAST(m.sumdl AS DOUBLE) / CAST(m.n AS DOUBLE))))))
         |    * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS s
         |  FROM tf t JOIN dfx d USING (term) JOIN qterms q USING (term)
         |  CROSS JOIN meta m),
         |bm AS (SELECT query_id, doc_id AS id,
         |         CAST(sum(s) AS DOUBLE) AS score
         |       FROM bsc GROUP BY 1, 2),
         |bmr AS (SELECT query_id, id, r FROM (
         |         SELECT query_id, id, CAST(row_number() OVER (
         |           PARTITION BY query_id ORDER BY score DESC, id)
         |           AS INT) AS r FROM bm)
         |        WHERE r <= 50),
         |qv AS (SELECT vec_id AS query_id, embedding AS qe
         |       FROM embeddings WHERE vec_id < 2),
         |vp AS (SELECT q.query_id, e.vec_id, unnest(e.embedding) AS x,
         |         unnest(q.qe) AS y
         |       FROM embeddings e CROSS JOIN qv q),
         |vsc AS (SELECT query_id, vec_id AS id,
         |          round(sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4)
         |            AS score
         |        FROM vp GROUP BY 1, 2),
         |vr AS (SELECT query_id, id, r FROM (
         |        SELECT query_id, id, CAST(row_number() OVER (
         |          PARTITION BY query_id ORDER BY score DESC, id)
         |          AS INT) AS r FROM vsc)
         |       WHERE r <= 50),
         |u AS (SELECT query_id, id, r, 'bm25' AS src FROM bmr
         |      UNION ALL
         |      SELECT query_id, id, r, 'vec' AS src FROM vr),
         |f AS (SELECT query_id, id,
         |        CAST(sum(CAST(floor(1.0 / (60.0 + CAST(r AS DOUBLE))
         |          * 100000000.0 + 0.5) / 100000000.0
         |          AS DECIMAL(18,8))) AS DOUBLE) AS rrf_score,
         |        CAST(min(CASE WHEN src = 'bm25' THEN r END) AS INT)
         |          AS r_bm25,
         |        CAST(min(CASE WHEN src = 'vec' THEN r END) AS INT)
         |          AS r_vec
         |      FROM u GROUP BY 1, 2),
         |top AS (SELECT query_id, id, rrf_score, r_bm25, r_vec,
         |          row_number() OVER (PARTITION BY query_id
         |            ORDER BY rrf_score DESC, id) AS rn
         |        FROM f)
         |SELECT CAST(query_id AS BIGINT) AS query_id, id, rrf_score,
         |  r_bm25, r_vec
         |FROM top WHERE rn <= 15
         |ORDER BY query_id, rrf_score DESC, id""".stripMargin,
    "q85_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT doc_id, CAST(sum(s) AS DOUBLE) AS score
         |FROM bsc GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q93_bm25_delete" ->
      s"""WITH ${bm25CtesOver("(SELECT * FROM documents WHERE doc_id % 7 <> 0)")}
         |SELECT doc_id, CAST(sum(s) AS DOUBLE) AS score
         |FROM bsc GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // q90: both legs replayed (BM25 chain above; exact dot ranking as in
    // q31), ranked with the same (score DESC, id) tiebreak, fused with
    // the identical floor-8 + DECIMAL-sum contribution arithmetic
    "q90_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
         |bm AS (SELECT doc_id AS id, CAST(sum(s) AS DOUBLE) AS score
         |       FROM bsc GROUP BY doc_id
         |       ORDER BY score DESC, id LIMIT 50),
         |bmr AS (SELECT id, CAST(row_number() OVER (
         |          ORDER BY score DESC, id) AS INT) AS r FROM bm),
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |vp AS (SELECT e.vec_id, unnest(e.embedding) AS x,
         |         unnest(q.qe) AS y
         |       FROM embeddings e CROSS JOIN qv q),
         |vsc AS (SELECT vec_id AS id,
         |          round(sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4) AS score
         |        FROM vp GROUP BY vec_id
         |        ORDER BY score DESC, id LIMIT 50),
         |vr AS (SELECT id, CAST(row_number() OVER (
         |         ORDER BY score DESC, id) AS INT) AS r FROM vsc),
         |u AS (SELECT id, r, 'bm25' AS src FROM bmr
         |      UNION ALL
         |      SELECT id, r, 'vec' AS src FROM vr),
         |f AS (SELECT id,
         |        CAST(sum(CAST(floor(1.0 / (60.0 + CAST(r AS DOUBLE))
         |          * 100000000.0 + 0.5) / 100000000.0
         |          AS DECIMAL(18,8))) AS DOUBLE) AS rrf_score,
         |        CAST(min(CASE WHEN src = 'bm25' THEN r END) AS INT) AS r_bm25,
         |        CAST(min(CASE WHEN src = 'vec' THEN r END) AS INT) AS r_vec
         |      FROM u GROUP BY id)
         |SELECT id, rrf_score, r_bm25, r_vec FROM f
         |ORDER BY rrf_score DESC, id LIMIT 15""".stripMargin)
}
