package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.ops.Lexical

/** Lexical (BM25) retrieval coverage — the keyword-search side of the
  * serving surface, over the build-once postings artifact
  * ([[graft.ops.Lexical]]). The oracle replays the ENTIRE pipeline in
  * DuckDB: tokenization (the same regex contract as q50), postings,
  * document frequencies, and the BM25 formula with identical operand
  * order, fixed-decimal idf, and exact DECIMAL summation — so the
  * ranking, not just the row count, is hash-verified.
  */
object LexicalQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Fixed query-term bag (mixed document frequencies in the synthetic
    * corpus, so tf/dl differences actually move the ranking). */
  private[graft] val QueryTerms =
    Seq("vector", "stream", "merge", "query", "spark")

  private def lexPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_q85_lex_${dir.hashCode.toHexString}").toString

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

  val defs: Map[String, Q] = Map("q85_bm25" -> q85Bm25)

  private def termList: String =
    QueryTerms.map(t => s"'$t'").mkString("(", ",", ")")

  val oracles: Map[String, String] = Map(
    // Operand order mirrors Lexical.searchBm25 EXACTLY (left-assoc sums,
    // pre-evaluated 0.25/2.2 literals, idf floored to 4 decimals before
    // use, per-term contribution floored to 6 and summed as DECIMAL) —
    // double arithmetic is then bit-identical in both engines, and the
    // decimal sum is order-independent by construction.
    "q85_bm25" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
         |    x -> x <> '') AS ts
         |  FROM documents),
         |meta AS (SELECT count(*) AS n, sum(len(ts)) AS sumdl FROM toks),
         |post AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks),
         |tf AS (SELECT term, doc_id, dl, count(*) AS tf FROM post
         |       WHERE term IN $termList GROUP BY 1, 2, 3),
         |dfx AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
         |        FROM post WHERE term IN $termList GROUP BY 1),
         |sc AS (SELECT t.doc_id,
         |  CAST(floor(
         |    (floor(ln(1.0 + (CAST(m.n AS DOUBLE) - d.df + 0.5) /
         |       (d.df + 0.5)) * 10000.0 + 0.5) / 10000.0) *
         |    ((CAST(t.tf AS DOUBLE) * 2.2) /
         |     (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
         |       (CAST(t.dl AS DOUBLE) /
         |        (CAST(m.sumdl AS DOUBLE) / CAST(m.n AS DOUBLE))))))
         |    * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS s
         |  FROM tf t JOIN dfx d USING (term) CROSS JOIN meta m)
         |SELECT doc_id, CAST(sum(s) AS DOUBLE) AS score
         |FROM sc GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)
}
