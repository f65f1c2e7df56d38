package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._
import graft.ops.Similarity

/** Vector pipeline coverage: embedding build (V1), norms (F5), exact kNN
  * ranking (V3/F6), all-pairs similarity, and the LSH scale path.
  */
object VectorQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** L2 norms of the stored embeddings (F5/F6 arithmetic parity check). */
  private val q30VecNorm: Q = (s, dir) =>
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), round(vecNorm(col("embedding")), 4).as("norm"))
      .orderBy(col("vec_id"))

  /** Exact brute-force top-k against one broadcast query vector (V3). */
  private val q31KnnExact: Q = (s, dir) => {
    val emb = Tables(s, dir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    Similarity.bruteForceTopK(emb, "vec_id", qv, 20)
  }

  /** Exact top-3 neighbors per query for a small query set (batch kNN). */
  private val q32KnnBatch: Q = (s, dir) => {
    val emb = Tables(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    Similarity.bruteForceTopKBatch(emb, "vec_id", queries, "query_id", 3)
      .orderBy(col("query_id"), desc("score"), col("vec_id"))
  }

  /** Exact all-pairs top-50 most-similar embedding pairs. */
  private val q33TopPairs: Q = (s, dir) =>
    Similarity.exactTopPairs(
      Tables(s, dir, "embeddings").filter(col("vec_id") < 300), "vec_id", 50)

  /** Embedding index build over documents (V1): hash-embed each non-blank
    * body; emit id + vector norm + dim. The embed VALUES aren't
    * SQL-expressible (determinism and bucket arithmetic are spec-asserted),
    * but the projected invariants are: the kernel L2-normalizes every
    * non-empty token multiset (norm 1.0) and zeroes the empty one (norm
    * 0.0, a tokenless non-blank body like "!!!"), and dim is fixed — so
    * DuckDB can replay the row set from the tokenizer contract alone. */
  private val q34IndexBuild: Q = (s, dir) =>
    Tables(s, dir, "documents")
      .filter(!isBlank(col("text")))
      .select(col("doc_id"),
        embedText(col("text")).as("embedding"))
      .select(col("doc_id"), round(vecNorm(col("embedding")), 4).as("norm"),
        size(col("embedding")).as("dim"))
      .orderBy(col("doc_id"))

  /** LSH near-dup pairs over the twin-planted embeddings, projected to the
    * planted pair-set: identical embeddings give identical SRP signatures,
    * so every planted pair is bucket-colocated by construction and the
    * exact cosine re-rank pins score = 1.0 — which makes the result
    * DuckDB-expressible (same twin construction as q42/q43/q45). The full
    * pipeline (signature → bucket join → re-rank) still runs over
    * corpus ∪ twins; recall quality on perturbed vectors stays
    * spec-asserted (SketchSpec). */
  private val q35LshPairs: Q = (s, dir) => {
    val emb = Tables(s, dir, "embeddings").select("vec_id", "embedding")
    val twins = emb.unionByName(emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    // the ORACLE leg must be completeness-exact, and BucketCap evicts the
    // LARGEST ids first — which is precisely the planted twins — so this
    // query raises the cap beyond any bucket at the verified scales. The
    // capped default stays the production path (hot-bucket behavior is
    // DedupSpec's cap test, and q42-q45 run with the default cap).
    Similarity.lshNearDupPairs(twins, "vec_id", minScore = -1.0, nBits = 8,
        bucketCap = 1 << 20)
      .filter(col("b") === col("a") + 100000)
      .orderBy(col("a"))
  }

  val defs: Map[String, Q] = Map(
    "q30_vec_norm" -> q30VecNorm,
    "q31_knn_exact" -> q31KnnExact,
    "q32_knn_batch" -> q32KnnBatch,
    "q33_top_pairs" -> q33TopPairs,
    "q34_index_build" -> q34IndexBuild,
    "q35_lsh_pairs" -> q35LshPairs,
  )

  val oracles: Map[String, String] = Map(
    "q30_vec_norm" ->
      """SELECT vec_id,
        | round(sqrt(sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))),4) AS norm
        |FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q31_knn_exact" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y
        |          FROM embeddings e CROSS JOIN q)
        |SELECT vec_id, round(sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),4) AS score
        |FROM pairs GROUP BY vec_id ORDER BY score DESC, vec_id LIMIT 20""".stripMargin,
    "q32_knn_batch" ->
      """WITH queries AS (SELECT vec_id AS query_id, embedding AS qe
        |                 FROM embeddings WHERE vec_id < 5),
        |pairs AS (SELECT q.query_id, e.vec_id, unnest(e.embedding) AS x,
        |            unnest(q.qe) AS y
        |          FROM embeddings e CROSS JOIN queries q),
        |scores AS (SELECT query_id, vec_id,
        |    round(sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),4) AS score
        |  FROM pairs GROUP BY query_id, vec_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, vec_id) AS rn FROM scores)
        |SELECT query_id, vec_id, score FROM ranked WHERE rn <= 3
        |ORDER BY query_id, score DESC, vec_id""".stripMargin,
    "q33_top_pairs" ->
      """WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
        |pairs AS (SELECT l.vec_id AS a, r.vec_id AS b,
        |            unnest(l.embedding) AS x, unnest(r.embedding) AS y
        |          FROM sub l JOIN sub r ON l.vec_id < r.vec_id)
        |SELECT a, b, round(sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),4) AS score
        |FROM pairs GROUP BY a, b ORDER BY score DESC, a, b LIMIT 50""".stripMargin,
    // embed invariants: L2-norm is 1.0 iff the body has a token, dim fixed
    "q34_index_build" ->
      """SELECT doc_id,
        | CASE WHEN regexp_matches(lower(text), '[a-z0-9_]')
        |   THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS norm,
        | 384 AS dim
        |FROM documents
        |WHERE text IS NOT NULL
        |  AND trim(regexp_replace(text, '\s+', ' ', 'g')) <> ''
        |ORDER BY doc_id""".stripMargin,
    // planted twin pairs: identical embeddings ⇒ bucket-colocated, cosine 1.0
    "q35_lsh_pairs" ->
      """SELECT vec_id AS a, vec_id + 100000 AS b,
        | CAST(1.0 AS DOUBLE) AS score
        |FROM embeddings WHERE vec_id % 5 = 0 ORDER BY a""".stripMargin,
  )
}
