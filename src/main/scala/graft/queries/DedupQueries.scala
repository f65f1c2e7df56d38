package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Dedup

/** Deduplication coverage over `documents`. The testdata has no natural
  * near-duplicates, so the near-dup queries union the corpus with mutated
  * copies (doc_id + 100000, one word appended) — the expected duplicate
  * pairs are then exactly (d, d+100000), which the specs assert and the
  * exact-dedup oracles cross-check.
  */
object DedupQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Corpus ∪ slightly-mutated copies (near-dups by construction). */
  def withMutants(s: SparkSession, dir: String, every: Int = 5): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val mutants = docs.filter(col("doc_id") % every === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zzzmutation")).as("text"))
    docs.unionByName(mutants)
  }

  /** Corpus ∪ IDENTICAL copies. Identical text means identical signatures,
    * so every near-dup scheme recovers every planted pair by construction
    * (same minhash bands / same simhash chunks / same fingerprints — no
    * probabilistic banding miss, no threshold edge). That determinism is
    * what lets the (a, a+100000) pair-set be a DuckDB oracle; recall on
    * MUTATED copies stays spec-asserted in DedupSpec. */
  def withTwins(s: SparkSession, dir: String, every: Int = 5): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(docs.filter(col("doc_id") % every === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** Exact dedup by full text: every text unique → n_dupes all 1; the
    * oracle proves the groupBy-text plumbing. */
  private val q40ExactText: Q = (s, dir) =>
    Dedup.exactText(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("keep_id"))

  /** Exact dedup by composite key (lang, source). */
  private val q41ExactKey: Q = (s, dir) =>
    Dedup.exactByKey(Tables(s, dir, "documents"), "doc_id",
        Seq(col("lang"), col("source")))
      .orderBy(col("lang"), col("source"))

  /** MinHash+LSH near-dup pairs over the twin-planted corpus, projected to
    * the planted pair-set: full pipeline (signature → bands → bucket join →
    * signature-agreement verify) runs over corpus ∪ twins; the planted
    * restriction makes the result — including est_jaccard, which must come
    * out exactly 1.0 for identical signatures — DuckDB-expressible. */
  private val q42MinHash: Q = (s, dir) =>
    // completeness-exact oracle leg: BucketCap evicts the LARGEST ids first
    // — exactly the planted twins — so the oracle queries raise the cap
    // beyond any bucket at the verified scales; the capped default stays
    // the production path (hot-bucket eviction is DedupSpec's cap test)
    Dedup.minHashPairs(withTwins(s, dir), "doc_id", "text",
        minJaccard = 0.5, bucketCap = 1 << 20)
      .filter(col("b") === col("a") + 100000)
      .orderBy(col("a"))

  /** SimHash near-dup pairs (hamming <= 3 on 64-bit fingerprints), planted
    * projection — identical text pins hamming to exactly 0. */
  private val q43SimHash: Q = (s, dir) =>
    Dedup.simHashPairs(withTwins(s, dir), "doc_id", "text", maxHamming = 3,
        bucketCap = 1 << 20) // see q42: oracle leg needs no twin eviction
      .filter(col("b") === col("a") + 100000)
      .orderBy(col("a"))

  /** Exact n-gram Jaccard on the planted pairs (verification stage). */
  private val q44NgramJaccard: Q = (s, dir) => {
    val docs = withMutants(s, dir)
    val l = docs.select(col("doc_id").as("a"), col("text").as("texta"))
    val r = docs.select(col("doc_id").as("b"), col("text").as("textb"))
    val pairs = l.join(r, col("b") === col("a") + 100000)
    Dedup.ngramJaccard(pairs).orderBy(col("a"))
  }

  /** Winnowing inverted-index near-dup pairs, planted projection (n_shared
    * depends on the fingerprint multiset, so only (a, b) is oracled). */
  private val q45Winnow: Q = (s, dir) =>
    Dedup.winnowPairs(withTwins(s, dir), "doc_id", "text",
        bucketCap = 1 << 20) // see q42: oracle leg needs no twin eviction
      .filter(col("b") === col("a") + 100000)
      .select(col("a"), col("b"))
      .orderBy(col("a"))

  // NOTE: removeNearDups stays spec-covered (DedupSpec), not oracle-green:
  // even at threshold 1.0 the synthetic small-vocabulary corpus produces
  // natural pairs whose 64 minhashes all collide (measured: 23 at sf0.01),
  // so the drop set is not expressible in SQL without replaying minhash.
  /** Connected components over a DETERMINISTIC minted edge set (chains
    * broken by one ordinal rule, re-merged by a second) — the transitive
    * duplicate-group operator ([[Dedup.components]]) hash-verified
    * against DuckDB's recursive-CTE reachability on the same edges. The
    * pair graph is what every LSH candidate generator emits; this pins
    * the component labels (min reachable id), not just their count. */
  private val q117Components: Q = (s, dir) => {
    import s.implicits._
    val n = 240
    val chain = (0L until (n - 1).toLong)
      .filter(i => (i * 37) % 7 < 3).map(i => (i, i + 1))
    val merge = (0L until (n - 5).toLong)
      .filter(i => (i * 91) % 11 == 0).map(i => (i, i + 5))
    Dedup.components((chain ++ merge).toDF("a", "b"), "a", "b")
      .orderBy(col("id"))
  }

  /** [[q117Components]]'s minted graph folded INCREMENTALLY: the chain
    * edges go through the full operator (the "accumulated corpus"
    * labeling of the broken chain segments) and the re-merging (i, i+5)
    * edges fold in as an ingest batch via
    * [[Dedup.componentsIncremental]] — a delta with 10 cross-component
    * merges and 12 previously-unlabeled endpoints (verified offline),
    * so both fold arms carry weight. The oracle is reachability over
    * the FULL edge set: the hash check proves the fold is
    * indistinguishable from a from-scratch recompute. */
  private val q118ComponentsIncremental: Q = (s, dir) => {
    import s.implicits._
    val n = 240
    val chain = (0L until (n - 1).toLong)
      .filter(i => (i * 37) % 7 < 3).map(i => (i, i + 1))
    val merge = (0L until (n - 5).toLong)
      .filter(i => (i * 91) % 11 == 0).map(i => (i, i + 5))
    val prior = Dedup.components(chain.toDF("a", "b"), "a", "b")
    Dedup.componentsIncremental(prior, merge.toDF("a", "b"), "a", "b")
      .orderBy(col("id"))
  }

  val defs: Map[String, Q] = Map(
    "q40_dedup_exact_text" -> q40ExactText,
    "q41_dedup_exact_key" -> q41ExactKey,
    "q42_dedup_minhash" -> q42MinHash,
    "q43_dedup_simhash" -> q43SimHash,
    "q44_ngram_jaccard" -> q44NgramJaccard,
    "q45_winnow_pairs" -> q45Winnow,
    "q117_components" -> q117Components,
    "q118_components_incremental" -> q118ComponentsIncremental,
  )

  // q117/q118 replay: the same minted edges, components via recursive-CTE
  // reachability (UNION dedups, so the recursion terminates), label = min
  // reachable id per incident node — singletons never appear because
  // `nodes` only holds edge endpoints, matching the operator. q118 runs
  // the SAME oracle over the FULL edge set: an incremental fold that
  // matches it is hash-indistinguishable from the from-scratch labeling.
  private val componentsOracle: String =
    """WITH RECURSIVE d AS (SELECT CAST(range AS BIGINT) AS i FROM range(239)),
      |e0 AS (
      |  SELECT i AS a, i + 1 AS b FROM d WHERE (i * 37) % 7 < 3
      |  UNION ALL
      |  SELECT i AS a, i + 5 AS b FROM d
      |  WHERE (i * 91) % 11 = 0 AND i < 235),
      |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      |nodes AS (SELECT DISTINCT a AS id FROM edges),
      |reach(id, lbl) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.id)
      |SELECT id, MIN(lbl) AS component FROM reach
      |GROUP BY id ORDER BY id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q117_components" -> componentsOracle,
    "q118_components_incremental" -> componentsOracle,
    "q40_dedup_exact_text" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_dupes
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "q41_dedup_exact_key" ->
      """SELECT lang, source, min(doc_id) AS keep_id, count(*) AS n_dupes
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // planted twin pair-sets: identical text ⇒ deterministic complete
    // recovery with est_jaccard exactly 1.0 / hamming exactly 0
    "q42_dedup_minhash" ->
      """SELECT doc_id AS a, doc_id + 100000 AS b,
        | CAST(1.0 AS DOUBLE) AS est_jaccard
        |FROM documents WHERE doc_id % 5 = 0 ORDER BY a""".stripMargin,
    "q43_dedup_simhash" ->
      """SELECT doc_id AS a, doc_id + 100000 AS b,
        | CAST(0 AS INTEGER) AS hamming
        |FROM documents WHERE doc_id % 5 = 0 ORDER BY a""".stripMargin,
    "q45_winnow_pairs" ->
      """SELECT doc_id AS a, doc_id + 100000 AS b
        |FROM documents WHERE doc_id % 5 = 0 ORDER BY a""".stripMargin,
    // exact 3-gram Jaccard over the planted (d, d+100000) mutant pairs —
    // shingles are distinct triples of the embed tokenizer's tokens
    "q44_ngram_jaccard" ->
      """WITH pairs AS (
        |  SELECT doc_id AS a, doc_id + 100000 AS b,
        |    text AS texta, text || ' zzzmutation' AS textb
        |  FROM documents WHERE doc_id % 5 = 0),
        |tok AS (
        |  SELECT a, b,
        |    list_filter(regexp_split_to_array(lower(texta), '[^a-z0-9_]+'),
        |      x -> x <> '') AS ta,
        |    list_filter(regexp_split_to_array(lower(textb), '[^a-z0-9_]+'),
        |      x -> x <> '') AS tb
        |  FROM pairs),
        |sh AS (
        |  SELECT a, b,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(ta) - 2, 0)),
        |      i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) AS sa,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(tb) - 2, 0)),
        |      i -> tb[i] || ' ' || tb[i+1] || ' ' || tb[i+2])) AS sb
        |  FROM tok)
        |SELECT a, b, floor(CAST(len(list_intersect(sa, sb)) AS DOUBLE) /
        |  len(list_distinct(list_concat(sa, sb))) * 10000.0 + 0.5)/10000.0
        |  AS jaccard
        |FROM sh ORDER BY a""".stripMargin,
  )
}
