package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._
import graft.ops.{BucketCap, Curation}

/** Training-data curation coverage over `documents`: incremental
  * batch-vs-corpus dedup, train/eval decontamination, sequence packing,
  * deterministic stratified sampling, and PII redaction. Each query plants
  * its interesting rows by construction (twins / copied train docs /
  * appended PII) so a DuckDB oracle can replay the full pipeline exactly —
  * same trick as [[DedupQueries]].
  */
object CurationQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Incremental ingest: a batch of IDENTICAL copies of every 5th doc
    * (id + 100000) deduped against the corpus. Identical text pins the
    * planted (d+100000, d) pair to est_jaccard exactly 1.0; the projection
    * to self-pairs is what makes the result DuckDB-expressible (a twin may
    * also legitimately hit near-dups of its original — spec-covered). */
  private val q46Incremental: Q = (s, dir) => {
    val corpus = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val batch = corpus.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    // the corpus side comes from the PERSISTED signature artifact (built
    // once per sf dir, stamp-checked) — the steady-state ingest cost model:
    // per batch, only the artifact is scanned, never the corpus text.
    // Signatures are deterministic, so the result is identical to the
    // recompute form and the oracle carries over unchanged.
    // validate-once-per-session ([[SessionHandles]]): the stamp check is a
    // corpus fingerprint agg — an ingest pipeline pays it at artifact open,
    // not per arriving batch. Cache the validated PATH, not the DataFrame:
    // a cached DataFrame would pin the artifact's file listing and make a
    // same-session appendSignatures invisible (the ingest cycle's contract
    // is that the grown artifact is seen); loading fresh is plan-only cost.
    val sigPath = SessionHandles.cached(s, s"q46_sigs:$dir") {
      val p = SessionHandles.tmpArtifactPath("q46_sigs", dir)
      graft.ops.Dedup.signaturesIfAbsent(corpus, "doc_id", "text", p)
      p
    }
    val sigs = graft.ops.Dedup.loadSignatures(s, sigPath)
    // oracle leg runs uncapped (see q42: caps evict the largest ids, which
    // are exactly the planted twins); capped behavior is CurationSpec's job
    Curation.dedupAgainstSignatures(batch, sigs, "doc_id", "text",
        minJaccard = 0.5, batchBucketCap = BucketCap.Uncapped)
      .filter(col("corpus_id") === col("batch_id") - 100000)
      .orderBy(col("corpus_id"))
  }

  /** Decontamination sweep: md5 train/eval split (as q57), with every 10th
    * TRAIN doc replanted into the eval set (id + 100000) — guaranteed
    * contamination; natural trigram overlap is replayed identically by the
    * oracle. */
  private val q47Decontaminate: Q = (s, dir) => {
    val base = Tables(s, dir, "documents")
      .withColumn("is_train",
        substring(md5(col("doc_id").cast("string")), 1, 1) < "e")
    val train = base.filter(col("is_train")).select(col("doc_id"), col("text"))
    val evalDf = base.filter(!col("is_train")).select(col("doc_id"), col("text"))
      .unionByName(train.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    // eval sweeps run against the train-gram SNAPSHOT (built once per sf
    // dir, stamp-checked) — the reuse path a per-sweep rebuild forfeits.
    // The gram set is deterministic, so the oracle carries over unchanged.
    val gramsPath = SessionHandles.cached(s, s"q47_grams:$dir") {
      val p = SessionHandles.tmpArtifactPath("q47_grams", dir)
      Curation.trainGramsIfAbsent(train, "doc_id", "text", p, n = 3)
      p
    }
    Curation.decontaminateAgainstSnapshot(evalDf, "doc_id", "text", gramsPath)
      .orderBy(col("eval_id"))
  }

  /** Sequence packing: per-2048-token-bin doc/token counts, global doc_id
    * order via the two-pass distributed prefix sum. */
  private val q48PackBins: Q = (s, dir) =>
    Curation.packSummary(Tables(s, dir, "documents"), "doc_id",
        tokenCount(col("text")), seqLen = 2048)
      .orderBy(col("bin_id"))

  /** Deterministic per-language stratified sample (md5-threshold rates);
    * fr is intentionally absent from the rate map → dropped stratum. */
  private val q49Stratified: Q = (s, dir) =>
    Curation.stratifiedSample(Tables(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.25, "zh" -> 1.0))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** PII redaction over planted addresses: every 7th doc gets an email and
    * a phone appended (derived from doc_id, so the oracle can replant
    * byte-identically), then the redactor must find exactly those. */
  private val q59RedactPii: Q = (s, dir) => {
    val planted = Tables(s, dir, "documents")
      .withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"),
            lit("@mail.example.com or call 415-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(col("text")))
    Curation.redactPii(planted, "doc_id", "text").orderBy(col("doc_id"))
  }

  val defs: Map[String, Q] = Map(
    "q46_dedup_incremental" -> q46Incremental,
    "q47_decontaminate" -> q47Decontaminate,
    "q48_pack_bins" -> q48PackBins,
    "q49_stratified_sample" -> q49Stratified,
    "q59_redact_pii" -> q59RedactPii,
  )

  val oracles: Map[String, String] = Map(
    // planted twin batch: identical text ⇒ deterministic recovery at 1.0
    "q46_dedup_incremental" ->
      """SELECT doc_id + 100000 AS batch_id, doc_id AS corpus_id,
        | CAST(1.0 AS DOUBLE) AS est_jaccard
        |FROM documents WHERE doc_id % 5 = 0 ORDER BY corpus_id""".stripMargin,
    // full replay: split, replant, shingle (distinct word 3-grams of the
    // embed tokenizer's tokens — same construction as q44), inverted join
    "q47_decontaminate" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' AS is_train
        |  FROM documents),
        |train AS (SELECT doc_id, text FROM base WHERE is_train),
        |ev AS (
        |  SELECT doc_id, text FROM base WHERE NOT is_train
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM train
        |  WHERE doc_id % 10 = 0),
        |tsh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(ts) - 2, 0)),
        |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
        |  FROM (SELECT doc_id,
        |      list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
        |        x -> x <> '') AS ts FROM train)),
        |esh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(ts) - 2, 0)),
        |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
        |  FROM (SELECT doc_id,
        |      list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
        |        x -> x <> '') AS ts FROM ev)),
        |tg AS (SELECT DISTINCT unnest(sh) AS ng FROM tsh),
        |eg AS (SELECT doc_id, unnest(sh) AS ng FROM esh)
        |SELECT eg.doc_id AS eval_id, count(*) AS n_shared
        |FROM eg JOIN tg USING (ng)
        |GROUP BY 1 HAVING count(*) >= 1 ORDER BY eval_id""".stripMargin,
    // global prefix sum over doc_id order; a doc's bin is where it STARTS
    "q48_pack_bins" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
        |    x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens, sum(n_tokens) OVER (
        |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT)
        |    AS bin_id,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1 ORDER BY bin_id""".stripMargin,
    // thresholds are floor(rate * 16^6) as 6-hex-char strings:
    // 0.5 -> 800000, 0.25 -> 400000, 1.0 -> keep-all; fr absent -> dropped
    "q49_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE (lang = 'en' AND
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '800000')
        |  OR (lang = 'es' AND
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '400000')
        |  OR (lang = 'de' AND
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '400000')
        |  OR lang = 'zh'
        |ORDER BY doc_id""".stripMargin,
    "q59_redact_pii" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |      '@mail.example.com or call 415-555-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    ELSE text END AS text
        |  FROM documents)
        |, er AS (
        |  SELECT doc_id, text, regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g')
        |    AS email_redacted
        |  FROM planted)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(email_redacted,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
        |  regexp_replace(email_redacted,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS redacted
        |FROM er ORDER BY doc_id""".stripMargin,
  )
}
