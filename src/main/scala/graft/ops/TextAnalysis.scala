package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting. All per-row and
  * narrow — they run inside the scan stage at any scale.
  */
object TextAnalysis {

  /** Per-language marker token sets for the n-gram/stopword heuristic. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"))

  /** Whitespace/punct-normalized canonical form used for fingerprints. */
  def canonicalText(c: Column): Column = normalizeWhitespace(lower(c))

  /** MD5 content fingerprint over the canonical form (oracle-friendly). */
  def fingerprintMd5(c: Column): Column = md5(canonicalText(c).cast("binary"))

  /** English stopwords used for the stopword-ratio quality signal. */
  val stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in",
    "is", "that", "it", "for", "on", "with", "as", "at", "by", "or", "be")

  /** Quality features: chars, tokens, distinct-token ratio, mean token
    * length, alpha / punctuation / stopword ratios. All narrow per-row
    * built-ins — run inside the scan stage at any scale. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col(idCol),
      length(col(textCol)).as("n_chars_raw"),
      size(toks).as("n_tokens"),
      round4(size(array_distinct(toks)).cast("double") /
        greatest(size(toks), lit(1))).as("uniq_ratio"),
      round4(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / greatest(size(toks), lit(1))).as("mean_tok_len"),
      round4(length(regexp_replace(col(textCol), "[^a-zA-Z]", ""))
        .cast("double") / greatest(length(col(textCol)), lit(1)))
        .as("alpha_ratio"),
      round4(length(regexp_replace(col(textCol), "[^.,;:!?'\"()\\[\\]{}-]", ""))
        .cast("double") / greatest(length(col(textCol)), lit(1)))
        .as("punct_ratio"),
      round4(size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
        greatest(size(toks), lit(1))).as("stopword_ratio"))
  }

  /** BPE-ish token-count estimate: letter runs, digit runs, and punctuation
    * runs each count as one token (a cheap, deterministic proxy for
    * subword tokenizer counts — the pattern is portable regex). */
  def bpeTokenEstimate(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"), lit(0)))

  /** Composite quality score in [0,1]: favors mid-length docs with diverse
    * tokens and high alpha ratio. Deterministic, documented formula —
    * computed from UNROUNDED features, then FLOOR-truncated to 4 decimals:
    * both engines produce bit-identical IEEE doubles for the sum, and floor
    * (unlike round) has no half-way mode ambiguity across engines. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), qualityCol(col(textCol)).as("quality"))

  /** The quality score as a composable Column (pure projection — pipelines
    * add it with `withColumn` instead of joining a scored table back).
    * Built from the codegen kernel expressions (token_count,
    * distinct_token_count, letter_count) rather than HOF array pipelines:
    * same values, but one tokenizer pass per term, no per-row array
    * materialization, and a ~10× smaller generated-code footprint (the HOF
    * form dominated the query's whole-stage-codegen COMPILE time). */
  def qualityCol(text: Column): Column = {
    val nToks = tokenCount(text).cast("double")
    val uniq = distinctTokenCount(text).cast("double") /
      greatest(tokenCount(text), lit(1))
    val alpha = letterCount(text).cast("double") / greatest(length(text), lit(1))
    val raw = least(nToks / 100.0, lit(1.0)) * 0.4 + uniq * 0.3 + alpha * 0.3
    floor(raw * 10000.0) / 10000.0
  }

  /** Language ID: argmax of marker-token hit counts; 'und' when no marker
    * token appears. Heuristic, deterministic. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scores = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      val hits = aggregate(toks, lit(0),
        (acc, t) => acc + when(t.isin(ms: _*), 1).otherwise(0))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    // two projections: CollapseProject keeps the non-cheap greatest(...) in
    // its own project, so the marker scan evaluates once per row, not twice
    df.select(col(idCol), greatest(scores: _*).as("best"))
      .select(col(idCol),
        when(col("best.hits") > 0, col("best.lang")).otherwise(lit("und"))
          .as("predicted_lang"))
  }
}
