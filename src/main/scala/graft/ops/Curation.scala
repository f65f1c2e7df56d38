package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * incremental (batch-vs-corpus) dedup, train/eval decontamination,
  * sequence packing, stratified sampling, and PII redaction.
  *
  * Every operator is shaped for the 100-TB case: the corpus side of a join
  * is never shuffled when a broadcast of the small side suffices, candidate
  * blowups are bounded (occupancy / document-frequency caps), and the one
  * inherently sequential computation (global prefix sums for packing) is a
  * two-pass range-partition algorithm, not a single-partition window.
  */
object Curation {

  // ---- incremental dedup -------------------------------------------------

  /** Near-dup candidates of an incoming BATCH against an existing CORPUS —
    * the incremental-ingest complement of [[Dedup.minHashPairs]] (which
    * self-joins one corpus).
    *
    * Scale shape: the batch is small (an ingest increment), so its banded
    * signatures are BROADCAST and the corpus is scanned exactly once with
    * no corpus-sized shuffle anywhere: scan → signature+bands (narrow) →
    * broadcast hash join → signature-agreement filter → distinct over the
    * (small) surviving pairs. Signature agreement is computed before the
    * distinct so only the narrow (batch_id, corpus_id, est_jaccard) triple
    * is ever exchanged; a pair matching in several bands re-scores the same
    * cheap zip — bounded by `bands` — instead of shuffling two 64-element
    * signature arrays per candidate.
    *
    * The occupancy cap is applied to the BATCH side only (tiny window): a
    * hot corpus bucket against a broadcast batch fans out linearly in the
    * bucket's size — candidates a verification stage prunes — never
    * quadratically, so the corpus needs no capping shuffle. At 100 TB the
    * corpus signatures come from the persisted artifact
    * ([[Dedup.writeSignatures]] / [[dedupAgainstSignatures]], maintained by
    * [[ingest]]'s appends) rather than being recomputed per batch — this
    * text-vs-text form recomputes them and exists for one-shot jobs. */
  def dedupAgainstCorpus(batch: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 64, bands: Int = 16,
      minJaccard: Double = 0.5,
      batchBucketCap: Int = BucketCap.DefaultCap): DataFrame =
    dedupAgainstSignatures(batch,
      Dedup.computeSignatures(corpus, idCol, textCol, numHashes),
      idCol, textCol, numHashes, bands, minJaccard, batchBucketCap)

  /** [[dedupAgainstCorpus]] against a PERSISTED corpus signature table
    * (schema (id, sig) — [[Dedup.writeSignatures]]/[[Dedup.loadSignatures]]):
    * the batch is minhashed fresh (O(batch)); the corpus side only scans
    * the 64-longs-per-row artifact, never the corpus text. This is the
    * per-ingest cost model a 100 TB deployment needs — corpus text is
    * touched once at artifact build, not once per batch. `numHashes` must
    * match the artifact's family (the artifact stamp enforces it for
    * artifacts maintained through [[Dedup.appendSignatures]]). */
  def dedupAgainstSignatures(batch: DataFrame, corpusSigs: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 64, bands: Int = 16,
      minJaccard: Double = 0.5,
      batchBucketCap: Int = BucketCap.DefaultCap): DataFrame = {
    require(bands >= 1 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) " +
        "(bands > numHashes would hash empty slices into one degenerate bucket)")
    val rows = numHashes / bands
    def band(df: DataFrame, idAs: String, sigAs: String) =
      df.select(col(idAs), col(sigAs),
          explode(transform(sequence(lit(0), lit(bands - 1)), b =>
            struct(b.as("band_id"),
              xxhash64(slice(col(sigAs), b * rows + 1, lit(rows)))
                .as("band_hash")))).as("band"))
        .select(col(idAs), col(sigAs), col("band.band_id"),
          col("band.band_hash"))
    val batchBanded = BucketCap.cap(
      band(batch.select(col(idCol).as("batch_id"),
          minhashSig(col(textCol), numHashes, 3).as("sigb")),
        "batch_id", "sigb"),
      Seq("band_id", "band_hash"), "batch_id", batchBucketCap)
    band(corpusSigs.select(col("id").as("corpus_id"), col("sig").as("sigc")),
        "corpus_id", "sigc")
      .join(broadcast(batchBanded), Seq("band_id", "band_hash"))
      .withColumn("est_jaccard", round4(
        aggregate(zip_with(col("sigb"), col("sigc"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes))
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("batch_id"), col("corpus_id"), col("est_jaccard"))
      .distinct()
  }

  /** Incremental-ingest ADMISSION: the rows of `batch` that near-dup nothing
    * in `corpus` (one anti-join over [[dedupAgainstCorpus]]). Defaults to
    * UNCAPPED batch buckets: an admission gate trades the capped variant's
    * skew insurance for recall (a batch doc evicted from its hot buckets
    * could be admitted despite being a duplicate), and the cap's only cost
    * here is a window over the small batch side anyway — hot corpus
    * buckets fan out linearly against a broadcast batch, never
    * quadratically. Pass a finite `batchBucketCap` to reinstate capping
    * for boilerplate-heavy batches. */
  def admitNew(batch: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, minJaccard: Double = 0.8,
      batchBucketCap: Int = BucketCap.Uncapped): DataFrame =
    admitAgainst(batch,
      dedupAgainstCorpus(batch, corpus, idCol, textCol,
        minJaccard = minJaccard, batchBucketCap = batchBucketCap), idCol)

  /** [[admitNew]] against a persisted signature artifact — no corpus text
    * touched. */
  def admitNewAgainstSignatures(batch: DataFrame, corpusSigs: DataFrame,
      idCol: String, textCol: String, minJaccard: Double = 0.8,
      batchBucketCap: Int = BucketCap.Uncapped): DataFrame =
    admitAgainst(batch,
      dedupAgainstSignatures(batch, corpusSigs, idCol, textCol,
        minJaccard = minJaccard, batchBucketCap = batchBucketCap), idCol)

  private def admitAgainst(batch: DataFrame, dups: DataFrame,
      idCol: String): DataFrame =
    batch.join(dups.select(col("batch_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** One full incremental-ingest cycle against a persisted signature
    * artifact: admit the batch rows that near-dup nothing in the artifact,
    * then append the ADMITTED rows' signatures so the next batch dedups
    * against them too ([[graft.memo.MemoEngine.commitAppend]]'s
    * admit-then-maintain pattern at corpus scale). Total cost is O(batch)
    * minhash work + one scan of the signature artifact — the corpus text is
    * never read. Returns the admitted rows. */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
      sigPath: String, minJaccard: Double = 0.8,
      batchBucketCap: Int = BucketCap.Uncapped): DataFrame = {
    val sigs = Dedup.loadSignatures(batch.sparkSession, sigPath)
    val admitted = admitNewAgainstSignatures(batch, sigs, idCol, textCol,
      minJaccard, batchBucketCap)
    // TRUNCATE the lineage (not just cache it) before appending: the append
    // below writes to the very path the anti-join reads, and Spark recaches
    // plans by path on write — a persist()ed admitted set would re-evaluate
    // against the grown artifact and reject its own rows as duplicates of
    // themselves. The admitted set is batch-sized, so an eager local
    // checkpoint is cheap; a production pipeline would equivalently land
    // admitted rows to their own table between the two steps.
    val pinned = admitted.localCheckpoint(true)
    Dedup.appendSignatures(pinned, idCol, textCol, sigPath)
    pinned
  }

  // ---- decontamination ---------------------------------------------------

  /** Train/eval contamination check: for every eval document, the number of
    * distinct word `n`-grams it shares with ANY training document — the
    * standard pre-release decontamination sweep (an eval row whose n-grams
    * appear in training data leaks the benchmark).
    *
    * Shape: both sides explode to distinct n-grams (narrow); the train side
    * collapses to a distinct n-gram SET with a document-frequency cap —
    * n-grams present in more than `maxTrainDf` training documents are
    * boilerplate (licence headers, navigation chrome), not contamination
    * evidence, and dropping them is also what bounds the join fan-out on a
    * skewed corpus. One shuffle per side on the n-gram key, then an
    * inverted-index equi-join and a per-eval-doc count. At 100 TB the train
    * n-gram set is the big side; it is built once per train snapshot and
    * reused across eval sweeps (persist or write out the distinct set). */
  def decontaminate(evalDf: DataFrame, trainDf: DataFrame, idCol: String,
      textCol: String, n: Int = 3, minShared: Long = 1,
      maxTrainDf: Long = Long.MaxValue): DataFrame =
    decontaminateAgainstGrams(evalDf,
      trainGramSet(trainDf, idCol, textCol, n, maxTrainDf),
      idCol, textCol, n, minShared)

  /** The distinct (df-capped) train n-gram set — the expensive side of a
    * decontamination sweep, and the thing [[writeTrainGrams]] snapshots. */
  private def trainGramSet(trainDf: DataFrame, idCol: String, textCol: String,
      n: Int, maxTrainDf: Long): DataFrame = {
    val g = trainDf.select(col(idCol).as("train_id"),
      explode(Dedup.shingles(col(textCol), n)).as("ng"))
    if (maxTrainDf == Long.MaxValue) g.select(col("ng")).distinct()
    else g.groupBy(col("ng"))
      .agg(countDistinct(col("train_id")).as("df"))
      .filter(col("df") <= maxTrainDf)
      .select(col("ng"))
  }

  /** Decontamination against an already-built gram set (one column `ng`). */
  def decontaminateAgainstGrams(evalDf: DataFrame, trainGrams: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      minShared: Long = 1): DataFrame =
    evalDf.select(col(idCol).as("eval_id"),
        explode(Dedup.shingles(col(textCol), n)).as("ng"))
      .join(trainGrams, Seq("ng"))
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** Snapshot a train corpus's distinct n-gram set as a parquet artifact
    * with an `_grams_meta` stamp (train row count + n + df cap) — built
    * once per train snapshot, reused across every eval sweep (the reuse a
    * per-sweep rebuild forfeits: at 100 TB the train shingle explosion is
    * the dominant cost of decontamination, and it is identical for every
    * benchmark swept). */
  def writeTrainGrams(trainDf: DataFrame, idCol: String, textCol: String,
      path: String, n: Int = 3, maxTrainDf: Long = Long.MaxValue): Unit =
    ArtifactMeta.withBuildLock(trainDf, path) {
      writeTrainGramsStamped(trainDf, idCol, textCol, path, n, maxTrainDf,
        gramStamp(trainDf, idCol, textCol, n, maxTrainDf))
    }

  /** [[writeTrainGrams]] with a precomputed stamp — callers that already
    * fingerprinted for their freshness check (a full text scan) reuse it. */
  private def writeTrainGramsStamped(trainDf: DataFrame, idCol: String,
      textCol: String, path: String, n: Int, maxTrainDf: Long,
      stamp: String): Unit = {
    trainGramSet(trainDf, idCol, textCol, n, maxTrainDf)
      .write.mode("overwrite").parquet(path)
    writeMetaFile(trainDf, path, "_grams_meta", stamp)
  }

  /** count + gram config + content fingerprint ([[ArtifactMeta.fingerprint]]
    * over id + text): an in-place train-set regeneration with an identical
    * row count invalidates the snapshot. */
  private def gramStamp(trainDf: DataFrame, idCol: String, textCol: String,
      n: Int, maxTrainDf: Long): String = {
    val (cnt, fp) = ArtifactMeta.fingerprint(trainDf, Seq(idCol, textCol))
    s"$cnt:$n:$maxTrainDf:fp$fp"
  }

  /** Ensure a valid gram snapshot exists (stamp check — same freshness
    * contract as [[Dedup.signaturesIfAbsent]]; a pre-fingerprint stamp is
    * upgraded by one rebuild) and return it. */
  def trainGramsIfAbsent(trainDf: DataFrame, idCol: String, textCol: String,
      path: String, n: Int = 3, maxTrainDf: Long = Long.MaxValue): DataFrame = {
    val stamp = gramStamp(trainDf, idCol, textCol, n, maxTrainDf)
    if (!readMetaFile(trainDf, path, "_grams_meta").contains(stamp))
      ArtifactMeta.withBuildLock(trainDf, path) {
        // double-checked: reuse a racing builder's finished artifact
        if (!readMetaFile(trainDf, path, "_grams_meta").contains(stamp))
          writeTrainGramsStamped(trainDf, idCol, textCol, path, n, maxTrainDf,
            stamp)
      }
    trainDf.sparkSession.read.parquet(path)
  }

  /** Decontaminate an eval set against a gram SNAPSHOT: `n` comes from the
    * snapshot's stamp, so the eval side always shingles with the family the
    * artifact was built with. */
  def decontaminateAgainstSnapshot(evalDf: DataFrame, idCol: String,
      textCol: String, path: String, minShared: Long = 1): DataFrame = {
    val stamp = readMetaFile(evalDf, path, "_grams_meta").getOrElse(
      throw new IllegalStateException(
        s"no gram snapshot at $path — writeTrainGrams first"))
    val n = stamp.split(":", 3)(1).toInt
    decontaminateAgainstGrams(evalDf,
      evalDf.sparkSession.read.parquet(path), idCol, textCol, n, minShared)
  }

  private def readMetaFile(df: DataFrame, path: String,
      name: String): Option[String] = ArtifactMeta.read(df, path, name)

  private def writeMetaFile(df: DataFrame, path: String, name: String,
      stamp: String): Unit = ArtifactMeta.write(df, path, name, stamp)

  // ---- sequence packing --------------------------------------------------

  /** Assign every document to a fixed-size token bin (training-sequence
    * packing): documents are laid out in `idCol` order, token counts are
    * prefix-summed, and a document lands in the bin its first token falls
    * into — `bin_id = floor(start_offset / seqLen)`.
    *
    * The global prefix sum is the textbook two-pass range-group algorithm,
    * NOT a single-partition window (which would serialize the whole corpus
    * through one task): rows are bucketed into `numGroups` contiguous id
    * ranges, per group a windowed local running sum, and the per-group
    * TOTALS (numGroups rows — the only driver traffic) are prefix-summed
    * into group offsets and broadcast back. The range grouping is a PURE
    * COLUMN FUNCTION of the id against the (min, max) span — unlike
    * `repartitionByRange`, whose sampled bounds differ between the totals
    * pass and the apply pass, it needs no persist/checkpoint to be
    * consistent, and costs one tiny min/max aggregate instead of a
    * sampling job. Uniform-ish id spacing gives balanced groups; heavily
    * clustered ids only skew group SIZES, never correctness.
    *
    * Returns (idCol, n_tokens, start_offset, bin_id). */
  def packBins(df: DataFrame, idCol: String, nTokens: Column,
      seqLen: Int, numGroups: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = df.sparkSession
    // null ids have no place in a total order — dropped, not crashed on;
    // null token counts pack as 0. nTokens is evaluated in the totals pass
    // and the final pass (the bounds pass prunes it) — two-pass is the
    // algorithm's shape, and at 100 TB the narrow (id, n_tokens)
    // projection would be a materialized intermediate.
    val base = df.select(col(idCol).cast("long").as(idCol),
        coalesce(nTokens.cast("long"), lit(0L)).as("n_tokens"))
      .filter(col(idCol).isNotNull)
    val bounds = base.agg(min(col(idCol)), max(col(idCol))).head()
    if (bounds.isNullAt(0)) // empty input
      return base.select(col(idCol), col("n_tokens"),
        lit(0L).as("start_offset"), lit(0L).as("bin_id"))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val groups = math.max(1, if (numGroups > 0) numGroups
      else spark.sessionState.conf.numShufflePartitions)
    val span = hi - lo + 1
    // group = floor((id - lo) * groups / span) ∈ [0, groups): contiguous,
    // order-preserving ranges (exact in double well past any real id span)
    val parts = base.withColumn("__pid",
      floor((col(idCol) - lo).cast("double") * groups / span).cast("int"))
    val totals = parts.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix sum in group (= id-range) order → group offsets
    val offs = totals.map(_._1).zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
    val offDf = spark.createDataFrame(offs.toSeq).toDF("__pid", "__off")
    // explicit ROWS frame: the default RANGE frame would sum all PEERS of
    // a duplicate id into each dup's cumulative value, breaking the tiling
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.join(broadcast(offDf), Seq("__pid"))
      .withColumn("__cum", sum(col("n_tokens")).over(w) + col("__off"))
      .withColumn("start_offset", col("__cum") - col("n_tokens"))
      .withColumn("bin_id",
        floor(col("start_offset").cast("double") / seqLen).cast("long"))
      .select(col(idCol), col("n_tokens"), col("start_offset"), col("bin_id"))
  }

  /** Per-bin packing summary: documents and tokens per `seqLen`-token bin. */
  def packSummary(df: DataFrame, idCol: String, nTokens: Column,
      seqLen: Int): DataFrame =
    packBins(df, idCol, nTokens, seqLen)
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))

  // ---- stratified sampling -----------------------------------------------

  /** Deterministic stratified sample: per-stratum rates, decided by an
    * md5-threshold on the row id — the reproducible (seed-free, engine-free)
    * version of `DataFrame.stat.sampleBy`. A row survives iff the first 6
    * hex chars of `md5(id)` sort below `floor(rate * 16^6)` in hex — a pure
    * per-row predicate that pushes into the scan, samples the same rows on
    * every engine and every rerun, and never shuffles.
    *
    * Strata absent from `rates` are dropped (rate 0). */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1),
      "rates must be within [0, 1]")
    val key = substring(md5(col(idCol).cast("string")), 1, 6)
    val pred = rates.foldLeft(lit(false)) { case (acc, (stratum, rate)) =>
      val keep =
        if (rate >= 1.0) lit(true)
        else key < lit(f"${(rate * (1 << 24)).toLong}%06x")
      acc || (col(strataCol) === stratum && keep)
    }
    df.filter(pred)
  }

  // ---- PII redaction -----------------------------------------------------

  /** Portable (RE2-safe, engine-identical) PII patterns. Both are anchored
    * to common literal shapes on purpose: curation-scale redaction wants
    * high precision; recall tails (obfuscated addresses, international
    * formats) belong to stratum-specific passes. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redact emails and phone numbers, reporting per-row counts: returns
    * (idCol, n_emails, n_phones, redacted). Redaction is sequential
    * (emails first), and n_phones is counted on the email-redacted text so
    * counts always agree with the output — a phone-shaped string consumed
    * by an email match (digits are legal in a local part) is one email,
    * not a phantom phone. Pure per-row scan work — codegen regexes, no
    * shuffle, safe at any scale. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val emailRedacted = regexp_replace(col(textCol), EmailPattern, "[EMAIL]")
    df.select(col(idCol),
      // group 0 = the whole match (the patterns define no capture groups)
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .as("n_emails"),
      size(regexp_extract_all(emailRedacted, lit(PhonePattern), lit(0)))
        .as("n_phones"),
      regexp_replace(emailRedacted, PhonePattern, "[PHONE]").as("redacted"))
  }
}
