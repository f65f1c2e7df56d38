package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Deduplication operators for large-scale text pipelines.
  *
  * All candidate generation is hash/bucket based (equi-join shuffles on
  * bucket keys), never all-pairs; verification (exact Jaccard / Hamming /
  * cosine) runs only on bucket-colocated candidates. This is the shape that
  * survives 100 TB: dedup cost ~ O(n) map work + skew-bounded bucket joins.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical key. */
  def exactByKey(df: DataFrame, idCol: String, keyCols: Seq[Column]): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Exact text dedup: group on the full text (hash-shuffled). */
  def exactText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))
      .select(col("keep_id"), col("n_dupes"))

  /** Word n-gram shingles of the embed tokenizer's tokens (codegen kernel;
    * [[DedupSpec]] asserts set-equality with the equivalent HOF pipeline). */
  def shingles(textCol: Column, n: Int = 3): Column = wordShingles(textCol, n)

  /** MinHash+LSH near-duplicate candidate pairs, verified by signature
    * agreement (estimated Jaccard).
    *
    * shingle → minhash signature (narrow, per row) → band hashes → explode →
    * equi-join on (band, hash) bucket → estimate Jaccard from full-signature
    * agreement → threshold.
    *
    * Defaults: 64 hashes / 16 bands (r=4 rows per band, s-curve threshold
    * (1/16)^(1/4) ≈ 0.5 — matched to minJaccard). Half the signature
    * compute and band-join volume of 128/32 in the same quality class;
    * bump both for thresholds below ~0.4. */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, minJaccard: Double = 0.5,
      bucketCap: Int = BucketCap.DefaultCap): DataFrame =
    // The signature frame is EAGERLY TRUNCATED ([[roundCheckpoint]]),
    // not persist()ed: signaturePairs reads it from four plan branches
    // (band self-join + two verification joins), so it must materialize
    // exactly once — but a caller-side persist can never be released
    // after the lazy pair frame escapes, leaking one fat cached frame
    // per call into the session-lifetime CacheManager. The checkpointed
    // RDD lives in the block manager instead, unpinned by the
    // ContextCleaner as soon as the pair frame is unreachable — and the
    // pair PLAN above it stays visible (PlanSpec pins the bucket-cap
    // WindowGroupLimit pushdown on exactly this frame). At 100 TB this
    // is the PERSISTED artifact anyway ([[writeSignatures]]), and
    // [[signaturePairs]] is called on it directly.
    signaturePairs(
      roundCheckpoint(computeSignatures(df, idCol, textCol, numHashes)),
      numHashes, bands, minJaccard, bucketCap)

  /** Near-dup candidate pairs from an (id, sig) signature table — the
    * banding + verification core of [[minHashPairs]], callable directly
    * on the PERSISTED signature artifact so incremental consumers never
    * re-minhash the corpus. `numHashes` must match the table's signature
    * width (the engine's artifact records it in its stamp).
    *
    * `newIds` restricts candidate generation to pairs with at least one
    * endpoint in the given id set — the INCREMENTAL-FOLD feed: an ingest
    * batch's new edges are exactly the (new × all) bucket collisions,
    * and old×old pairs were already folded into the labeling by earlier
    * batches. The restriction is applied to the banded frame BEFORE the
    * bucket join (a left-semi on the batch ids), so the join's left side
    * is O(batch), not O(corpus). Pairs are normalized a < b either way. */
  def signaturePairs(sigTable: DataFrame, numHashes: Int = 64,
      bands: Int = 16, minJaccard: Double = 0.5,
      bucketCap: Int = BucketCap.DefaultCap,
      newIds: Option[DataFrame] = None): DataFrame = {
    require(bands >= 1 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) " +
        "(bands > numHashes would hash empty slices into one degenerate bucket)")
    val rows = numHashes / bands
    val sig = sigTable.select(col("id"), col("sig"))
    // Candidate generation carries only (id, band_id, band_hash) — the
    // narrow columns — through the shuffle.
    val banded = BucketCap.cap(
      sig.select(col("id"),
          explode(transform(sequence(lit(0), lit(bands - 1)), b =>
            struct(b.as("band_id"),
              xxhash64(slice(col("sig"), b * rows + 1, lit(rows))).as("band_hash"))))
            .as("band"))
        .select(col("id"), col("band.band_id"), col("band.band_hash")),
      Seq("band_id", "band_hash"), "id", bucketCap)
    // unrestricted: a < b inside the bucket join halves the candidate
    // volume before the distinct; restricted: the left side is only the
    // batch, so both orders must survive the join and pairs normalize
    // afterwards (an old<new pair only appears as (new, old) from the
    // batch side)
    val candidates = (newIds match {
      case Some(ids) =>
        require(ids.columns.length == 1,
          s"newIds must be a single-column id frame, got " +
            s"[${ids.columns.mkString(", ")}] — a multi-column frame " +
            "would silently semi-join on whatever column happens to be " +
            "first and drop candidate pairs instead of failing")
        val left = banded.join(
          ids.select(col(ids.columns.head).cast("long").as("id")),
          Seq("id"), "left_semi")
        left.select(col("id").as("a"), col("band_id"), col("band_hash"))
          .join(banded.select(col("id").as("b"),
            col("band_id"), col("band_hash")),
            Seq("band_id", "band_hash"))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("a"),
            greatest(col("a"), col("b")).as("b"))
      case None =>
        banded.select(col("id").as("a"), col("band_id"), col("band_hash"))
          .join(banded.select(col("id").as("b"),
            col("band_id"), col("band_hash")),
            Seq("band_id", "band_hash"))
          .filter(col("a") < col("b"))
          .select(col("a"), col("b"))
    }).distinct()
    // Verification: re-attach signatures to the (deduplicated, much smaller)
    // candidate set and estimate Jaccard from full-signature agreement.
    candidates
      .join(sig.select(col("id").as("a"), col("sig").as("siga")), Seq("a"))
      .join(sig.select(col("id").as("b"), col("sig").as("sigb")), Seq("b"))
      .withColumn("est_jaccard", round4(
        aggregate(zip_with(col("siga"), col("sigb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes))
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("est_jaccard"))
  }

  // ---- persisted signature artifact --------------------------------------

  /** The MinHash signature table of a corpus: (id, sig). The columnar form
    * every signature consumer ([[minHashPairs]]'s verification,
    * [[graft.ops.Curation.dedupAgainstCorpus]]'s corpus side) derives its
    * inputs from. */
  def computeSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, shingleSize: Int = 3): DataFrame =
    df.select(col(idCol).as("id"),
      minhashSig(col(textCol), numHashes, shingleSize).as("sig"))

  /** Persist a corpus's MinHash signatures as a parquet artifact with a
    * `_minhash_meta` stamp (row count + hash-family config + content
    * fingerprint) — the same build-once lifecycle the memo index and the
    * IVF index have. At 100 TB the signature table is the thing that makes
    * incremental dedup O(batch): each ingest scans the ARTIFACT (64
    * longs/row, ~3 orders of magnitude narrower than the text corpus)
    * instead of re-minhashing the corpus. The fingerprint
    * ([[ArtifactMeta.fingerprint]] over id + text) makes in-place data
    * regeneration with an identical row count invalidate the artifact —
    * the freshness hole a count-only stamp leaves open. */
  def writeSignatures(df: DataFrame, idCol: String, textCol: String,
      path: String, numHashes: Int = 64, shingleSize: Int = 3): Unit =
    ArtifactMeta.withBuildLock(df, path) {
      writeSignaturesStamped(df, idCol, textCol, path, numHashes, shingleSize,
        sigStamp(df, idCol, textCol, numHashes, shingleSize))
    }

  /** One agg on the pruned input (no signature evaluation). */
  private def sigStamp(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleSize: Int): String = {
    val (n, fp) = ArtifactMeta.fingerprint(df, Seq(idCol, textCol))
    s"$n:$numHashes:$shingleSize:fp$fp"
  }

  /** [[writeSignatures]] with a precomputed stamp, so callers that already
    * fingerprinted for their freshness check (the rebuild's most expensive
    * step — a full text-column scan) don't pay it twice. */
  private def writeSignaturesStamped(df: DataFrame, idCol: String,
      textCol: String, path: String, numHashes: Int, shingleSize: Int,
      stamp: String): Unit = {
    computeSignatures(df, idCol, textCol, numHashes, shingleSize)
      .write.mode("overwrite").parquet(path)
    writeSigMeta(df, path, stamp)
  }

  /** Ensure a valid signature artifact exists for this corpus (stamp =
    * count + hash config + content fingerprint; same freshness contract as
    * [[IvfIndex.buildIfAbsent]]) and return it. A pre-fingerprint stamp
    * (older artifact) never matches, so it is upgraded by one rebuild. */
  def signaturesIfAbsent(corpus: DataFrame, idCol: String, textCol: String,
      path: String, numHashes: Int = 64, shingleSize: Int = 3): DataFrame = {
    val stamp = sigStamp(corpus, idCol, textCol, numHashes, shingleSize)
    // a journal contradicting the live stamp marks a torn append (crash
    // between data write and stamp advance) — force the rebuild arm
    def fresh() = readSigMeta(corpus, path).contains(stamp) &&
      !ArtifactMeta.journalTorn(corpus.sparkSession, path, SigJournal, stamp)
    if (!fresh()) // fresh: lock-free
      ArtifactMeta.withBuildLock(corpus, path) {
        // double-checked: reuse a racing builder's finished artifact
        if (!fresh())
          writeSignaturesStamped(corpus, idCol, textCol, path, numHashes,
            shingleSize, stamp)
      }
    loadSignatures(corpus.sparkSession, path)
  }

  private val SigJournal = "_minhash_journal"

  /** Append a batch's signatures to an existing artifact — the maintenance
    * half of the incremental-ingest cycle (admitted rows join the corpus,
    * so their signatures join the artifact). O(batch): existing files are
    * never read or rewritten; the stamp's count advances so a later
    * [[signaturesIfAbsent]] over the grown corpus validates. The hash
    * config is read from the stamp — a mixed-family artifact would
    * silently miss every cross-generation duplicate, so config drift is
    * impossible by construction. */
  def appendSignatures(batch: DataFrame, idCol: String, textCol: String,
      path: String): Unit = ArtifactMeta.withBuildLock(batch, path) {
    val stamp = readSigMeta(batch, path).getOrElse(throw new IllegalStateException(
      s"no signature artifact at $path — writeSignatures first"))
    val Array(count, numHashes, shingleSize, fp) = stamp.split(":", 4) match {
      case a if a.length == 4 && a(3).startsWith("fp") => a
      case _ => throw new IllegalStateException(
        s"signature artifact at $path predates content-fingerprint stamps — " +
          "rebuild it with writeSignatures")
    }
    // journal protocol (the Lexical shape): a crash between the data
    // write and the stamp advance must be detectable, not silently served
    ArtifactMeta.journalGuard(batch.sparkSession, path, SigJournal, stamp)
    // tombstone half of the ID CONTRACT (the [[graft.ops.Lexical.append]]
    // rule): a pending-delete id may not be re-signed — its old signature
    // rows are still present, so the tombstone would mask the new rows
    // while the stamp advanced. Signatures apply deletes only on a full
    // rebuild, hence the hint.
    ArtifactMeta.requireNoPendingTombstones(batch, idCol,
      s"$path/_tombstones", "rebuild with writeSignatures first")
    // fingerprints are additive sums, so the stamp advances in O(batch)
    val (bn, bfp) = ArtifactMeta.fingerprint(batch, Seq(idCol, textCol))
    val next = s"${count.toLong + bn}:$numHashes:$shingleSize" +
      s":fp${BigInt(fp.drop(2)) + bfp}"
    ArtifactMeta.write(batch.sparkSession, path, SigJournal, next)
    computeSignatures(batch, idCol, textCol, numHashes.toInt, shingleSize.toInt)
      .write.mode("append").parquet(path)
    writeSigMeta(batch, path, next)
    ArtifactMeta.delete(batch.sparkSession, path, SigJournal)
  }

  /** Retract documents from the signature artifact WITHOUT a rebuild —
    * the delete path of the incremental-dedup lifecycle (rows leave the
    * corpus, so their signatures must stop matching future batches).
    * O(batch): ids land as tombstones ([[loadSignatures]] anti-joins
    * them), the stamp facts retreat additively, the window is journaled.
    * A later [[signaturesIfAbsent]] over corpus ∖ batch validates
    * without re-signing; the next full rebuild folds tombstones away.
    * Same id contract as every delete path: the batch must be exactly
    * rows previously signed. */
  def deleteSignatures(batch: DataFrame, idCol: String, textCol: String,
      path: String): Unit = ArtifactMeta.withBuildLock(batch, path) {
    val spark = batch.sparkSession
    val stamp = readSigMeta(batch, path).getOrElse(throw new IllegalStateException(
      s"no signature artifact at $path — writeSignatures first"))
    ArtifactMeta.journalGuard(spark, path, SigJournal, stamp)
    val Array(count, numHashes, shingleSize, fp) = stamp.split(":", 4) match {
      case a if a.length == 4 && a(3).startsWith("fp") => a
      case _ => throw new IllegalStateException(
        s"signature artifact at $path has a pre-lifecycle stamp — rebuild it")
    }
    val (bn, bfp) = ArtifactMeta.fingerprint(batch, Seq(idCol, textCol))
    val n = count.toLong - bn
    require(n >= 0, s"delete batch exceeds artifact contents at $path " +
      s"($count rows, $bn deleted) — id contract violated")
    val next = s"$n:$numHashes:$shingleSize:fp${BigInt(fp.drop(2)) - bfp}"
    ArtifactMeta.write(spark, path, SigJournal, next)
    batch.select(col(idCol).as("id")).distinct()
      .write.mode("append").parquet(s"$path/_tombstones")
    writeSigMeta(batch, path, next)
    ArtifactMeta.delete(spark, path, SigJournal)
  }

  /** Read a persisted signature artifact: (id, sig) — excluding any docs
    * retracted by [[deleteSignatures]]
    * ([[ArtifactMeta.excludeTombstones]]; tombstones fold away on the
    * next full rebuild). */
  def loadSignatures(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    ArtifactMeta.excludeTombstones(spark.read.parquet(path),
      s"$path/_tombstones", "id")

  private def readSigMeta(df: DataFrame, path: String): Option[String] =
    ArtifactMeta.read(df, path, "_minhash_meta")

  private def writeSigMeta(df: DataFrame, path: String, stamp: String): Unit =
    ArtifactMeta.write(df, path, "_minhash_meta", stamp)

  /** SimHash near-duplicate pairs: 64-bit fingerprints, banded into 16-bit
    * chunks (pigeonhole: hamming <= 3 ⇒ at least one identical chunk),
    * verified by exact Hamming distance. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bucketCap: Int = BucketCap.DefaultCap): DataFrame = {
    val fp = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("fp"))
    // chunks materialize ONCE (see [[winnowPairs]]): both self-join sides
    // read this frame, and a broadcast build would re-run the 64-bit
    // text fingerprint over the corpus for the second side
    val chunked = roundCheckpoint(BucketCap.cap(
      fp.withColumn("chunk",
          explode(array((0 until 4).map(i =>
            struct(lit(i).as("chunk_id"),
              shiftright(col("fp"), i * 16).bitwiseAND(lit(0xffffL))
                .as("chunk_val"))): _*)))
        .select(col("id"), col("fp"), col("chunk.chunk_id"), col("chunk.chunk_val")),
      Seq("chunk_id", "chunk_val"), "id", bucketCap))
    val l = chunked.select(col("id").as("a"), col("fp").as("fpa"),
      col("chunk_id"), col("chunk_val"))
    val r = chunked.select(col("id").as("b"), col("fp").as("fpb"),
      col("chunk_id"), col("chunk_val"))
    l.join(r, Seq("chunk_id", "chunk_val"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("fpa"), col("fpb")).distinct()
      .withColumn("hamming", bit_count(col("fpa").bitwiseXOR(col("fpb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (a, b, texta, textb). */
  def ngramJaccard(pairs: DataFrame, n: Int = 3): DataFrame = {
    pairs
      .withColumn("sa", shingles(col("texta"), n))
      .withColumn("sb", shingles(col("textb"), n))
      .withColumn("jaccard", round4(
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))))
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Winnowing-fingerprint near-dup pairs: explode the rolling-hash
    * fingerprints, equi-join on hash (inverted index — the MOSS approach),
    * keep pairs sharing >= minShared fingerprints. Same bucket-join shape
    * as MinHash: O(n) map work + equi-join, no all-pairs. */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, minShared: Int = 5,
      bucketCap: Int = BucketCap.DefaultCap): DataFrame = {
    // fingerprints materialize ONCE (the minHashPairs treatment, r20):
    // the self-join reads the frame from both sides, and when the
    // optimizer picks a broadcast build (post-filter inference can hand
    // it an equi-key) the rolling-hash explode over the corpus text would
    // otherwise run twice — the narrow (id, h) checkpoint is 16 bytes/row
    // against re-fingerprinting every document
    val fp = roundCheckpoint(BucketCap.cap(
      df.select(col(idCol).as("id"),
        explode(winnowFingerprint(col(textCol), k, w)).as("h")),
      Seq("h"), "id", bucketCap))
    fp.select(col("id").as("a"), col("h"))
      .join(fp.select(col("id").as("b"), col("h")), Seq("h"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Embedding-cosine near-dup pairs, cluster-partitioned (the SemDeDup
    * shape, Abbas et al. 2023): candidates are pairs sharing a k-means
    * CELL — input rows must carry (id, embedding, cell_id), e.g. from
    * [[IvfIndex.build]] or a loaded IVF artifact — so the self-join
    * shuffles narrowly on cell_id and the quadratic blow-up is bounded
    * per cell (and capped by `bucketCap` against degenerate hot cells).
    * Exact cosine verifies inside the cell; duplicates whose members land
    * in different cells are missed, which is the published
    * recall/cost trade of the method. No all-pairs anywhere: cost is
    * O(n) assignment + sum of per-cell squares. */
  def semanticPairs(assigned: DataFrame, minCos: Double,
      bucketCap: Int = BucketCap.DefaultCap): DataFrame = {
    val capped = BucketCap.cap(
      assigned.select(col("cell_id"), col("id"), col("embedding")),
      Seq("cell_id"), "id", bucketCap)
    val l = capped.select(col("cell_id"), col("id").as("a"),
      col("embedding").as("ea"))
    val r = capped.select(col("cell_id"), col("id").as("b"),
      col("embedding").as("eb"))
    // pin a shuffle join on cell_id: BOTH sides are the corpus, so the
    // planner's size estimate must never broadcast one (fine at test SF,
    // fatal at 100 TB — every executor would hold the full index); the
    // hinted shuffle hash-partitions both sides on exactly cell_id, which
    // the upstream assignment repartition already satisfies
    l.hint("shuffle_hash").join(r, Seq("cell_id"))
      .filter(col("a") < col("b"))
      .withColumn("score", round4(vecCosine(col("ea"), col("eb"))))
      .filter(col("score") >= minCos)
      .select(col("a"), col("b"), col("cell_id"), col("score"))
  }

  /** Near-dup REMOVAL: keep the smallest id of every duplicate pair chain
    * (drop any row that appears as the larger side of a candidate pair).
    * One anti-join — the standard corpus-cleaning step after candidate
    * generation. NOTE this is the PAIRWISE rule: an id is kept iff it is
    * the smaller side of every pair it appears in, so a star a-c, b-c
    * (a<b<c, no a-b pair) keeps BOTH a and b — they were never judged
    * similar to each other. Pipelines that want ONE survivor per
    * TRANSITIVE duplicate group use [[components]] /
    * [[nearDupClusters]] instead. */
  def removeNearDups(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.8,
      bucketCap: Int = BucketCap.DefaultCap): DataFrame = {
    val drop = minHashPairs(df, idCol, textCol, minJaccard = minJaccard,
        bucketCap = bucketCap)
      .select(col("b").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** The round-boundary truncation iterative DataFrame algorithms need,
    * BOTH halves: `localCheckpoint(true)` cuts the LINEAGE (without it
    * the plan doubles per round and the driver dies on analysis), but
    * the resulting LogicalRDD INHERITS its origin's computed
    * STATISTICS — and a round built from self-joins makes sizeInBytes a
    * product of its inputs' sizes, so the inherited number's BIT-length
    * roughly quadruples per round and by ~round 12 Catalyst spends
    * minutes per round in BigInteger multiplication before hanging
    * outright (measured: 2M-bit stats after one upstream components
    * call, 44M bits three rounds later). Rebuilding the frame from the
    * checkpointed RDD resets the statistic to the default leaf estimate
    * — planning stays O(1) per round, and since the inflated stats were
    * astronomically past every broadcast threshold anyway, no join
    * strategy changes. (The public-API shape of GraphFrames'
    * AggregateMessages.getCachedDataFrame, which exists for exactly
    * this failure mode.) */
  private def roundCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    // rebuild in INTERNAL rows (r20): the external `ck.rdd` +
    // `createDataFrame` round trip decoded every row to an external Row
    // and re-encoded it on EVERY scan of the rebuilt frame — the minhash
    // signature frame alone is read from four plan branches. The internal
    // round trip keeps the checkpoint blocks' unsafe rows as-is while
    // still resetting inherited stats (fresh LogicalRDD, same leaf
    // estimate protection).
    val shim = org.apache.spark.sql.graftshim.GraftShims
    shim.internalCreateDataFrame(ck.sparkSession,
      shim.toInternalRdd(ck), ck.schema)
  }

  /** Exact min-union union-find labeling of a COLLECTED edge list — the
    * driver arm of [[components]]' threshold switch. Union-by-min keeps
    * every root the minimum of its merged set, so labels match the
    * distributed min-label operator bit-for-bit (spec-pinned by running
    * the randomized differentials through both arms). */
  private def unionFindLabels(edges: Array[org.apache.spark.sql.Row],
      ss: org.apache.spark.sql.SparkSession): DataFrame = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nx = parent(c); parent(c) = r; c = nx
      }
      r
    }
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Long]
    edges.foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      if (a != b) {
        if (!parent.contains(a)) { parent(a) = a; nodes += a }
        if (!parent.contains(b)) { parent(b) = b; nodes += b }
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
    }
    import ss.implicits._
    nodes.toSeq.map(n => (n, find(n))).toDF("id", "component")
  }

  /** CONNECTED COMPONENTS over an undirected edge list — the transitive
    * step pair-based dedup needs: candidate generators emit PAIRS, but a
    * duplicate GROUP is a component of the pair graph (a~b and b~c put
    * a and c in one group even when the LSH bands never paired them
    * directly), and keep-best-per-group curation needs the group ids.
    *
    * THRESHOLD SWITCH on the edge-set size (the searchBm25Batch
    * isinTermLimit discipline, shared with [[componentsIncremental]]'s
    * fold): a bounded probe collect decides — at or under
    * `driverFoldEdges` distinct edges the driver labels the graph
    * EXACTLY with min-union union-find ([[unionFindLabels]] —
    * microseconds, none of the per-round job overhead the iterative
    * operator pays on graphs this size); past it the distributed
    * operator runs (one wasted bounded collect, the price of deciding).
    *
    * The distributed arm is iterative MIN-LABEL propagation with
    * POINTER JUMPING: each round every node takes the min of its own
    * label, its neighbors' labels, and its label's label (label(x) ←
    * label(label(x)) — path doubling, so rounds grow with
    * log(diameter), not diameter; a 2^20-diameter chain converges
    * inside the default budget). The symmetrized edge set is
    * checkpointed ONCE before the loop (the rounds re-read a
    * materialized frame instead of re-deriving the upstream candidate
    * pipeline — an LSH bucket join — every round); each round is two
    * bounded shuffles over (id, lbl), and every round's frame is
    * EAGERLY truncated at BOTH levels ([[roundCheckpoint]]: lineage AND
    * inherited statistics — either one left growing kills the driver
    * long before data size matters). Convergence is CHECKED (one count
    * per round) and failure to converge THROWS rather than returning
    * partial labels.
    *
    * Returns (id, component) for every id incident to an edge —
    * component = the smallest id in its component. Ids with no edges
    * are their own singletons by definition and are not emitted
    * (callers coalesce on join). Self-loops are ignored. */
  def components(edges: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20, driverFoldEdges: Int = 1 << 16): DataFrame = {
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val probe = und.limit(driverFoldEdges + 1).collect()
    if (probe.length <= driverFoldEdges)
      return unionFindLabels(probe, edges.sparkSession)
    val ss = edges.sparkSession
    val sym = roundCheckpoint(und
      .union(und.select(col("b").as("a"), col("a").as("b")))
      .distinct())
    var labels = roundCheckpoint(sym.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id")))
    val labelSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lbl",
        org.apache.spark.sql.types.LongType)))
    var iters = 0
    var converged = false
    while (!converged) {
      if (iters >= maxIters)
        throw new IllegalStateException(
          s"components did not converge in $maxIters rounds — " +
            "diameter past 2^maxIters or a non-deterministic edge frame")
      val nbrMin = sym.as("e")
        .join(labels.as("l"), col("e.b") === col("l.id"))
        .groupBy(col("e.a").as("id")).agg(min(col("l.lbl")).as("nlbl"))
      // stepped stays LAZY: its plan references only the (checkpointed)
      // previous round, so the self-join below doubles a bounded plan
      // within the round — only the round boundary needs truncation
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      val jumped = stepped.as("s")
        .join(stepped.select(col("id").as("jid"), col("lbl").as("jlbl"))
          .as("j"), col("s.lbl") === col("j.jid"), "left")
        .select(col("s.id").as("id"), col("s.old").as("old"),
          least(col("s.lbl"), coalesce(col("j.jlbl"), col("s.lbl")))
            .as("lbl"))
      // CONVERGENCE RIDES THE ROUND'S OWN MATERIALIZATION: the previous
      // label is carried through the round and an accumulator counts
      // rows whose label moved while the checkpointed RDD computes — so
      // a round is ONE job, not materialize + a separate join/count
      // probe. Accumulator semantics are safe here because only
      // `changed == 0` is consumed: a retried task can inflate the
      // count (another round runs — rounds are idempotent), but a
      // successful complete pass with any change always reports > 0.
      // Rebuilding the frame from the RDD also resets inherited stats
      // ([[roundCheckpoint]]'s second half) — same BigInteger-stats
      // protection, same leaf estimate. The pass stays in INTERNAL rows
      // (`toRdd` + internalCreateDataFrame): the external-Row round trip
      // the r19 advice flagged cost one encoder conversion each way on
      // every label row every round — pure per-row overhead on a
      // corpus-scale labeling.
      val acc = ss.sparkContext.longAccumulator("componentsChanged")
      val rdd = org.apache.spark.sql.graftshim.GraftShims
        .toInternalRdd(jumped).map { r =>
        val lbl = r.getLong(2)
        if (lbl != r.getLong(1)) acc.add(1L)
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](r.getLong(0), lbl)): org.apache.spark.sql.catalyst.InternalRow
      }
      rdd.localCheckpoint()
      rdd.count() // the round's one action: materializes + fills acc
      labels = org.apache.spark.sql.graftshim.GraftShims
        .internalCreateDataFrame(ss, rdd, labelSchema)
      converged = acc.value == 0
      iters += 1
    }
    labels.select(col("id"), col("lbl").as("component"))
  }

  /** INCREMENTAL [[components]]: fold a batch of NEW edges into an
    * existing labeling WITHOUT revisiting the old edge set — the ingest
    * shape of transitive dedup at pipeline scale, where the accumulated
    * pair graph of the corpus is enormous but each ingest batch's new
    * candidate pairs are bounded. `prior` is an (id, component) labeling
    * as [[components]] returns it (component = the smallest member id —
    * in particular every component id labels itself, so (c, c) is always
    * a prior row); `newEdges` is the batch's pair frame.
    *
    * The algebra: collapse every labeled endpoint of a new edge to its
    * component id (its REPRESENTATIVE — old members need not be
    * revisited because min is associative: the min of a merged component
    * is the min over {old component ids} ∪ {new raw ids}), run the full
    * operator on the collapsed delta graph (O(batch) nodes whatever the
    * corpus size), and map the resulting relabels back over the prior
    * labeling. PLAN SHAPE: the corpus-scale prior frame is scanned
    * exactly twice and never shuffled — a broadcast LEFT-SEMI restricts
    * it to the delta's endpoints (≤ 2·|batch| rows survive), and the
    * final relabel is a map-side broadcast join of the delta-scale
    * relabel map — vs a full recompute's log-diameter rounds of
    * corpus-wide shuffles over the retained edge set. Collapsed graphs
    * at or under `driverFoldEdges` (default 2^16) are labeled
    * DRIVER-SIDE by exact min-union union-find instead of the iterative
    * operator — same semantics, none of the per-round job overhead (the
    * common ingest-batch case); larger folds run distributed. The
    * output satisfies the same self-labeling invariant as
    * [[components]], so it feeds the NEXT batch's `prior` — ingest
    * maintains the labeling by folding forever, O(batch + touched
    * components) per step. */
  def componentsIncremental(prior: DataFrame, newEdges: DataFrame,
      aCol: String, bCol: String, maxIters: Int = 20,
      driverFoldEdges: Int = 1 << 16): DataFrame = {
    val (p, relabel, newIds) =
      incrementalFoldParts(prior, newEdges, aCol, bCol, maxIters,
        driverFoldEdges)
    // the SECOND and last corpus-scale scan: map-side relabel, the
    // delta-bounded map broadcast — untouched components pass through
    val relabeled = p.join(broadcast(relabel),
        col("component") === col("oldc"), "left")
      .select(col("id"),
        coalesce(col("newc"), col("component")).as("component"))
    relabeled.unionByName(newIds)
  }

  /** DELTA form of [[componentsIncremental]] — same fold, but instead
    * of the full folded labeling it returns exactly WHAT CHANGED:
    * (changedComponents, upserts) where `changedComponents` is the
    * single-column set of prior component ids whose label moved (every
    * row of such a component must be dropped from wherever it is
    * stored) and `upserts` is the (id, component) rows to store in
    * their place — the relabeled members of changed components plus
    * previously-unlabeled ids that joined a group. A SHARDED labeling
    * store applies the pair to only the shards it touches and carries
    * every other shard by reference, so a fold's publish is O(changed
    * components + batch), not O(labels) — the full-table operator above
    * stays for consumers that want the complete frame in one plan.
    * Invariant (what makes blind shard application sound): every
    * upserted id either had no prior label row or its prior component
    * is in `changedComponents`. Cost shape matches the full fold: the
    * corpus-scale prior is scanned twice (endpoint restriction +
    * changed-row fetch), never shuffled. */
  def componentsIncrementalDelta(prior: DataFrame, newEdges: DataFrame,
      aCol: String, bCol: String, maxIters: Int = 20,
      driverFoldEdges: Int = 1 << 16): (DataFrame, DataFrame) = {
    val (p, relabel, newIds) =
      incrementalFoldParts(prior, newEdges, aCol, bCol, maxIters,
        driverFoldEdges)
    // identity relabels (a component that kept its id — e.g. its
    // minimum gained members but stayed minimal) are NOT changes: their
    // existing rows are already correct wherever they are stored
    val changed = relabel.filter(col("oldc") =!= col("newc"))
    val changedRows = p.join(broadcast(changed),
        col("component") === col("oldc"))
      .select(col("id"), col("newc").as("component"))
    (changed.select(col("oldc").as("component")),
      changedRows.unionByName(newIds.select(col("id"), col("component"))))
  }

  /** The shared body of the incremental fold: restrict the prior to the
    * delta's endpoints, collapse endpoints to representatives, label the
    * collapsed graph, split the result into the relabel map vs brand-new
    * ids. Returns (typed prior, relabel (oldc, newc), newIds rows). */
  private def incrementalFoldParts(prior: DataFrame, newEdges: DataFrame,
      aCol: String, bCol: String, maxIters: Int,
      driverFoldEdges: Int): (DataFrame, DataFrame, DataFrame) = {
    val p = prior.select(col("id").cast("long").as("id"),
      col("component").cast("long").as("component"))
    // The batch's edge set is MATERIALIZED once ([[roundCheckpoint]]):
    // it is delta-bounded by the fold contract, but its PLAN is the
    // candidate pipeline (an LSH bucket join over the corpus-scale
    // signature table), and the fold below reads it from four places
    // (endpoint set ×2, the endpoint mapping, and [[components]]'
    // threshold probe) — without the truncation each read re-ran the
    // whole candidate pipeline, which the r19 dupfold profile showed as
    // the dominant FIXED cost of a small fold (~3-4 re-evaluations of
    // the heaviest narrow scan per fold).
    val und = roundCheckpoint(newEdges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct())
    val nodes = und.select(col("a").as("n"))
      .union(und.select(col("b").as("n"))).distinct()
    // the ONE restriction scan of the corpus-scale labeling: broadcast
    // the delta's endpoint set, keep only their prior rows; eagerly
    // truncated ([[roundCheckpoint]] — lineage AND inherited stats,
    // which otherwise carry the prior plan's product into every round
    // of the reduced fold below) because it is read twice (endpoint
    // mapping + the representative set) and is delta-bounded by
    // construction
    val touched = roundCheckpoint(
      p.join(broadcast(nodes), col("id") === col("n"), "left_semi"))
    val mapped = und
      .join(touched.select(col("id").as("a"), col("component").as("ca")),
        Seq("a"), "left")
      .join(touched.select(col("id").as("b"), col("component").as("cb")),
        Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"),
        coalesce(col("cb"), col("b")).as("b"))
    // delta-scale: nodes are old component REPRESENTATIVES and brand-new
    // ids; an edge inside one old component collapses to a self-loop and
    // vanishes inside the operator. The collapsed graph is delta-BOUNDED
    // by construction, so for ingest-batch folds [[components]]'
    // threshold switch takes its driver union-find arm (the iterative
    // operator would pay log-diameter rounds of fixed per-job overhead —
    // measured ~8 s for a 30-doc batch whatever the corpus size); the
    // switch lives in the operator itself since r18, so the fold and a
    // from-scratch labeling share one decision rule.
    val reduced = components(mapped, "a", "b", maxIters, driverFoldEdges)
    // reduced ids split two ways: an old component id (some endpoint
    // mapped to it — relabel its whole component) vs a previously
    // unlabeled id (label it directly). A raw id can never collide with
    // an old component id: component ids label themselves in prior, so a
    // prior-id endpoint is always mapped, never raw.
    val reps = touched.select(col("component").as("rep")).distinct()
    val newIds = reduced.join(reps, col("id") === col("rep"), "left_anti")
      .select(col("id"), col("component"))
    val relabel = reduced
      .select(col("id").as("oldc"), col("component").as("newc"))
    (p, relabel, newIds)
  }

  /** Transitive duplicate groups of a corpus: [[minHashPairs]] candidate
    * generation → [[components]]. Returns (id, component) for every id
    * in a duplicate group of size ≥ 2 (component = the group's smallest
    * id); rows absent from the result are singletons. The keep-one-per-
    * GROUP cleaning step is then one anti-join on `id != component` —
    * strictly stronger than [[removeNearDups]]'s pairwise rule, the
    * conventional choice for aggressive corpus dedup. */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.8,
      bucketCap: Int = BucketCap.DefaultCap,
      maxIters: Int = 20): DataFrame =
    components(
      minHashPairs(df, idCol, textCol, minJaccard = minJaccard,
        bucketCap = bucketCap),
      "a", "b", maxIters)

}
