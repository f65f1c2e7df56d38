package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-line stamp files beside persisted artifacts (IVF index, signature
  * table, gram snapshot): an underscore-prefixed file the parquet reader
  * ignores, read/written through the path's Hadoop filesystem so the
  * freshness checks work on HDFS/object stores, not just local disk. */
private[graft] object ArtifactMeta {

  private def locate(df: DataFrame, path: String, name: String) = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    (p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration), p)
  }

  private def locateS(spark: org.apache.spark.sql.SparkSession, path: String,
      name: String) = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** First line of the stamp file, if present. */
  def read(df: DataFrame, path: String, name: String): Option[String] =
    read(df.sparkSession, path, name)

  /** [[read]] without a DataFrame in hand — lets read paths check the
    * stamp BEFORE touching any data files (so "no artifact" surfaces as
    * the designed error, not a parquet path failure). Lock-free readers
    * race marker deletes (a completed append clears its journal), so a
    * file vanishing between the exists check and the open is answered
    * the same as one already gone: None. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String,
      name: String): Option[String] = {
    val (fs, p) = locateS(spark, path, name)
    if (!fs.exists(p)) None
    else
      try {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .nextOption().map(_.trim)
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Delete a stamp/marker file (maintenance protocols invalidate the
    * stamp BEFORE touching data so a crash can never leave a gutted
    * artifact that still validates). */
  def delete(spark: org.apache.spark.sql.SparkSession, path: String,
      name: String): Unit = {
    val (fs, p) = locateS(spark, path, name)
    fs.delete(p, false)
    ()
  }

  /** [[write]] without a DataFrame in hand. */
  def write(spark: org.apache.spark.sql.SparkSession, path: String,
      name: String, stamp: String): Unit =
    writeAtomic(spark, path, name, stamp + "\n")

  /** Atomically publish `body` as `<path>/<name>`: write a sibling tmp
    * file, then rename it over the destination, so a lock-free reader
    * sees the complete old content or the complete new — never a
    * truncated or MISSING file. The rename needs care per scheme:
    * Hadoop's `AbstractFileSystem.renameInternal(…, overwrite)` default
    * (which local/`file:` URIs inherit through `DelegateToFileSystem`)
    * is DELETE-then-rename — a concurrent reader in that window finds
    * no file at all, which serving paths would misread as "no artifact"
    * (the adversarial churn spec caught exactly this). So `file:` goes
    * through java.nio ATOMIC_MOVE (POSIX rename(2), atomic overwrite);
    * HDFS keeps FileContext, whose override IS a server-side atomic
    * overwrite-rename. Writers are already serialized by the build
    * lock, so the shared tmp name cannot collide. */
  def writeAtomic(spark: org.apache.spark.sql.SparkSession, path: String,
      name: String, body: String): Unit = {
    val (fs, p) = locateS(spark, path, name)
    writeAtomicFs(fs, p, body)
  }

  /** [[writeAtomic]] for callers that already hold the (fs, path) pair —
    * same tmp-then-atomic-rename contract. */
  def writeAtomicFs(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, body: String): Unit = {
    val tmp = p.suffix(".tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (Option(fs.getUri.getScheme).contains("file"))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(p.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    else
      org.apache.hadoop.fs.FileContext
        .getFileContext(p.toUri, fs.getConf)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  // ---- append-intent journal (the Lexical `_lex_journal` protocol,
  // shared): an O(batch) append writes data files BEFORE advancing the
  // stamp, so a crash in that window would leave appended rows served
  // under the old still-valid stamp — a later buildIfAbsent over the
  // pre-append corpus would validate against an artifact holding rows
  // that corpus doesn't. The journal closes the window: write the marker
  // (carrying the stamp the append will produce) BEFORE the data delta,
  // drop it after the stamp advance. A marker whose expected stamp IS
  // live is a completed append's stale leftover (safe to drop); any
  // other marker means data and stats disagree — refuse and rebuild.

  /** Reconcile a journal before maintenance work: drops a completed
    * append's stale marker, throws on a genuinely torn artifact. */
  def journalGuard(spark: org.apache.spark.sql.SparkSession, path: String,
      journalName: String, liveStamp: String): Unit =
    read(spark, path, journalName).foreach { expected =>
      if (expected == liveStamp) delete(spark, path, journalName)
      else throw new IllegalStateException(
        s"artifact at $path has an incomplete append (journal " +
          s"$journalName) — rebuild it before appending or serving")
    }

  /** True iff a pending journal contradicts the live stamp — freshness
    * checks treat a torn artifact as stale (forcing the rebuild arm). */
  def journalTorn(spark: org.apache.spark.sql.SparkSession, path: String,
      journalName: String, liveStamp: String): Boolean =
    read(spark, path, journalName).exists(_ != liveStamp)

  /** Exclude pending-delete tombstones from an artifact read: if
    * `tombDir` exists, anti-join its ids against `df` (broadcast —
    * tombstone volume is bounded by deletes since the last physical
    * apply, which clears the table); otherwise `df` unchanged. The one
    * tombstone-exclusion implementation shared by every artifact family
    * (postings, IVF, PQ, signatures). */
  def excludeTombstones(df: DataFrame, tombDir: String,
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(tombDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) df
    else df.join(
      broadcast(spark.read
        // the tombstone table's schema is fixed by construction (the
        // id column, typed like the artifact's): declare it instead of
        // inferring — a probe racing an apply's tombstone-table delete
        // then sees empty-or-FileNotFound (documented transients), not
        // UNABLE_TO_INFER_SCHEMA over an emptied directory
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            df.schema(idCol).dataType))))
        .parquet(p.toString).select(col(idCol))),
      Seq(idCol), "left_anti")
  }

  /** Enforce the tombstone half of the append ID contract: a batch id
    * that is still PENDING delete (tombstoned, not yet physically
    * applied) must not be re-appended. The artifact still holds the old
    * rows for that id, so neither resolution of the overlap is sound
    * without a physical pass — keeping the tombstone silently anti-joins
    * the NEW rows out of every probe while the stamp advances to include
    * them (a permanent stamp/data divergence once compaction drops
    * both generations), and dropping the tombstone would resurrect the
    * OLD rows beside the new ones. So the append refuses, loudly, and
    * the caller applies deletes physically first (`applyHint`).
    *
    * O(batch) and lazy: nothing runs unless `tombDir` exists, and the
    * probe is one broadcast semi-join of the bounded tombstone set
    * against the batch, stopping at the first hit. */
  def requireNoPendingTombstones(batch: DataFrame, idCol: String,
      tombDir: String, applyHint: String): Unit = {
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(tombDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val tombs = spark.read.parquet(p.toString)
      val tid = tombs.columns.head
      val hit = batch
        .select(col(idCol).cast(tombs.schema.head.dataType).as(tid))
        .join(broadcast(tombs.select(tid)), Seq(tid), "left_semi")
        .limit(1).collect()
      if (hit.nonEmpty) throw new IllegalStateException(
        s"append batch contains id '${hit.head.get(0)}' with a pending " +
          s"delete at $tombDir — a tombstoned id may not be re-appended " +
          s"until deletes are applied physically ($applyHint): the old " +
          "rows are still present, so the append would either be masked " +
          "by the tombstone or merge both generations")
    }
  }

  /** (row count, content fingerprint) of `df` in ONE aggregation pass.
    *
    * The fingerprint is the exact decimal sum of `xxhash64` over `cols`
    * (all columns when empty) — it closes the freshness hole a bare row
    * count leaves open: data regenerated IN PLACE with an identical count
    * now invalidates the artifact, for the price of one column scan per
    * build check. Properties the stamp machinery leans on:
    *
    *  - order-independent (sum commutes — repartition/compaction of the
    *    source parquet does not change it);
    *  - ADDITIVE: fingerprint(corpus ∪ batch) = fingerprint(corpus) +
    *    fingerprint(batch), so the O(batch) append paths can advance a
    *    stored fingerprint without rescanning the corpus;
    *  - overflow-free: accumulated as decimal(38,0). Signed xxhash64
    *    values are uniform around zero, so the running sum stays ~√n·2⁶³ —
    *    astronomically far from 10³⁸ even at 100 TB row counts.
    */
  def fingerprint(df: DataFrame, cols: Seq[String] = Nil): (Long, BigInt) = {
    val hashed = (if (cols.isEmpty) df.columns.toSeq else cols).map(df(_))
    val row = df.agg(
      count(lit(1)),
      coalesce(sum(xxhash64(hashed: _*).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head()
    (row.getLong(0), BigInt(row.getDecimal(1).toBigInteger))
  }

  def write(df: DataFrame, path: String, name: String, stamp: String): Unit = {
    val (fs, p) = locate(df, path, name)
    val out = fs.create(p, true)
    try out.write((stamp + "\n").getBytes("UTF-8")) finally out.close()
  }

  /** Serialize builds/maintenance of the artifact at `path`: every
    * append and compaction runs under this lock, and every
    * check-then-build (`*IfAbsent`) takes it for the BUILD arm
    * (double-checked: the fresh-artifact fast path stays lock-free and
    * N concurrent readers validate in parallel), so two jobs racing the
    * same artifact can't double-build it, interleave parquet overwrites,
    * or clobber each other's stamp advance — the loser of the race
    * re-checks the stamp the winner wrote and reuses the artifact. JVM
    * monitor + OS file lock (`<path>.build_lock`, sibling of the artifact
    * so mode("overwrite") can't unlink it while held) on local
    * filesystems, re-entrant per thread — [[graft.PathLocks]]. */
  def withBuildLock[T](df: DataFrame, path: String)(f: => T): T =
    withBuildLock(df.sparkSession, path)(f)

  /** [[withBuildLock]] without a DataFrame in hand (maintenance entry
    * points that only know the artifact path). */
  def withBuildLock[T](spark: org.apache.spark.sql.SparkSession,
      path: String)(f: => T): T = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(hp)
    val osLock =
      if ("file" == qualified.toUri.getScheme)
        Some(java.nio.file.Paths.get(qualified.toUri.getPath + ".build_lock"))
      else None
    graft.PathLocks.exclusive(qualified.toString, osLock)(f)
  }
}
