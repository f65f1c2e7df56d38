package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering of a table
  * on two columns, persisted as a stamped parquet artifact.
  *
  * The scale problem this solves: a table sorted on ONE key answers range
  * predicates on that key with tight file/row-group skipping, but a
  * predicate on any OTHER column reads everything — at 100 TB, "sorted by
  * order key, filtered by part key" is a full scan. Interleaving the bits
  * of two keys (Morton order — the curve behind Delta/Iceberg OPTIMIZE
  * ZORDER) makes file locality hold on BOTH dimensions at once: every
  * file covers a bounded rectangle of the key space, so parquet min/max
  * stats skip most files for a range predicate on either column (each
  * dimension's per-file spread shrinks to ~√files⁻¹ of its range instead
  * of one dimension at files⁻¹ and the other at 1).
  *
  * Everything stays inside whole-stage codegen: the Morton key is pure
  * built-in bit arithmetic (shift/mask spread — no UDF, no custom
  * expression), the write is `repartitionByRange(z)` + in-partition sort,
  * and readers are ordinary parquet scans that never see the z column
  * except at rest. LayoutSpec pins the locality claims (per-file spread
  * bound on both dimensions, file pruning for a single-dimension range
  * that a one-key sort cannot skip on).
  */
object Layout {

  private val Meta = "_zorder_meta"

  /** Interleave the low 16 bits of two non-negative ints: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1 (classic magic-mask
    * spread, e.g. Hacker's Delight §7-2 / the Bathouse/Morton curve).
    * Pure Column arithmetic — stays in codegen. */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Spread a 16-bit value's bits to even positions of a 32-bit result. */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Scale a numeric column from [min, max] onto the 16-bit grid. */
  private def grid16(c: Column, min: Double, max: Double): Column = {
    val span = math.max(max - min, java.lang.Double.MIN_NORMAL)
    least(greatest(
      floor((c.cast("double") - lit(min)) / lit(span) * 65535.0), lit(0.0)),
      lit(65535.0)).cast("long")
  }

  /** The Morton key for (a, b) given their value ranges. */
  def zValue(a: Column, aMin: Double, aMax: Double,
      b: Column, bMin: Double, bMax: Double): Column =
    morton2(grid16(a, aMin, aMax), grid16(b, bMin, bMax))

  /** Stamp carries the layout CONFIG (columns + file count) beside the
    * content facts — re-clustering the same data at a different
    * granularity must rebuild, not silently reuse the old layout. */
  private def stamp(df: DataFrame, colA: String, colB: String,
      numFiles: Int): String = {
    val (n, fp) = ArtifactMeta.fingerprint(df)
    s"$n:$colA:$colB:f$numFiles:fp$fp"
  }

  /** Write `df` z-ordered on (colA, colB) into `numFiles` range-split
    * files. Two passes: one aggregation for the value ranges, then the
    * clustered write (`repartitionByRange` on z gives files covering
    * disjoint z ranges — i.e. bounded key-space rectangles — and the
    * in-partition sort tightens row groups inside each file). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int = 32): Unit =
    ArtifactMeta.withBuildLock(df, path) {
      writeStamped(df, colA, colB, path, numFiles,
        stamp(df, colA, colB, numFiles))
    }

  private def writeStamped(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int, stampStr: String): Unit = {
    val r = df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input or an all-null layout column: nothing to cluster —
      // land the rows as-is (schema preserved) rather than NPE mid-build
      df.write.mode("overwrite").parquet(path)
      ArtifactMeta.write(df, path, Meta, stampStr)
      return
    }
    val z = zValue(col(colA), r.getDouble(0), r.getDouble(1),
      col(colB), r.getDouble(2), r.getDouble(3))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    ArtifactMeta.write(df, path, Meta, stampStr)
  }

  /** Build-once lifecycle ([[IvfIndex.buildIfAbsent]]'s contract: stamp =
    * count + layout columns + content fingerprint; fresh path lock-free,
    * build arm double-checked under the artifact lock). Returns the
    * clustered table. */
  def zOrderedIfAbsent(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int = 32): DataFrame = {
    val s = stamp(df, colA, colB, numFiles)
    if (!ArtifactMeta.read(df, path, Meta).contains(s))
      ArtifactMeta.withBuildLock(df, path) {
        if (!ArtifactMeta.read(df, path, Meta).contains(s))
          writeStamped(df, colA, colB, path, numFiles, s)
      }
    df.sparkSession.read.parquet(path)
  }

  /** Per-file locality report: for each physical file of `table`, the
    * min/max span of `c` — the quantity parquet stats skipping works on.
    * A diagnostic aggregation (file count × 1 row), used by LayoutSpec to
    * pin the bounded-rectangle claim and available for layout audits. */
  def fileSpans(table: DataFrame, c: String): DataFrame =
    table.groupBy(input_file_name().as("file"))
      .agg(min(col(c)).cast("double").as("lo"),
        max(col(c)).cast("double").as("hi"))
}
