package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering of a table
  * on n columns, persisted as a stamped parquet artifact.
  *
  * The scale problem this solves: a table sorted on ONE key answers range
  * predicates on that key with tight file/row-group skipping, but a
  * predicate on any OTHER column reads everything — at 100 TB, "sorted by
  * order key, filtered by part key" is a full scan. Interleaving the bits
  * of the keys (Morton order — the curve behind Delta/Iceberg OPTIMIZE
  * ZORDER, which takes n columns; so does this) makes file locality hold
  * on EVERY clustered dimension at once: each file covers a bounded
  * n-rectangle of the key space, so parquet min/max stats skip most files
  * for a range predicate on any clustered column (each dimension's
  * per-file spread shrinks to ~files^(−1/n) of its range instead of one
  * dimension at files⁻¹ and the rest at 1).
  *
  * Everything stays inside whole-stage codegen: the Morton key is pure
  * built-in bit arithmetic (shift/mask — no UDF, no custom expression),
  * the write is `repartitionByRange(z)` + in-partition sort, and readers
  * are ordinary parquet scans that never see the z column except at rest.
  * LayoutSpec pins the locality claims (per-file spread bound on every
  * clustered dimension — 2-D and 3-D — and file pruning for a range that
  * a one-key sort cannot skip on).
  */
object Layout {

  private val Meta = "_zorder_meta"

  /** Interleave the low 16 bits of two non-negative ints: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1 (classic magic-mask
    * spread, e.g. Hacker's Delight §7-2 / the Bathouse/Morton curve).
    * Pure Column arithmetic — stays in codegen. The 2-D fast path of
    * [[mortonN]] (identical bit placement, fewer operations). */
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

  /** Grid resolution per dimension: 16 bits, narrowed only when n·bits
    * would overflow a long's positive range (n ≤ 3 keeps full 16-bit
    * grids; morton2 ≡ mortonN at n = 2 by construction). */
  private[graft] def bitsPerDim(n: Int): Int = math.min(16, 62 / n)

  /** n-way bit interleave: bit i of `cols(j)` lands at position i·n + j
    * (the [[morton2]] placement generalized — column order is the
    * significance order within each bit level). Plain shift/mask Column
    * arithmetic, one term per (column, bit): stays in codegen. */
  def mortonN(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "mortonN needs at least one column")
    val n = cols.length
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
          i * n + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Scale a numeric column from [min, max] onto a 2^bits grid. */
  private def grid(c: Column, min: Double, max: Double, bits: Int): Column = {
    val cells = (1L << bits) - 1
    val span = math.max(max - min, java.lang.Double.MIN_NORMAL)
    least(greatest(
      floor((c.cast("double") - lit(min)) / lit(span) * cells.toDouble),
      lit(0.0)), lit(cells.toDouble)).cast("long")
  }

  /** The Morton key for two columns given their value ranges (2-D fast
    * path: magic-mask spread). */
  def zValue(a: Column, aMin: Double, aMax: Double,
      b: Column, bMin: Double, bMax: Double): Column =
    morton2(grid(a, aMin, aMax, 16), grid(b, bMin, bMax, 16))

  /** The Morton key for n (column, min, max) dimensions. */
  def zValueN(dims: Seq[(Column, Double, Double)]): Column =
    dims match {
      case Seq((a, aMin, aMax), (b, bMin, bMax)) =>
        zValue(a, aMin, aMax, b, bMin, bMax)
      case _ =>
        val bits = bitsPerDim(dims.length)
        mortonN(dims.map { case (c, lo, hi) => grid(c, lo, hi, bits) }, bits)
    }

  /** Stamp carries the layout CONFIG (column list + file count) beside
    * the content facts — re-clustering the same data on different
    * columns or granularity must rebuild, not silently reuse the old
    * layout. (Colon-joined columns: the 2-column stamp is byte-identical
    * to the historical `n:colA:colB:f…` format.) */
  private def stamp(df: DataFrame, cols: Seq[String], numFiles: Int): String = {
    val (n, fp) = ArtifactMeta.fingerprint(df)
    s"$n:${cols.mkString(":")}:f$numFiles:fp$fp"
  }

  /** Write `df` z-ordered on `cols` into `numFiles` range-split files.
    * Two passes: one aggregation for all value ranges, then the clustered
    * write (`repartitionByRange` on z gives files covering disjoint z
    * ranges — i.e. bounded key-space n-rectangles — and the in-partition
    * sort tightens row groups inside each file). */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int): Unit =
    ArtifactMeta.withBuildLock(df, path) {
      writeStamped(df, cols, path, numFiles, stamp(df, cols, numFiles))
    }

  /** 2-column convenience form. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int = 32): Unit =
    writeZOrdered(df, Seq(colA, colB), path, numFiles)

  private def writeStamped(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, stampStr: String): Unit = {
    require(cols.nonEmpty, "z-order needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    if (cols.indices.exists(i => r.isNullAt(2 * i))) {
      // empty input or an all-null layout column: nothing to cluster —
      // land the rows as-is (schema preserved) rather than NPE mid-build
      df.write.mode("overwrite").parquet(path)
      ArtifactMeta.write(df, path, Meta, stampStr)
      return
    }
    val z = zValueN(cols.zipWithIndex.map { case (c, i) =>
      (col(c), r.getDouble(2 * i), r.getDouble(2 * i + 1))
    })
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
  def zOrderedIfAbsent(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int): DataFrame = {
    val s = stamp(df, cols, numFiles)
    if (!ArtifactMeta.read(df, path, Meta).contains(s))
      ArtifactMeta.withBuildLock(df, path) {
        if (!ArtifactMeta.read(df, path, Meta).contains(s))
          writeStamped(df, cols, path, numFiles, s)
      }
    df.sparkSession.read.parquet(path)
  }

  /** 2-column convenience form. */
  def zOrderedIfAbsent(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int = 32): DataFrame =
    zOrderedIfAbsent(df, Seq(colA, colB), path, numFiles)

  /** Per-file locality report: for each physical file of `table`, the
    * min/max span of `c` — the quantity parquet stats skipping works on.
    * A diagnostic aggregation (file count × 1 row), used by LayoutSpec to
    * pin the bounded-rectangle claim and available for layout audits. */
  def fileSpans(table: DataFrame, c: String): DataFrame =
    table.groupBy(input_file_name().as("file"))
      .agg(min(col(c)).cast("double").as("lo"),
        max(col(c)).cast("double").as("hi"))
}
