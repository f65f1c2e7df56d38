package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Z-order layout: Morton-key correctness against a bit-twiddling
  * reference, row preservation, and the locality claims the operator
  * exists for — bounded per-file rectangles on BOTH dimensions, and file
  * pruning for a range on the dimension a one-key sort cannot skip on. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Morton interleave (bit-at-a-time, the definition). */
  private def mortonRef(a: Int, b: Int): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= ((a >> i) & 1).toLong << (2 * i) | ((b >> i) & 1).toLong << (2 * i + 1)
    z
  }

  test("morton2 matches the bit-at-a-time definition") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0, 0), (1, 0), (0, 1), (3, 3), (65535, 65535)) ++
      Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.morton2(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    for ((a, b) <- cases)
      assert(got((a, b)) == mortonRef(a, b), s"morton($a, $b)")
  }

  private def zLayout(path: String, files: Int = 16) =
    Layout.zOrderedIfAbsent(Tables(spark, sfDir, "lineitem"),
      "l_partkey", "l_suppkey", path, numFiles = files)

  private def tmpPath(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  test("mortonN matches the definition and collapses to morton2 at n=2") {
    val rnd = new scala.util.Random(11)
    def refN(vals: Seq[Int], bits: Int): Long = {
      var z = 0L
      for (j <- vals.indices; i <- 0 until bits)
        z |= ((vals(j) >> i) & 1).toLong << (i * vals.length + j)
      z
    }
    // n=2 equivalence (the curve q87 serves must be unchanged)
    val cases2 = Seq.fill(100)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val both = cases2.toDF("a", "b")
      .select(Layout.morton2(col("a"), col("b")).as("m2"),
        Layout.mortonN(Seq(col("a"), col("b")), 16).as("mn"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1),
      "mortonN(n=2) diverged from morton2"))
    // 3-D against the bit-at-a-time definition
    val cases3 = Seq.fill(100)(
      (rnd.nextInt(65536), rnd.nextInt(65536), rnd.nextInt(65536)))
    val got3 = cases3.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.mortonN(Seq(col("a"), col("b"), col("c")), 16).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3)))
      .toMap
    for ((a, b, c) <- cases3)
      assert(got3((a, b, c)) == refN(Seq(a, b, c), 16), s"mortonN($a,$b,$c)")
  }

  test("3-D layout bounds per-file spans on ALL three dimensions") {
    val files = 16
    val path = tmpPath("graft_zorder_3d")
    val dims = Seq("l_partkey", "l_suppkey", "l_quantity")
    val z = Layout.zOrderedIfAbsent(Tables(spark, sfDir, "lineitem"),
      dims, path, numFiles = files)
    // pure reordering
    val src = Tables(spark, sfDir, "lineitem")
    assert(z.count() == src.count())
    def meanNormSpan(c: String): Double = {
      val lohi = z.agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
        .head()
      val range = lohi.getDouble(1) - lohi.getDouble(0)
      Layout.fileSpans(z, c)
        .select(((col("hi") - col("lo")) / range).as("s"))
        .agg(avg("s")).head().getDouble(0)
    }
    // every clustered dimension bounded (files^(-1/3) ≈ 0.4 of the range
    // per file in the ideal cube; generous slack for real key skew)
    dims.foreach { c =>
      val s = meanNormSpan(c)
      assert(s < 0.75, s"3-D z-layout: $c files span $s of the range")
    }
    // a 3-D box touches a bounded file subset
    val box = col("l_partkey").between(50, 150) &&
      col("l_suppkey").between(0, 4) && col("l_quantity").between(1, 25)
    val touched = z.filter(box).select(input_file_name()).distinct().count()
    assert(touched < files, s"3-D box hit every one of $files files")
    assert(z.filter(box).count() > 0)
    // and the stamp carries the column list: re-clustering on different
    // columns rebuilds
    val meta = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "_zorder_meta")).trim
    dims.foreach(c => assert(meta.contains(c), s"stamp missing column $c"))
  }

  test("the layout is a pure reordering of the source rows") {
    val src = Tables(spark, sfDir, "lineitem")
    val z = zLayout(tmpPath("graft_zorder_rt"))
    assert(z.count() == src.count())
    assert(z.exceptAll(src).isEmpty && src.exceptAll(z).isEmpty)
  }

  test("per-file spans are bounded on BOTH dimensions; a one-key sort is not") {
    val files = 16
    val z = zLayout(tmpPath("graft_zorder_span"), files)
    // comparison layout: range-sorted by partkey only (the classic sort)
    val oneKeyPath = tmpPath("graft_onekey_span")
    Tables(spark, sfDir, "lineitem")
      .repartitionByRange(files, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.parquet(oneKeyPath)
    val oneKey = spark.read.parquet(oneKeyPath)
    def meanNormSpan(t: org.apache.spark.sql.DataFrame, c: String): Double = {
      val lohi = t.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      val range = lohi.getDouble(1) - lohi.getDouble(0)
      val spans = Layout.fileSpans(t, c)
        .select(((col("hi") - col("lo")) / range).as("s"))
        .agg(avg("s")).head().getDouble(0)
      spans
    }
    val zPart = meanNormSpan(z, "l_partkey")
    val zSupp = meanNormSpan(z, "l_suppkey")
    val okPart = meanNormSpan(oneKey, "l_partkey")
    val okSupp = meanNormSpan(oneKey, "l_suppkey")
    // z-order: both dims bounded (~1/sqrt(files) each, with slack)
    assert(zPart < 0.5 && zSupp < 0.5,
      s"z-layout spans not bounded: partkey=$zPart suppkey=$zSupp")
    // one-key sort: its own key is tight, the OTHER dimension is unbounded
    assert(okPart < 0.25, s"sorted layout's own key should be tight: $okPart")
    assert(okSupp > 0.9, s"comparison layout unexpectedly clustered: $okSupp")
    assert(zSupp < okSupp / 2,
      "z-order must at least halve the second dimension's file spans")
  }

  test("range predicates touch bounded file subsets of the z-layout") {
    val files = 16
    val z = zLayout(tmpPath("graft_zorder_prune"), files)
    def filesTouched(p: org.apache.spark.sql.Column): Long =
      z.filter(p).select(input_file_name()).distinct().count()
    // 2-D box (the q87 shape) — the access pattern the curve serves: a
    // ~4% box must live in a handful of bounded rectangles (sf0.001 key
    // ranges: partkey 0..199, suppkey 0..9)
    val box = col("l_partkey").between(100, 140) &&
      col("l_suppkey").between(2, 3)
    val boxTouched = filesTouched(box)
    assert(boxTouched <= files / 4,
      s"2-D box hit $boxTouched of $files z-ordered files")
    assert(z.filter(box).count() > 0)
    // single-dimension slice: the curve FRAGMENTS a thin b-slice (it
    // recursively alternates dimensions), so the win is partial — but a
    // one-key-sorted-by-partkey layout reads ALL files for this predicate
    val slice = col("l_suppkey") === 0
    val sliceTouched = filesTouched(slice)
    assert(sliceTouched < files,
      s"suppkey slice hit every one of $files z-ordered files")
    assert(z.filter(slice).count() > 0)
  }

  test("stamp: in-place content change invalidates, same content reuses") {
    import java.nio.file.{Files, Paths}
    val path = tmpPath("graft_zorder_stamp")
    val df1 = Seq((1L, 10L, "x"), (2L, 20L, "y"), (3L, 30L, "z"))
      .toDF("a", "b", "v")
    Layout.zOrderedIfAbsent(df1, "a", "b", path, numFiles = 2)
    def sig: Map[String, Long] = {
      val d = new java.io.File(path)
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val s1 = sig
    Layout.zOrderedIfAbsent(df1, "a", "b", path, numFiles = 2)
    assert(sig == s1, "identical content must not rebuild")
    val df2 = Seq((1L, 10L, "x"), (2L, 20L, "y"), (3L, 30L, "CHANGED"))
      .toDF("a", "b", "v")
    Layout.zOrderedIfAbsent(df2, "a", "b", path, numFiles = 2)
    val z = spark.read.parquet(path)
    assert(z.filter(col("v") === "CHANGED").count() == 1,
      "content change with identical count must rebuild")
    assert(Files.exists(Paths.get(path, "_zorder_meta")))
    // a GRANULARITY change on identical data must rebuild too (the stamp
    // carries the layout config, not just the content facts)
    val s2 = sig
    Layout.zOrderedIfAbsent(df2, "a", "b", path, numFiles = 3)
    assert(sig != s2, "numFiles change must rewrite the layout")
  }

  test("empty input lands as an empty stamped layout, not an NPE") {
    import java.nio.file.{Files, Paths}
    val path = tmpPath("graft_zorder_empty")
    val empty = Seq.empty[(Long, Long, String)].toDF("a", "b", "v")
    Layout.zOrderedIfAbsent(empty, "a", "b", path, numFiles = 2)
    assert(spark.read.parquet(path).isEmpty)
    assert(Files.exists(Paths.get(path, "_zorder_meta")))
  }
}
