package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Layout

/** Data-layout coverage: q87 serves a 2-D range predicate off the
  * build-once Z-ordered lineitem copy ([[graft.ops.Layout]]). Correctness
  * is row equivalence against the natural table (the layout must be a
  * pure reordering); the layout CLAIMS — bounded per-file rectangles,
  * file pruning on either dimension — are LayoutSpec's pins, since
  * DuckDB sees rows, not file boundaries.
  */
object LayoutQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def zPath(dir: String): String =
    SessionHandles.tmpArtifactPath("q87_zorder", dir)

  /** Build-once / validate-once-per-session clustered copy. */
  private def zTable(s: SparkSession, dir: String): DataFrame =
    SessionHandles.cached(s, s"q87_zorder:$dir") {
      Layout.zOrderedIfAbsent(Tables(s, dir, "lineitem"),
        "l_partkey", "l_suppkey", zPath(dir))
    }

  /** 2-D range slice off the Z-ordered layout — the access pattern the
    * clustering exists for (a one-key sort would scan everything for the
    * suppkey half of this predicate). */
  private val q87ZOrder: Q = (s, dir) =>
    zTable(s, dir)
      .filter(col("l_partkey").between(100, 180) &&
        col("l_suppkey").between(10, 30))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** 3-D box slice off an n-column Z-ordered copy — the generalized
    * curve ([[Layout.mortonN]]) serving the access pattern it exists
    * for; row equivalence against the natural table, file-level claims
    * in LayoutSpec's 3-D pins. */
  private val q94ZOrder3d: Q = (s, dir) =>
    SessionHandles.cached(s, s"q94_zorder3d:$dir") {
      Layout.zOrderedIfAbsent(Tables(s, dir, "lineitem"),
        Seq("l_partkey", "l_suppkey", "l_quantity"),
        SessionHandles.tmpArtifactPath("q94_zorder3d", dir), numFiles = 32)
    }
      .filter(col("l_partkey").between(100, 180) &&
        col("l_suppkey").between(10, 30) &&
        col("l_quantity").between(5, 30))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val defs: Map[String, Q] = Map(
    "q87_zorder_slice" -> q87ZOrder,
    "q94_zorder3d_box" -> q94ZOrder3d)

  val oracles: Map[String, String] = Map(
    "q87_zorder_slice" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 180
        |  AND l_suppkey BETWEEN 10 AND 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q94_zorder3d_box" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 180
        |  AND l_suppkey BETWEEN 10 AND 30
        |  AND l_quantity BETWEEN 5 AND 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
