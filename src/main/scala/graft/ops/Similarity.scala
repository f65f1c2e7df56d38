package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Exact brute-force is the semantic baseline (the reference ranks the whole
  * index per query — memo_cli.py:291); the LSH-bucketed variant is the scale
  * path: sign-random-projection signatures computed per row (narrow), then a
  * bucket equi-join replaces the all-pairs cross product.
  */
object Similarity {

  /** Exact top-k for a single broadcast query vector. Compiles to a scan +
    * TakeOrderedAndProject — no shuffle of the corpus. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, queryVec: DataFrame,
      k: Int): DataFrame = {
    corpus.crossJoin(broadcast(queryVec))
      .withColumn("score", round(vecDot(col("embedding"), col("qv")), 4))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Exact top-k per query for a (small, broadcastable) query set:
    * broadcast-NL join, then a bounded-heap top-k aggregation
    * ([[graft.functions.TopKAgg]]) — each map partition reduces to
    * ≤ k rows per query BEFORE the shuffle, so the exchange carries
    * queries×k×partitions rows instead of corpus×queries (the window
    * row_number formulation shuffles everything). */
  def bruteForceTopKBatch(corpus: DataFrame, idCol: String,
      queries: DataFrame, queryIdCol: String, k: Int,
      scoreFn: (Column, Column) => Column = vecDot(_, _)): DataFrame =
    graft.functions.TopKAgg.perQuery(
      corpus.crossJoin(broadcast(queries))
        .withColumn("score", round(scoreFn(col("embedding"), col("qv")), 4)),
      queryIdCol, col(idCol).cast("long"), col("score"), k, outId = idCol)

  /** Window-function formulation kept for differential testing. */
  private[graft] def topKBatchViaWindow(corpus: DataFrame, idCol: String,
      queries: DataFrame, queryIdCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(desc("score"), col(idCol))
    corpus.crossJoin(broadcast(queries))
      .withColumn("score", round(vecDot(col("embedding"), col("qv")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("score"))
  }

  /** LSH-bucketed approximate near-neighbor pairs: equi-join on the SRP
    * bucket (codegen'd [[graft.functions.SrpSignature]] — per-row, narrow,
    * runs inside the scan stage at any scale), exact cosine re-rank inside
    * buckets. Returns pairs (a, b, score) with a < b and score >= minScore. */
  def lshNearDupPairs(corpus: DataFrame, idCol: String,
      minScore: Double, nBits: Int = 12,
      bucketCap: Int = BucketCap.DefaultCap): DataFrame = {
    val sig = BucketCap.cap(
      corpus
        .withColumn("bucket", srpSignature(col("embedding"), nBits))
        .select(col(idCol).as("id"), col("bucket"), col("embedding")),
      Seq("bucket"), "id", bucketCap)
    val l = sig.select(col("id").as("a"), col("bucket"),
      col("embedding").as("ea"))
    val r = sig.select(col("id").as("b"), col("bucket"),
      col("embedding").as("eb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("score", round(vecCosine(col("ea"), col("eb")), 4))
      .filter(col("score") >= minScore)
      .select(col("a"), col("b"), col("score"))
  }

  /** Hard ceiling for [[exactTopPairs]]'s quadratic self-join. */
  val ExactPairsMaxRows = 10000L

  /** Exact all-pairs top-N most similar — an oracle/correctness tool, NOT a
    * scale path: the self-join is quadratic, so the op REFUSES a corpus
    * above [[ExactPairsMaxRows]] (≈50M scored pairs) instead of silently
    * melting at 100×. Use [[lshNearDupPairs]] (bucketed, capped) + exact
    * re-rank for unbounded corpora. The count() guard is one cheap action
    * against the (necessarily small) input. */
  def exactTopPairs(corpus: DataFrame, idCol: String, topN: Int,
      maxRows: Long = ExactPairsMaxRows): DataFrame = {
    val n = corpus.count()
    require(n <= maxRows,
      s"exactTopPairs is quadratic: corpus has $n rows (limit $maxRows); " +
        "bound the input or use lshNearDupPairs + exact re-rank")
    val l = corpus.select(col(idCol).as("a"), col("embedding").as("ea"))
    val r = corpus.select(col(idCol).as("b"), col("embedding").as("eb"))
    l.join(r, col("a") < col("b"))
      .withColumn("score", round(vecDot(col("ea"), col("eb")), 4))
      .orderBy(desc("score"), col("a"), col("b"))
      .limit(topN)
      .select(col("a"), col("b"), col("score"))
  }
}
