package graft

import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, DotProduct}
import graft.functions.GraftFunctions._
import graft.plans.GraftOptimizations

/** The NormalizedCosineToDot rule: fires only on provably-normalized
  * inputs, preserves results. */
class OptimizationSpec extends SparkTestBase {

  private def hasExpr(df: org.apache.spark.sql.DataFrame,
      pred: org.apache.spark.sql.catalyst.expressions.Expression => Boolean): Boolean = {
    var found = false
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(
      _.foreach(e => if (pred(e)) found = true)))
    found
  }

  test("cosine over two embed calls rewrites to dot") {
    GraftOptimizations.install(spark)
    val docs = Tables(spark, sfDir, "documents").limit(100)
    val df = docs.select(col("doc_id"),
      vecCosine(embedText(col("text")), embedText(lit("query text"))).as("s"))
    assert(hasExpr(df, _.isInstanceOf[DotProduct]))
    assert(!hasExpr(df, _.isInstanceOf[CosineSimilarity]))
  }

  test("cosine over a raw column does NOT rewrite") {
    GraftOptimizations.install(spark)
    val emb = Tables(spark, sfDir, "embeddings").limit(10)
    val df = emb.select(
      vecCosine(col("embedding"), col("embedding")).as("s"))
    assert(hasExpr(df, _.isInstanceOf[CosineSimilarity]))
    assert(!hasExpr(df, _.isInstanceOf[DotProduct]))
  }

  test("rewritten scores match unrewritten to 4 decimals") {
    val docs = Tables(spark, sfDir, "documents").limit(200)
    def scores(s: org.apache.spark.sql.SparkSession) =
      docs.select(col("doc_id"),
          round(vecCosine(embedText(col("text")),
            embedText(lit("fast table scan"))), 4).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // session already has the rule installed from prior tests; compare the
    // rewritten plan's output against kernel-level ground truth
    GraftOptimizations.install(spark)
    val got = scores(spark)
    val qv = graft.functions.VectorKernels.hashEmbedFloats("fast table scan", 384)
    val texts = docs.select("doc_id", "text").collect()
    texts.foreach { r =>
      val dv = graft.functions.VectorKernels.hashEmbedFloats(r.getString(1), 384)
      val dot = dv.zip(qv).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(dv.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(qv.map(x => x.toDouble * x).sum)
      val cos = if (na <= 1e-12 || nb <= 1e-12) 0.0 else dot / (na * nb)
      assert(math.abs(got(r.getLong(0)) - math.round(cos * 10000.0) / 10000.0) <= 1e-4)
    }
  }
}
