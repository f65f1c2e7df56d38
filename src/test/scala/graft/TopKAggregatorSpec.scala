package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** The bounded-heap batch-kNN path must agree exactly with the window
  * formulation (which the q32 DuckDB oracle already validates). */
class TopKAggregatorSpec extends SparkTestBase {

  test("heap top-k equals window top-k on the embeddings corpus") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 7)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val viaHeap = Similarity.bruteForceTopKBatch(emb, "vec_id", queries,
        "query_id", 5)
      .orderBy("query_id", "score", "vec_id").collect().toSeq
    val viaWindow = Similarity.topKBatchViaWindow(emb, "vec_id", queries,
        "query_id", 5)
      .orderBy("query_id", "score", "vec_id").collect().toSeq
    assert(viaHeap == viaWindow)
    assert(viaHeap.size == 35) // 7 queries x k=5
  }

  test("ties break toward smaller ids, matching orderBy(score desc, id)") {
    import spark.implicits._
    // all scores equal → top-3 must be ids 0,1,2
    val corpus = (0L to 9L).map(i => (i, Array(1.0f, 0.0f))).toDF("id", "embedding")
    val queries = Seq((0L, Array(1.0f, 0.0f))).toDF("query_id", "qv")
    val got = Similarity.bruteForceTopKBatch(corpus, "id", queries, "query_id", 3)
      .select("id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L))
  }
}
