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

  // r20: the batch sites moved from the typed Aggregator to the
  // TypedImperativeAggregate twin (TopKAgg — internal rows, no
  // AppendColumns/Deserialize boundary); the two must stay interchangeable.
  test("TopKAgg matches the typed Aggregator on random grouped data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(7).toLong, i.toLong, math.rint(rnd.nextDouble() * 100) / 100)
    }
    // many partitions → partial buffers serialize + merge across the exchange
    val df = rows.toDF("qid", "id", "score").repartition(13)
    val viaAgg = graft.functions.TopKAgg.perQuery(
        df, "qid", col("id"), col("score"), 9, outId = "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val typed = graft.functions.TopKAggregator.topK(9).toColumn
    val viaTyped = df.select(col("qid").as[Long],
        struct(col("id").as("_1"), col("score").as("_2")).as[(Long, Double)])
      .groupByKey(_._1).mapValues(_._2).agg(typed.name("topk"))
      .flatMap { case (q, hits) => hits.map(h => (q, h._1, h._2)) }
      .collect().toSet
    assert(viaAgg == viaTyped)
  }

  test("TopKAgg output rides sorted (score desc, id asc) within each group") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 3L, 0.9), (1L, 4L, 0.9), (1L, 8L, 0.7))
      .toDF("qid", "id", "score")
    val arr = df.groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.column(col("id"), col("score"), 3).as("topk"))
      .select(col("topk")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(arr == Seq((3L, 0.9), (4L, 0.9), (8L, 0.7)))
  }

  test("TopKAgg keeps fewer than k when the group is small") {
    import spark.implicits._
    val df = Seq((1L, 2L, 0.1)).toDF("qid", "id", "score")
    val out = graft.functions.TopKAgg.perQuery(
      df, "qid", col("id"), col("score"), 5, outId = "id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 2L, 0.1)))
  }
}
