package graft

import org.apache.spark.sql.functions._

import graft.ops.IvfIndex

/** IVF ANN quality: deterministic build and acceptable recall vs exact. */
class IvfIndexSpec extends SparkTestBase {

  test("ivf search recall@10 >= 0.5 with nprobe=4/16 cells") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(emb, "embedding", nlist = 16)
    assert(centroids.length == 16)
    val query = emb.filter(col("vec_id") === 1)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val recall = IvfIndex.recallAtK(emb, "vec_id", "embedding",
      centroids, query, k = 10, nprobe = 4)
    assert(recall >= 0.5, s"recall@10 = $recall")
    // full probe == exact
    val full = IvfIndex.recallAtK(emb, "vec_id", "embedding",
      centroids, query, k = 10, nprobe = 16)
    assert(full == 1.0, s"recall@10 with all cells probed = $full")
  }

  test("training is deterministic under the fixed seed") {
    val emb = Tables(spark, sfDir, "embeddings")
    val c1 = IvfIndex.trainCentroids(emb, "embedding", nlist = 8)
    val c2 = IvfIndex.trainCentroids(emb, "embedding", nlist = 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }
}
