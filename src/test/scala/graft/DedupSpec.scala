package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.queries.DedupQueries

/** Near-dup recovery: planted mutant pairs (doc_id, doc_id+100000) must be
  * found by each candidate-generation scheme at sf0.001. */
class DedupSpec extends SparkTestBase {

  test("minhash LSH recovers planted near-dup pairs with high recall") {
    val docs = DedupQueries.withMutants(spark, sfDir)
    val planted = docs.filter(col("doc_id") >= 100000).count()
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
        numHashes = 128, bands = 32, minJaccard = 0.5)
      .filter(col("b") === col("a") + 100000).count()
    assert(planted > 0)
    // short docs mutate past the 0.5 Jaccard threshold legitimately —
    // require >= 90% recall, not exactness
    assert(pairs >= planted * 9 / 10, s"recovered $pairs of $planted planted pairs")
  }

  test("simhash banding recovers planted pairs within hamming budget") {
    val docs = DedupQueries.withMutants(spark, sfDir)
    val planted = docs.filter(col("doc_id") >= 100000).count()
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .filter(col("b") === col("a") + 100000).count()
    // simhash with hamming<=3 is stricter; expect the large majority
    assert(pairs >= planted * 7 / 10, s"recovered $pairs of $planted")
  }

  test("ngram jaccard of planted pairs is high; disjoint pairs low") {
    val docs = DedupQueries.withMutants(spark, sfDir)
    val l = docs.select(col("doc_id").as("a"), col("text").as("texta"))
    val r = docs.select(col("doc_id").as("b"), col("text").as("textb"))
    val pairs = l.join(r, col("b") === col("a") + 100000)
    val jac = Dedup.ngramJaccard(pairs).agg(min(col("jaccard"))).collect()(0)
      .getDouble(0)
    assert(jac > 0.5, s"min planted jaccard=$jac")
  }

  test("removeNearDups leaves a corpus with no remaining candidate pairs") {
    val docs = DedupQueries.withMutants(spark, sfDir)
    val cleaned = Dedup.removeNearDups(docs, "doc_id", "text", minJaccard = 0.5)
    // the larger side of every pair is dropped, so no pair can survive
    val leftover = Dedup.minHashPairs(cleaned, "doc_id", "text",
      minJaccard = 0.5).count()
    assert(leftover == 0, s"$leftover near-dup pairs survived cleaning")
    // most planted mutants are gone (short docs may miss the threshold)
    val originals = Tables(spark, sfDir, "documents").count()
    val planted = docs.count() - originals
    val mutantsLeft = cleaned.filter(col("doc_id") >= 100000).count()
    assert(mutantsLeft <= planted / 10, s"$mutantsLeft of $planted mutants survived")
  }

  test("winnowing inverted index recovers planted pairs") {
    val docs = DedupQueries.withMutants(spark, sfDir)
    val planted = docs.filter(col("doc_id") >= 100000).count()
    val recovered = Dedup.winnowPairs(docs, "doc_id", "text")
      .filter(col("b") === col("a") + 100000).count()
    assert(recovered >= planted * 9 / 10, s"recovered $recovered of $planted")
  }

  test("exact text dedup finds the exact duplicate copies") {
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"))
    val out = Dedup.exactText(docs.unionByName(copies), "doc_id", "text")
    val dupGroups = out.filter(col("n_dupes") === 2).count()
    assert(dupGroups == copies.count())
  }
}
