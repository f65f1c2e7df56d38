package graft

import org.apache.spark.sql.functions._

import graft.functions.{FreqItemsAggregator, VectorKernels}

/** Sketch family: HLL accuracy, and the Misra–Gries frequent-items
  * aggregator's no-false-negative guarantee + q92's single-pass shape. */
class SketchSpec extends SparkTestBase {
  test("approx distinct is within 3x rsd of exact") {
    val r = Tables(spark, sfDir, "orders")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect()(0)
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(exact > 0)
    assert(math.abs(approx - exact) / exact <= 0.06,
      s"approx=$approx exact=$exact")
  }

  test("Misra–Gries: no false negatives above W/(k+1), size bounded by k") {
    import spark.implicits._
    // skewed weighted stream: a few heavy items in a sea of singletons,
    // spread over several partitions so BOTH reduce and merge paths run
    val rnd = new scala.util.Random(7)
    val heavy = Seq("alpha" -> 900L, "beta" -> 500L, "gamma" -> 320L)
    val noise = (0 until 3000).map(i => s"n${rnd.nextInt(2500)}" -> 1L)
    val rows = rnd.shuffle(heavy ++ noise)
    val w = rows.map(_._2).sum
    val k = 20
    val items = rows.toDS().repartition(7)
      .select(FreqItemsAggregator.frequentItems(k).toColumn)
      .head()
    assert(items.size <= k, s"sketch kept ${items.size} > k=$k items")
    heavy.filter(_._2 > w / (k + 1).toDouble).foreach { case (t, f) =>
      assert(items.contains(t), s"item $t (weight $f > W/(k+1)=${w / (k + 1)}) missing")
    }
    // exact twin on the same stream agrees with the guarantee's premise
    assert(heavy.forall(_._2 > w / (k + 1).toDouble))
  }

  test("Misra–Gries: weighted updates ≡ unit updates (same guarantee set)") {
    import spark.implicits._
    // the weighted form (feeding pre-aggregated counts) must preserve
    // membership of every above-threshold item, same as the raw stream
    val raw = (Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      (0 until 400).map(i => s"cold$i")).map(_ -> 1L)
    val aggregated = raw.groupBy(_._1).map { case (t, xs) => t -> xs.size.toLong }.toSeq
    val k = 10
    def sketch(rows: Seq[(String, Long)]) = rows.toDS().repartition(5)
      .select(FreqItemsAggregator.frequentItems(k).toColumn).head().toSet
    val w = raw.size.toDouble
    val guaranteed = aggregated.filter(_._2 > w / (k + 1)).map(_._1).toSet
    assert(guaranteed.nonEmpty)
    assert(guaranteed.subsetOf(sketch(raw)), "raw-stream sketch lost a heavy item")
    assert(guaranteed.subsetOf(sketch(aggregated)), "weighted sketch lost a heavy item")
  }

  test("q92: one tokenize pass over documents (sketch feeds off the cache)") {
    val docs = Tables(spark, sfDir, "documents").count()
    val before = VectorKernels.tokenizeCalls.get()
    val out = SparkEntry.queries("q92_freq_items")(spark, sfDir).collect()
    val cost = VectorKernels.tokenizeCalls.get() - before
    assert(cost == docs,
      s"q92 tokenized $cost times for $docs docs — the sketch pass must " +
        "consume the cached vocabulary aggregate, not re-tokenize")
    // the sketch guarantee: every exact top-5 term is in the sketch
    assert(out.length == 5)
    assert(out.forall(_.getBoolean(2)), "top-5 term missing from the sketch")
  }
}
