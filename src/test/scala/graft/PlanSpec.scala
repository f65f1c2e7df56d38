package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape assertions for the scale-critical queries: filters reach the
  * parquet scan, dims broadcast, top-k compiles to TakeOrderedAndProject,
  * aggregations are partial (map-side) — the properties ARCHITECTURE.md
  * claims, pinned in CI. */
class PlanSpec extends SparkTestBase {

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def planString(df: DataFrame): String = physical(df).toString

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  test("q01: shipdate filter is pushed to the parquet scan; agg is partial") {
    val s = planString(q("q01_pricing_summary"))
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown in:\n$s")
    assert(s.contains("partial_sum"), "no map-side partial aggregation")
  }

  test("q03: both dims join via broadcast, fact scans pruned columns") {
    val s = planString(q("q03_top_revenue"))
    assert(s.split("BroadcastHashJoin").length >= 3, "expected 2 broadcast joins")
    assert(s.contains("TakeOrderedAndProject"), "top-N should avoid a global sort")
    assert(!s.contains("SortMergeJoin"), "dims must not shuffle")
    // the FACT side must stream, never build: left alone, the planner's
    // column-pruned static estimate makes lineitem look broadcastable and
    // it builds a 20×-bigger hash relation (measured 1.18s → 0.82s)
    assert(!s.contains("BuildLeft"),
      "fact table became the hash-relation build side")
  }

  test("recall (q71): top-k compiles to TakeOrderedAndProject, no corpus shuffle") {
    val s = planString(q("q71_recall"))
    assert(s.contains("TakeOrderedAndProject"), "per-partition heap expected")
    assert(!s.contains("SortMergeJoin"), "corpus must not shuffle for recall")
  }

  test("q02: projection pruning reaches the scan (ReadSchema is narrow)") {
    val s = planString(q("q02_filter_pushdown"))
    val read = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"))
    assert(!read.contains("l_partkey") && !read.contains("l_tax"),
      s"scan reads unused columns: $read")
  }

  test("default bucket cap compiles to map-side WindowGroupLimit before the exchange") {
    // Spark 4 rewrites the rn<=cap filter into WindowGroupLimit pushed
    // BELOW the shuffle — each mapper keeps at most cap rows per bucket
    // before anything moves. This is the property that makes the skew
    // guard nearly free; pin it so a refactor can't silently lose it.
    // Pinned on the DEFAULT-capped operator (the oracle query q42 runs
    // its completeness leg uncapped — BucketCap.Uncapped passthrough).
    val capped = graft.ops.Dedup.minHashPairs(
      graft.queries.DedupQueries.withMutants(spark, sfDir),
      "doc_id", "text", minJaccard = 0.5)
    val s = physical(capped).toString
    assert(s.contains("WindowGroupLimit"), "bucket cap lost its group-limit pushdown")
    assert(!s.contains("CartesianProduct"))
    // and the uncapped oracle leg stays cartesian-free too
    assert(!planString(q("q42_dedup_minhash")).contains("CartesianProduct"))
  }

  test("no CartesianProduct or ScalaUDF in any query plan (q33 cartesian excepted)") {
    // q33 bounds its corpus to 300 rows before the (guarded) all-pairs op;
    // everything else must be hash/broadcast/bucket joins at any scale.
    // And no plan may fall back to a ScalaUDF: every custom function is a
    // codegen Expression — a UDF in a hot path breaks whole-stage codegen
    // and serializes per row.
    val (cartesian, udfs) = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val s = planString(q(name))
      (if (s.contains("CartesianProduct") && name != "q33_top_pairs") Some(name)
       else None,
       if (s.contains("ScalaUDF")) Some(name) else None)
    }.unzip
    assert(cartesian.flatten.isEmpty,
      s"cartesian joins in: ${cartesian.flatten.mkString(", ")}")
    assert(udfs.flatten.isEmpty,
      s"ScalaUDF fallback in: ${udfs.flatten.mkString(", ")}")
  }

  test("q54: vocabulary top-k avoids a global sort; agg is partial") {
    val s = planString(q("q54_vocab"))
    assert(s.contains("TakeOrderedAndProject"), "top-20 should be a heap")
    assert(s.contains("partial_count"), "no map-side partial aggregation")
  }

  test("q48: packing runs on one windowed data shuffle plus broadcast offsets") {
    val s = planString(q("q48_pack_bins"))
    assert(s.contains("Window"), "prefix sum should be a partitioned window")
    assert(s.contains("BroadcastExchange"), "offsets must broadcast")
    // window exchange + summary agg exchange + final sort — nothing else
    assert(s.split("\\bExchange\\b").length - 1 <= 3,
      s"unexpected extra shuffles in:\n$s")
    assert(!s.contains("SortMergeJoin"), "the offsets join must not shuffle")
  }

  test("q38: at-rest bucketed join has no exchange or sort below the join") {
    val joined = graft.queries.ScaleQueries.q38BucketedJoin(spark, sfDir)
    val smjs = physical(joined).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smjs.nonEmpty, "bucketed join did not compile to SortMergeJoin")
    // Only the EXCHANGE matters for the scale claim: Spark ≥3.1 does not
    // propagate bucket sort order from the scan (legacy
    // bucketedTableScan.outputOrdering flag), so the SMJ keeps cheap
    // LOCAL per-bucket sorts — no data movement, partition-local work.
    smjs.foreach(_.children.foreach(_.foreach { n =>
      assert(!n.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec],
        s"exchange below the bucketed join:\n${physical(joined)}")
    }))
    // and the full q38 keeps the join exchange-free (only agg/sort above)
    val s = planString(q("q38_bucketed_join"))
    assert(s.contains("SortMergeJoin"), s"q38 lost the merge join:\n$s")
  }

  test("q16: as-of is a window over one user shuffle — no join, no range cross-product") {
    val s = planString(q("q16_asof"))
    assert(s.contains("Window"), s"as-of lost its window form:\n$s")
    assert(!s.contains("Join"), s"as-of must not join:\n$s")
    assert(!s.contains("CartesianProduct"), s"range cross-product in q16:\n$s")
    // one hash exchange for the window partitioning (plus the final sort's
    // range exchange) — nothing else moves data
    assert(s.split("Exchange hashpartitioning").length - 1 == 1,
      s"as-of should shuffle ONCE on the partition key:\n$s")
  }

  test("q70: fact scan is dynamically partition-pruned through the dim join") {
    val joined = graft.queries.ScaleQueries.q70DppJoin(spark, sfDir)
    // recurse into AQE query stages: after execution the scans live inside
    // QueryStageExec wrappers, which plain collect treats as leaves
    def factScans(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          factScans(q.plan)
        case sc: org.apache.spark.sql.execution.FileSourceScanExec
            if sc.relation.location.rootPaths.exists(
              _.toString.contains("graft_q70_dpp_")) => Seq(sc)
      }.flatten
    val scans = factScans(physical(joined))
    assert(scans.nonEmpty, "q70 lost the partitioned fact scan")
    scans.foreach { sc =>
      assert(sc.partitionFilters.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
          .DynamicPruningExpression])),
        s"fact scan has no dynamic pruning filter:\n$sc")
    }
    // the runtime filter must actually prune: 1996-Q1 order months are a
    // strict subset of lineitem's ship months. Execute THIS Dataset (so the
    // metrics land on this QueryExecution's scan nodes — a count() would
    // plan a fresh one) and read the scan's partition metric off the FINAL
    // adaptive plan.
    joined.collect()
    val executed = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val ranScans = factScans(executed)
    assert(ranScans.nonEmpty, "executed plan lost the partitioned fact scan")
    val pruned = ranScans.head.metrics.get("numPartitions").map(_.value)
    assert(pruned.nonEmpty, "fact scan reports no numPartitions metric — " +
      "the pruning assertion below would be vacuous")
    val total = new java.io.File(
      ranScans.head.relation.location.rootPaths.head.toUri.getPath)
      .listFiles().count(_.getName.startsWith("l_shipmonth="))
    pruned.foreach(p => assert(p > 0 && p < total,
      s"dynamic pruning read $p of $total partitions (expected 0 < p < total)"))
  }

  test("q37: batch IVF probe joins broadcast — no corpus shuffle, no cartesian") {
    val s = planString(q("q37_ivf_batch"))
    assert(!s.contains("CartesianProduct"), s"cartesian in q37:\n$s")
    assert(s.contains("BroadcastHashJoin"),
      s"probe set did not broadcast into the index scan:\n$s")
  }

  test("q39: ADC top-k is a bounded TakeOrdered over the codes scan — no shuffle, no join") {
    val s = planString(q("q39_pq_adc"))
    assert(s.contains("TakeOrderedAndProject"),
      s"ADC top-k did not compile to TakeOrderedAndProject:\n$s")
    assert(!s.contains("Join"), s"flat ADC must not join:\n$s")
    assert(!s.contains("Exchange hashpartitioning"),
      s"flat ADC must not hash-shuffle the codes:\n$s")
  }

  test("q69: batch ADC probe joins broadcast — no corpus shuffle, no cartesian") {
    val s = planString(q("q69_pq_batch"))
    assert(!s.contains("CartesianProduct"), s"cartesian in q69:\n$s")
    assert(s.contains("BroadcastHashJoin"),
      s"probe set did not broadcast into the codes scan:\n$s")
  }

  test("q49: stratified sample is a pure scan predicate (no join, no agg)") {
    val s = planString(q("q49_stratified_sample"))
    assert(!s.contains("Join"), "sampleBy-equivalent must not join")
    assert(!s.contains("HashAggregate"), "sampling must not aggregate")
  }

  test("q88: explicit-values pivot is ONE hash agg — no domain-discovery pass") {
    val s = planString(q("q88_pivot"))
    // Spark's explicit-values pivot = two stacked hash aggs ((priority,
    // status) partials, then pivot-first by priority) — two agg exchanges
    // + the final sort's, and crucially NO separate distinct-collect job
    // to discover the pivot domain (that's the values-less form's cost)
    assert(s.contains("HashAggregate"), s"pivot lost its hash agg:\n$s")
    assert(!s.contains("Join"), s"pivot must not join:\n$s")
    assert(s.split("Exchange").length <= 4,
      s"pivot grew an unexpected exchange:\n$s")
  }

  test("q89: unpivot is a narrow Expand — no extra shuffle for the melt") {
    val s = planString(q("q89_unpivot"))
    assert(s.contains("Expand"), s"unpivot did not compile to Expand:\n$s")
    // exchanges: the agg's and the final sort's — the melt itself adds none
    assert(s.split("Exchange").length <= 3,
      s"unpivot added an unexpected exchange:\n$s")
  }

  test("q86: semantic dedup self-join is a pinned shuffle join on cell_id") {
    val s = planString(q("q86_semdedup"))
    assert(s.contains("ShuffledHashJoin") || s.contains("SortMergeJoin"),
      s"cell self-join must shuffle, not broadcast a corpus side:\n$s")
    assert(!s.contains("BroadcastHashJoin"),
      s"planner broadcast a corpus side of the cell self-join:\n$s")
    assert(!s.contains("CartesianProduct"), s"cartesian in q86:\n$s")
  }

  test("entry: normalized-cosine rule rewrote scoring to vec_dot") {
    val s = planString(SparkEntry.entry(spark))
    assert(s.contains("vec_dot"), s"expected vec_dot in entry plan")
    assert(!s.contains("vec_cosine"), "cosine should have been rewritten")
  }
}
