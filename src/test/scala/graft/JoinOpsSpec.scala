package graft

import org.apache.spark.sql.functions._

import graft.ops.JoinOps

class JoinOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns identical rows to the plain join") {
    val large = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "tag")
    val plain = large.join(small, Seq("key")).select("key", "v", "tag")
      .collect().toSet
    val salted = JoinOps.saltedJoin(large, small, "key", saltFactor = 8)
      .select("key", "v", "tag").collect().toSet
    assert(salted == plain)
    assert(plain.count(_.getString(0) == "hot") == 100)
  }

  test("co-partitioned repeated joins reuse the exchange") {
    val orders = Tables(spark, sfDir, "orders")
    val li = Tables(spark, sfDir, "lineitem")
    // disable auto-broadcast so the join genuinely shuffles
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") { // AQE hides exchanges in its wrapper node
      val (l, r) = JoinOps.coPartitioned(
        li.select(col("l_orderkey"), col("l_quantity")),
        orders.select(col("o_orderkey"), col("o_totalprice")),
        "l_orderkey", "o_orderkey", partitions = 8)
      // repartition exchanges: one per side; the join adds none
      val joined = l.join(r, l("l_orderkey") === r("o_orderkey"))
      val n = JoinOps.countExchanges(joined)
      assert(n == 2, s"expected only the 2 repartition exchanges, saw $n")
    }
  }

  test("bucketed tables join with zero exchanges and zero sorts") {
    val dir = java.nio.file.Files.createTempDirectory("bucketed")
    JoinOps.writeBucketed(
      Tables(spark, sfDir, "orders").select("o_orderkey", "o_totalprice"),
      "bk_orders", s"$dir/orders", "o_orderkey", buckets = 8)
    JoinOps.writeBucketed(
      Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity"),
      "bk_lineitem", s"$dir/lineitem", "l_orderkey", buckets = 8)
    try withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table("bk_lineitem").join(spark.table("bk_orders"),
        col("l_orderkey") === col("o_orderkey"))
      assert(JoinOps.countExchanges(joined) == 0,
        "bucketed join must not shuffle either side")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"exchange in bucketed join:\n$plan")
      // the SMJ keeps LOCAL per-bucket sorts (Spark ≥3.1 drops the scan's
      // sort-order propagation behind a legacy flag) — no data movement
      assert(plan.contains("SortMergeJoin"))
      // and it still computes the right answer
      val expected = Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_orders")
      spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    }
  }

  test("AQE splits a skewed join partition at runtime (no manual salt)") {
    // the runtime complement of saltedJoin: ARCHITECTURE claims AQE
    // handles skew for fact-fact joins — pin it. One hot key dominates the
    // left side; with the skew thresholds scaled to test size, the final
    // adaptive plan must mark the sort-merge join as a skew join.
    val hot = (1 to 50000).map(i => (1L, s"payload_$i"))
    val spread = (1 to 5000).map(i => ((i % 100 + 2).toLong, s"p_$i"))
    val left = (hot ++ spread).toDF("key", "payload")
    val right = (1 to 101).map(i => (i.toLong, s"tag_$i")).toDF("key", "tag")
    withSqlConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val joined = left.join(right, Seq("key"))
      // execute THIS Dataset (count() would plan a fresh QueryExecution
      // and leave this one's adaptive plan unexecuted — the same trap the
      // q70 metrics pin documents)
      assert(joined.collect().length == 55000)
      val executed = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      def smjs(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.joins.SortMergeJoinExec] =
        p.collect {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            smjs(q.plan)
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            Seq(j)
        }.flatten
      val joins = smjs(executed)
      assert(joins.nonEmpty, s"no SortMergeJoin in final plan:\n$executed")
      assert(joins.exists(_.isSkewJoin),
        s"AQE did not mark the skewed join (isSkewJoin=false):\n$executed")
    }
  }

  private def withSqlConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
