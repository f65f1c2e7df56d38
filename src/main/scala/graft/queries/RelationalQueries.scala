package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.round2

/** Relational operator coverage (SURVEY.md §2.8): scans, filters,
  * aggregation, joins of every flavor, windows, rollup/cube, set ops,
  * distinct, sort/limit/offset. Every query here is deterministic (explicit
  * ORDER BY with unique tiebreaks) and has a DuckDB oracle; doubles are
  * rounded on both sides so hash-compare is stable.
  *
  * Scale notes per query are in the Scaladoc of each entry — small dims are
  * broadcast, aggregations are partial (map-side) by construction, and every
  * filter/projection sits directly on the parquet scan so Catalyst pushes
  * it down.
  */
object RelationalQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary: single scan, partial agg, tiny result. */
  private val q01PricingSummary: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round2(sum(col("l_quantity"))).as("sum_qty"),
        round2(sum(col("l_extendedprice"))).as("sum_base_price"),
        round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_price"),
        round2(avg(col("l_quantity"))).as("avg_qty"),
        round2(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Filter + projection pushed to the parquet scan; top-N net revenue. */
  private val q02FilterPushdown: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-02-01") && col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"),
        // round2 = floor(x*100+0.5)/100: identical IEEE ops in both engines,
        // so no HALF_UP-vs-binary rounding-boundary drift vs the oracle
        round2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
      .orderBy(desc("net"), col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  /** TPC-H Q3-style: filtered dim ⨝ fact ⨝ fact, grouped revenue top-N.
    * customer is small → broadcast; orders⨝lineitem shuffles on orderkey. */
  private val q03TopRevenue: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(s, dir, "orders")
    val li = Tables(s, dir, "lineitem")
    // Join ORDER matters here and Catalyst won't reorder it without CBO
    // stats: the segment filter reaches orders only THROUGH the customer
    // join, so joining orders⨝customer first shrinks the side that meets
    // lineitem ~5× (one segment of order keys). The broadcast hint on
    // that side matters too — the static planner can't size a join
    // OUTPUT, and its column-pruned estimate of the fact scan looks
    // smaller, so left alone it builds the hash relation out of the
    // whole FACT table (measured 20× more build rows). Joining
    // lineitem⨝orders first (the naive order) is worse still: the full
    // fact shuffles before a single row is filtered. At 100 TB one
    // segment of order keys outgrows a broadcast — drop the hint there
    // and this degrades to a shuffle join on the 5×-shrunk side.
    val buildingOrders = ord.join(broadcast(cust),
      ord("o_custkey") === cust("c_custkey"))
      .select(ord("o_orderkey"))
    li.join(broadcast(buildingOrders), li("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** Broadcast-join a small dim (part) into the fact scan; agg by brand. */
  private val q04BrandRevenue: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val part = Tables(s, dir, "part")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** Multi-way dim chain: region ⨝ nation ⨝ customer ⨝ orders (all dims
    * broadcast; only orders is large). */
  private val q05RegionOrders: Q = (s, dir) => {
    val region = Tables(s, dir, "region")
    val nation = Tables(s, dir, "nation")
    val cust = Tables(s, dir, "customer")
    val ord = Tables(s, dir, "orders")
    ord
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"),
        round2(sum(col("o_totalprice"))).as("total"))
      .orderBy(col("r_name"))
  }

  /** Left-semi join (EXISTS): customers having a >450k order. */
  private val q06SemiJoin: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer")
    val big = Tables(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
    cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no orders at all. */
  private val q07AntiJoin: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer")
    val ord = Tables(s, dir, "orders")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Window top-1-per-group: each customer's largest order. */
  private val q08WindowTopOrder: Q = (s, dir) => {
    val ord = Tables(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        round2(col("o_totalprice")).as("top_price"))
      .orderBy(col("o_custkey"))
  }

  /** Rollup on (returnflag, linestatus) with subtotal + grand-total rows. */
  private val q09Rollup: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round2(sum(col("l_quantity"))).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))
  }

  /** Cube on (orderstatus, orderpriority). */
  private val q10Cube: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"))
      .orderBy(col("status"), col("priority"))
  }

  /** DISTINCT projection. */
  private val q11Distinct: Q = (s, dir) => {
    Tables(s, dir, "customer")
      .select(col("c_mktsegment")).distinct().orderBy(col("c_mktsegment"))
  }

  /** INTERSECT: customers with both an open and a finished order. */
  private val q12Intersect: Q = (s, dir) => {
    val ord = Tables(s, dir, "orders")
    val o = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val f = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    o.intersect(f).orderBy(col("o_custkey"))
  }

  /** EXCEPT: customers with an open order but no pending order. */
  private val q13Except: Q = (s, dir) => {
    val ord = Tables(s, dir, "orders")
    val o = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val p = ord.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
    o.except(p).orderBy(col("o_custkey"))
  }

  /** ORDER BY + OFFSET + LIMIT pagination (TakeOrderedAndProject). */
  private val q14SortPage: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), round2(col("o_totalprice")).as("price"))
      .orderBy(desc("price"), col("o_orderkey"))
      .offset(10).limit(20)
  }

  /** Equi + range (theta) join: lineitems priced far off part list price. */
  private val q15RangeJoin: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val part = Tables(s, dir, "part")
    li.join(broadcast(part),
        li("l_partkey") === part("p_partkey") &&
          li("l_extendedprice") > part("p_retailprice") * 30.0)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_rich"))
      .orderBy(col("p_brand"))
  }

  /** As-of join via union + window: for each error event, the most recent
    * prior purchase ts of the same user (no cross join, single shuffle by
    * user_id — the scalable as-of pattern). */
  private val q16AsOf: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("purchase_ts",
        when(col("event_type") === "purchase", col("ts")))
      .withColumn("asof_ts", max(col("purchase_ts")).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("last_purchase"))
      .orderBy(col("event_id"))
  }

  /** Skew-spreading salted join (same rows as the plain join — oracle
    * proves equivalence; the salt only changes the physical distribution). */
  private val q17SaltedJoin: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val part = Tables(s, dir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    graft.ops.JoinOps.saltedJoin(li, part, "l_partkey", saltFactor = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), round2(sum(col("l_quantity"))).as("qty"))
      .orderBy(col("p_brand"))
  }

  /** Deterministic ~10% hash sample: keep rows whose md5(key) falls under
    * a fixed hex threshold. This is the sampling a training pipeline should
    * use — the selected set is a pure function of the KEY (reproducible
    * across runs, partitionings, and engines — which also makes it
    * DuckDB-oracle-able), unlike `DataFrame.sample`, whose seeded draw
    * depends on partition layout. Bernoulli `.sample` stays in use where
    * per-run sampling is wanted (quantizer training, IvfIndex). */
  private val q18Sample: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 2) < "1a")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  /** HLL sketch distinct count checked against the exact count. The raw
    * estimate is engine-specific (not oracle-able), so the query emits the
    * exact count (hash-verified) plus the sketch's relative-error bound as a
    * boolean — the HLL still runs end-to-end and the oracle pins both
    * (rsd 0.02 ⇒ observed error ≤0.6% at every test SF; 5% is ~2.5σ). The
    * tighter statistical properties stay asserted in SketchSpec. */
  private val q19ApproxDistinct: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
        countDistinct(col("o_custkey")).as("exact"))
      .select(col("exact"),
        (abs(col("approx") - col("exact")) <= col("exact") * 0.05)
          .as("hll_within_5pct"))
  }

  /** TPC-H Q17 shape: correlated per-part average pushed through a self
    * aggregation + join (Catalyst rewrites the correlation to one shuffle). */
  private val q80SmallQty: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg"))
    li.join(avgQty, li("l_partkey") === avgQty("ap_partkey"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg(round2(sum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** GROUP BY ... HAVING: customers with more than 15 orders. */
  private val q81Having: Q = (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round2(sum(col("o_totalprice"))).as("total"))
      .filter(col("n_orders") > 15)
      .orderBy(col("o_custkey"))

  /** Join after aggregation: order details for the top-10 spend customers
    * (the aggregated side is tiny → broadcast into the fact scan). */
  private val q82TopCustOrders: Q = (s, dir) => {
    val ord = Tables(s, dir, "orders")
    val top = ord.groupBy(col("o_custkey").as("top_custkey"))
      .agg(round2(sum(col("o_totalprice"))).as("spend"))
      .orderBy(desc("spend"), col("top_custkey")).limit(10)
    ord.join(broadcast(top), ord("o_custkey") === top("top_custkey"))
      .select(col("o_custkey"), col("o_orderkey"),
        round2(col("o_totalprice")).as("price"), col("spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Exact interpolated percentiles per group (single-pass sort-based agg;
    * both engines use linear interpolation → oracle-comparable). */
  private val q83Percentiles: Q = (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        // floor-form rounding (see q02): cross-engine-exact at boundaries
        (floor(expr("percentile(l_extendedprice, 0.25)") * 100.0 + 0.5) / 100.0)
          .as("p25"),
        (floor(expr("percentile(l_extendedprice, 0.5)") * 100.0 + 0.5) / 100.0)
          .as("p50"),
        (floor(expr("percentile(l_extendedprice, 0.75)") * 100.0 + 0.5) / 100.0)
          .as("p75"))
      .orderBy(col("l_returnflag"))

  /** The percentile SCALE path (q19's pattern on quantiles): exact
    * interpolated percentiles are a sort-based agg — at 100 TB the thing
    * you can no longer afford — while `approx_percentile` is a mergeable
    * quantile sketch (fixed memory, map-side partials). The sketch
    * estimate is engine-specific (not oracle-able), so the query emits the
    * exact values (hash-verified) plus the sketch's relative error as
    * booleans, keeping the approximation's quality visible to the harness
    * while the sketch runs end-to-end. */
  private val q84ApproxPercentiles: Q = (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        (floor(expr("percentile(l_extendedprice, 0.5)") * 100.0 + 0.5) / 100.0)
          .as("p50"),
        (floor(expr("percentile(l_extendedprice, 0.95)") * 100.0 + 0.5) / 100.0)
          .as("p95"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("ap95"))
      .select(col("l_returnflag"), col("p50"), col("p95"),
        (abs(col("ap50") - col("p50")) <= col("p50") * 0.01)
          .as("sketch_p50_within_1pct"),
        (abs(col("ap95") - col("p95")) <= col("p95") * 0.01)
          .as("sketch_p95_within_1pct"))
      .orderBy(col("l_returnflag"))

  /** Pivot (long → wide): per-priority revenue split by order status.
    * Spark compiles `pivot` with EXPLICIT values into one hash aggregation
    * over conditional partials — no second pass to discover the pivot
    * domain, which is the form that scales (a values-less pivot adds a
    * distinct-collect job before the agg can even be planned). */
  private val q88Pivot: Q = (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice")))
      .select(col("o_orderpriority"), round2(col("F")).as("F"),
        round2(col("O")).as("O"), round2(col("P")).as("P"))
      .orderBy(col("o_orderpriority"))

  /** Unpivot (wide → long): per-flag measures melted to (measure, value)
    * rows — `Dataset.unpivot` plans as a generator projection (Expand), a
    * narrow map-side op: rows fan out 3× with no shuffle. */
  private val q89Unpivot: Q = (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round2(sum(col("l_quantity"))).as("sum_qty"),
        round2(sum(col("l_extendedprice"))).as("sum_price"),
        round2(sum(col("l_discount"))).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))

  val defs: Map[String, Q] = Map(
    "q17_salted_join" -> q17SaltedJoin,
    "q18_sample" -> q18Sample,
    "q88_pivot" -> q88Pivot,
    "q89_unpivot" -> q89Unpivot,
    "q19_approx_distinct" -> q19ApproxDistinct,
    "q80_small_qty" -> q80SmallQty,
    "q81_having" -> q81Having,
    "q82_top_cust_orders" -> q82TopCustOrders,
    "q83_percentiles" -> q83Percentiles,
    "q84_approx_percentiles" -> q84ApproxPercentiles,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_filter_pushdown" -> q02FilterPushdown,
    "q03_top_revenue" -> q03TopRevenue,
    "q04_brand_revenue" -> q04BrandRevenue,
    "q05_region_orders" -> q05RegionOrders,
    "q06_semi_join" -> q06SemiJoin,
    "q07_anti_join" -> q07AntiJoin,
    "q08_window_top_order" -> q08WindowTopOrder,
    "q09_rollup" -> q09Rollup,
    "q10_cube" -> q10Cube,
    "q11_distinct" -> q11Distinct,
    "q12_intersect" -> q12Intersect,
    "q13_except" -> q13Except,
    "q14_sort_page" -> q14SortPage,
    "q15_range_join" -> q15RangeJoin,
    "q16_asof" -> q16AsOf,
  )

  val oracles: Map[String, String] = Map(
    "q88_pivot" ->
      """SELECT o_orderpriority,
        |  floor(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)
        |    * 100.0 + 0.5) / 100.0 AS F,
        |  floor(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END)
        |    * 100.0 + 0.5) / 100.0 AS O,
        |  floor(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END)
        |    * 100.0 + 0.5) / 100.0 AS P
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q89_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS sum_qty,
        |    floor(sum(l_extendedprice) * 100.0 + 0.5) / 100.0 AS sum_price,
        |    floor(sum(l_discount) * 100.0 + 0.5) / 100.0 AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', sum_price FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_disc', sum_disc FROM w
        |ORDER BY l_returnflag, measure""".stripMargin,
    // the HLL estimate itself is engine-specific; the exact count is
    // hash-verified and the estimate's 5% error bound is pinned as a boolean
    "q19_approx_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS exact,
        | TRUE AS hll_within_5pct
        |FROM orders""".stripMargin,
    // md5 is identical in both engines, so the hash-sampled row set is exact
    "q18_sample" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
        |ORDER BY o_orderkey""".stripMargin,
    "q17_salted_join" ->
      """SELECT p_brand, count(*) AS n, floor((sum(l_quantity))*100.0 + 0.5)/100.0 AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q80_small_qty" ->
      """SELECT floor((sum(l_extendedprice) / 7.0)*100.0 + 0.5)/100.0 AS avg_yearly
        |FROM lineitem l
        |JOIN (SELECT l_partkey AS ap_partkey,
        |        avg(l_quantity) * 0.5 AS half_avg
        |      FROM lineitem GROUP BY l_partkey) a
        |  ON l.l_partkey = a.ap_partkey
        |WHERE l.l_quantity < a.half_avg""".stripMargin,
    "q81_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | floor((sum(o_totalprice))*100.0 + 0.5)/100.0 AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) > 15
        |ORDER BY o_custkey""".stripMargin,
    "q83_percentiles" ->
      """SELECT l_returnflag,
        | floor(quantile_cont(l_extendedprice, 0.25)*100.0 + 0.5)/100.0 AS p25,
        | floor(quantile_cont(l_extendedprice, 0.5)*100.0 + 0.5)/100.0 AS p50,
        | floor(quantile_cont(l_extendedprice, 0.75)*100.0 + 0.5)/100.0 AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the sketch estimate itself is engine-specific; the oracle pins the
    // exact values and that the sketch landed inside its error bound
    "q84_approx_percentiles" ->
      """SELECT l_returnflag,
        | floor(quantile_cont(l_extendedprice, 0.5)*100.0 + 0.5)/100.0 AS p50,
        | floor(quantile_cont(l_extendedprice, 0.95)*100.0 + 0.5)/100.0 AS p95,
        | TRUE AS sketch_p50_within_1pct,
        | TRUE AS sketch_p95_within_1pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q82_top_cust_orders" ->
      """WITH top AS (
        |  SELECT o_custkey AS top_custkey,
        |    floor((sum(o_totalprice))*100.0 + 0.5)/100.0 AS spend
        |  FROM orders GROUP BY o_custkey
        |  ORDER BY spend DESC, top_custkey LIMIT 10)
        |SELECT o_custkey, o_orderkey, floor((o_totalprice)*100.0 + 0.5)/100.0 AS price, spend
        |FROM orders JOIN top ON o_custkey = top_custkey
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | floor((sum(l_quantity))*100.0 + 0.5)/100.0 AS sum_qty,
        | floor((sum(l_extendedprice))*100.0 + 0.5)/100.0 AS sum_base_price,
        | floor((sum(l_extendedprice*(1-l_discount)))*100.0 + 0.5)/100.0 AS sum_disc_price,
        | floor((avg(l_quantity))*100.0 + 0.5)/100.0 AS avg_qty,
        | floor((avg(l_discount))*100.0 + 0.5)/100.0 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber,
        | floor(l_extendedprice*(1-l_discount)*100.0 + 0.5)/100.0 AS net
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
        |  AND l_discount >= 0.05
        |ORDER BY net DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q03_top_revenue" ->
      """SELECT o_orderkey,
        | floor((sum(l_extendedprice*(1-l_discount)))*100.0 + 0.5)/100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q04_brand_revenue" ->
      """SELECT p_brand,
        | floor((sum(l_extendedprice*(1-l_discount)))*100.0 + 0.5)/100.0 AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q05_region_orders" ->
      """SELECT r_name, count(*) AS n_orders,
        | floor((sum(o_totalprice))*100.0 + 0.5)/100.0 AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q08_window_top_order" ->
      """SELECT o_custkey, o_orderkey, floor((o_totalprice)*100.0 + 0.5)/100.0 AS top_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q09_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf,
        | coalesce(l_linestatus,'ALL') AS ls,
        | count(*) AS n, floor((sum(l_quantity))*100.0 + 0.5)/100.0 AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q10_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
        | coalesce(o_orderpriority,'ALL') AS priority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q11_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q12_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q13_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "q14_sort_page" ->
      """SELECT o_orderkey, floor((o_totalprice)*100.0 + 0.5)/100.0 AS price FROM orders
        |ORDER BY price DESC, o_orderkey LIMIT 20 OFFSET 10""".stripMargin,
    "q15_range_join" ->
      """SELECT p_brand, count(*) AS n_rich
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND l_extendedprice > p_retailprice * 30.0
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q16_asof" ->
      """SELECT event_id,
        | strftime(asof_ts, '%Y-%m-%d %H:%M:%S') AS last_purchase
        |FROM (SELECT event_id, event_type,
        |        max(CASE WHEN event_type = 'purchase' THEN ts END)
        |          OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS asof_ts
        |      FROM events)
        |WHERE event_type = 'error' ORDER BY event_id""".stripMargin,
  )
}
