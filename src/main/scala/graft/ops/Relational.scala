package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Exact._

/** Relational query library — the analytics surface implied by the
  * reference's README contract (SURVEY.md §0.1, §2.4–2.9): grouped
  * aggregation, dimension joins, window functions, top-k, set ops.
  *
  * Everything here is declarative DataFrame code: Catalyst handles
  * predicate pushdown / column pruning / join selection, AQE handles
  * runtime broadcast demotion and skew. Scale notes per operator.
  *
  * Determinism rules (the DuckDB-oracle gate hashes values):
  *  - double aggregates go through [[Exact]] (order-independent decimal
  *    sums, IEEE-portable quantization),
  *  - ranking is computed over quantized values + an id tiebreak, so
  *    rank never depends on last-ulp float noise,
  *  - every query ends in a total order, matching the oracle's ORDER BY.
  */
object Relational {

  private def revenueExpr: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** TPC-H Q1 shape: one wide hash aggregation over the fact table.
    * Scale: partial (map-side) agg then final — shuffle carries only
    * |groups| rows per partition; no repartition needed at any SF.
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String = "2000-12-01"): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit(cutoff)))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(revenueExpr).as("sum_disc_price"),
        moneySum(revenueExpr * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        meanOf(col("l_quantity")).as("avg_qty"),
        meanOf(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Selective filter + narrow projection. The point at scale: both the
    * predicate and the 5-column read schema reach the parquet scan
    * (PushedFilters / ReadSchema in explain) — a 100 TB table is read
    * as only the row groups and columns that survive.
    */
  def filterPushdown(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(
        col("l_shipdate").between(to_timestamp(lit("1997-01-01")), to_timestamp(lit("1997-12-31"))) &&
          col("l_quantity") <= 2.0 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_partkey", "l_linenumber")

  /** Fact ⋈ fact ⋈ dim revenue rollup. `customer` is broadcast (dim);
    * lineitem⋈orders is the one real shuffle, on the join key both
    * sides already share. countDistinct adds its own expand — kept
    * because the oracle needs exact counts (approx variant below).
    */
  def segmentRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        moneySum(revenueExpr).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"))
      .orderBy("c_mktsegment")

  /** 3-dim star join: fact ⋈ supplier ⋈ nation ⋈ region, all dims
    * broadcast — zero shuffles on the fact side at any scale.
    */
  def regionRevenue(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        moneySum(revenueExpr).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")

  /** EXISTS as a left-semi join (no row multiplication, no distinct). */
  def existsPriority(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(
        lineitem.filter(col("l_quantity") > 30.0).select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** NOT EXISTS as a left-anti join: customers with no orders since
    * `since`. The date bound keeps the result non-vacuous on the test
    * corpus (every customer has SOME order, none-by-date is rarer) —
    * an anti-join gate on 0 rows proves nothing.
    */
  def antiNoOrders(customer: DataFrame, orders: DataFrame, since: String = "1998-01-01"): DataFrame =
    customer
      .join(
        orders.filter(col("o_orderdate") >= to_timestamp(lit(since))).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), meanOf(col("c_acctbal")).as("avg_acctbal"))
      .orderBy("c_mktsegment")

  /** Left outer join preserving zero-order customers, then a histogram
    * of order counts — two aggregations, the second over tiny data.
    */
  def orderCountHistogram(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_orders")

  /** RATIO-TO-REPORT: each nation's revenue share of the grand total —
    * the percent-of-total window shape. Exactness: per-nation revenue
    * stays an INTEGER-decimal sum (the moneySum interior) and the
    * grand total is a decimal sum of those — both order-free — so the
    * one share division sees identical operands in every engine; the
    * broadcast one-row total replaces an unpartitioned window (same
    * math, no single-task window at scale).
    */
  def revenueShareByNation(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val g = lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(floor(revenueExpr * lit(10000.0) + lit(0.5))
        .cast(DecimalType(18, 0))).as("revq"))
    val tot = g.agg(sum("revq").as("totq"))
    g.crossJoin(broadcast(tot))
      .select(col("n_name"),
        Exact.quant2(col("revq").cast("double") / lit(10000.0)).as("revenue"),
        Exact.quant6(col("revq").cast("double") / col("totq").cast("double"))
          .as("share"))
      .orderBy("n_name")
  }

  /** SCD-2 INTERVAL BUILD: collapse each customer's order-status
    * history into validity intervals — the slowly-changing-dimension
    * construction a warehouse runs when snapshots arrive as events.
    * Consecutive same-status runs merge (gaps-and-islands by the
    * row_number difference), `valid_from` is the run's first date,
    * `valid_to` the next run's start (null = current). All date and
    * integer arithmetic — engine-exact; the windows are
    * customer-partitioned (one customer's history per task, never a
    * global sort).
    */
  def scd2Intervals(orders: DataFrame): DataFrame =
    scd2State(orders)
      .select("o_custkey", "o_orderstatus", "valid_from", "valid_to",
        "first_key", "n_orders")
      .orderBy("o_custkey", "valid_from", "first_key")

  /** [[scd2Intervals]] PLUS the incremental-maintenance state: each
    * interval also carries the run's LAST order as `(last_date,
    * last_key)`. That pair is the sufficient statistic for folding a
    * later slice without rescanning history ([[scd2Fold]]): a new
    * slice whose orders all sort after the open run's last order can
    * only (a) extend the open run, or (b) close it and append new
    * runs — never re-split a closed interval. (The t116 incremental-
    * cohort discipline applied to the dimension table itself.)
    */
  def scd2State(orders: DataFrame): DataFrame = {
    val w3 = Window.partitionBy("o_custkey").orderBy("valid_from", "first_key")
    scd2Runs(orders).withColumn("valid_to", lead("valid_from", 1).over(w3))
  }

  /** Same-status run collapse (gaps-and-islands by the row_number
    * difference) with per-run first/last stats — shared by the full
    * build and the incremental fold so their run rule can never
    * drift.
    */
  private def scd2Runs(orders: DataFrame): DataFrame = {
    val w1 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val w2 = Window.partitionBy("o_custkey", "o_orderstatus")
      .orderBy("o_orderdate", "o_orderkey")
    orders
      .select(col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate"), col("o_orderkey"))
      .withColumn("grp", row_number().over(w1) - row_number().over(w2))
      .groupBy("o_custkey", "o_orderstatus", "grp")
      .agg(min("o_orderdate").as("valid_from"),
        min("o_orderkey").as("first_key"),
        count(lit(1)).as("n_orders"),
        // TEMPORAL first/last order of the run. start_key is NOT
        // always first_key: first_key is the run's min key (the t125
        // output convention), which a later-dated order can own — so
        // run-order comparisons must use (valid_from, start_key),
        // never (valid_from, first_key), or two runs sharing a start
        // date can swap and the fold's adjacency merge misfires.
        min(struct(col("o_orderdate"), col("o_orderkey"))).as("_first"),
        max(struct(col("o_orderdate"), col("o_orderkey"))).as("_last"))
      .select(col("o_custkey"), col("o_orderstatus"), col("valid_from"),
        col("first_key"), col("n_orders"),
        col("_first.o_orderkey").as("start_key"),
        col("_last.o_orderdate").as("last_date"),
        col("_last.o_orderkey").as("last_key"))
  }

  /** INCREMENTAL SCD-2 maintenance: fold a new slice of orders into
    * an existing [[scd2State]] WITHOUT rebuilding history. Closed
    * intervals pass through untouched; per affected customer, the
    * open interval either extends (same status continues — counts
    * add, `valid_from`/`first_key` keep their history values) or
    * closes at the first new run's start; new runs chain behind it.
    * Returns the new state — `scd2Fold(scd2State(old), new)` equals
    * `scd2State(old ∪ new)` row-for-row (gated, t133; the twin is the
    * full rebuild).
    *
    * Contract, ENFORCED: every new order must sort strictly after its
    * customer's last folded order in the (o_orderdate, o_orderkey)
    * run order — a later-arriving order inside an already-built run
    * would need to re-split closed intervals, which no open-interval
    * statistic can express; such slices take the rebuild path. The
    * guard is one bounded semi-join-shaped probe, not a history scan.
    *
    * Scale shape: history appears ONLY as the state table (one row
    * per interval, no window over raw history); all windows run over
    * the new slice's runs plus one open row per affected customer.
    */
  def scd2Fold(state0: DataFrame, newOrders: DataFrame): DataFrame = {
    // materialized once: the state plan has THREE consumers here
    // (guard, closed arm, open arm) — a lazy scd2State input would
    // re-run its history windows per consumer, which is exactly the
    // history rescan this function exists to avoid
    val state = state0.localCheckpoint()
    val closed = state.filter(col("valid_to").isNotNull)
    val open = state.filter(col("valid_to").isNull)
      .drop("valid_to")
    val newRuns = scd2Runs(newOrders)
    // guard: min new (date, key) per customer must sort strictly
    // after the customer's open-run last (date, key)
    val viol = newOrders
      .groupBy("o_custkey")
      .agg(min(struct(col("o_orderdate"), col("o_orderkey"))).as("first_new"))
      .join(open.select(col("o_custkey"),
        struct(col("last_date").as("o_orderdate"),
          col("last_key").as("o_orderkey")).as("last_old")), Seq("o_custkey"))
      .filter(col("first_new") <= col("last_old"))
      .limit(1).collect()
    require(viol.isEmpty,
      s"scd2Fold: slice interleaves with folded history for customer " +
        s"${viol.headOption.map(_.get(0)).getOrElse("")} — late-arriving orders " +
          "re-split closed intervals; rebuild with scd2State instead")
    // run-level collapse of (open run ∪ new runs): only the boundary
    // pair can share a status, and the same row_number-difference
    // trick merges exactly adjacent same-status runs
    val comb = open.unionByName(newRuns)
    // TEMPORAL run order (valid_from, start_key) — see scd2Runs on
    // why (valid_from, first_key) would be wrong here
    val w1 = Window.partitionBy("o_custkey").orderBy("valid_from", "start_key")
    val w2 = Window.partitionBy("o_custkey", "o_orderstatus")
      .orderBy("valid_from", "start_key")
    val merged = comb
      .withColumn("grp", row_number().over(w1) - row_number().over(w2))
      .groupBy("o_custkey", "o_orderstatus", "grp")
      .agg(min("first_key").as("first_key"),
        sum("n_orders").as("n_orders"),
        min(struct(col("valid_from"), col("start_key"))).as("_first"),
        max(struct(col("last_date"), col("last_key"))).as("_last"))
      .select(col("o_custkey"), col("o_orderstatus"),
        col("_first.valid_from").as("valid_from"),
        col("first_key"), col("n_orders"),
        col("_first.start_key").as("start_key"),
        col("_last.last_date").as("last_date"),
        col("_last.last_key").as("last_key"))
    val w3 = Window.partitionBy("o_custkey").orderBy("valid_from", "first_key")
    closed.unionByName(
      merged.withColumn("valid_to", lead("valid_from", 1).over(w3)))
  }

  /** DELTA form of [[scd2Fold]] for per-key upsert maintenance
    * ([[graft.sinks.LakeWriter.readBucketedTableMerged]]): returns
    * ONLY the affected customers' post-fold interval sets — each
    * affected customer complete (its untouched closed intervals
    * included, so a latest-commit-wins merge read reconstructs the
    * full state), untouched customers absent entirely. Committing
    * this as an append delta makes state maintenance O(affected)
    * physical I/O per batch instead of O(state) — the 100 TB shape
    * for a dimension-sized state table taking narrow daily slices.
    *
    * The state restriction is a broadcast semi-join on the batch's
    * distinct customers, so the state side (bucketed on o_custkey)
    * scans without an exchange and only affected customers' rows flow
    * into the fold. Same monotonicity contract as [[scd2Fold]],
    * enforced by the same guard.
    */
  def scd2FoldDelta(state: DataFrame, newOrders: DataFrame): DataFrame = {
    val keys = newOrders.select("o_custkey").distinct()
    val affected = state.join(broadcast(keys), Seq("o_custkey"), "left_semi")
    scd2Fold(affected, newOrders)
  }

  /** FULL OUTER join with both null arms non-vacuous: BUILDING-segment
    * customers against finished-order counts — customers with no F
    * orders surface left-only, F-order customers outside the segment
    * right-only, and the `side` indicator names each arm. The orders
    * side pre-aggregates to one row per customer BEFORE the join, so
    * the full-outer shuffle carries counts, never order rows.
    */
  def fullOuterActivity(customer: DataFrame, orders: DataFrame): DataFrame = {
    val c = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = orders.filter(col("o_orderstatus") === "F")
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_mktsegment"),
        col("n_orders"),
        when(col("c_custkey").isNull, "orders_only")
          .when(col("o_custkey").isNull, "customer_only")
          .otherwise("both").as("side"))
      .orderBy("custkey")
  }

  /** Grouped MODE: the most frequent quantity per return flag, with
    * a deterministic (count DESC, value) tie-break — the categorical
    * summary statistic `percentile` can't give. Partial-aggregated
    * counts shrink to |groups|·|values| rows before the rank window.
    */
  def modeQuantity(lineitem: DataFrame): DataFrame = {
    val counts = lineitem.groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("n").desc, col("l_quantity"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_returnflag", "l_quantity", "n")
      .orderBy("l_returnflag")
  }

  /** Per-group top-k via ranking window. Revenue is quantized BEFORE
    * the rank so order can't flip on float noise; p_partkey breaks
    * ties. Scale: one shuffle on p_brand for the window; the pre-agg
    * by (brand, partkey) shrinks rows first.
    */
  def topPartsPerBrand(lineitem: DataFrame, part: DataFrame, k: Int = 3): DataFrame = {
    val rev = lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(moneySum(revenueExpr).as("revenue"))
    val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
    rev
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("p_brand", "rnk", "p_partkey", "revenue")
      .orderBy("p_brand", "rnk")
  }

  /** Running total per supplier — frame-based analytic window. The
    * addends are quantized to DECIMAL(18,4), so the running sum is
    * exact integer arithmetic: identical regardless of the engine's
    * window-aggregation structure (Spark streams the frame, DuckDB
    * uses segment trees — float would differ in ulps).
    */
  def runningTotal(lineitem: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("running_qty",
        quant2(sum(col("l_quantity").cast(DecimalType(18, 4))).over(w).cast("double")))
      .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
  }

  /** Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    * each partition keeps k rows, driver merges k·p, never a full sort.
    */
  def topkParts(lineitem: DataFrame, part: DataFrame, k: Int = 10): DataFrame =
    lineitem
      .groupBy("l_partkey")
      .agg(moneySum(col("l_quantity")).as("total_qty"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("p_name"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("l_partkey"))
      .limit(k)

  /** Exact distinct counts per group (expand-based). */
  def distinctCounts(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")

  /** Approximate distinct via HLL++ — the 100 TB path (constant memory,
    * single pass, no expand). Sketch estimates are not portable across
    * engines, so the DECLARED output is exact counts plus booleans
    * asserting the HLL estimate landed within 10% of exact (rsd=0.02,
    * so the 10% bound is 5σ — deterministic in practice). The oracle
    * computes the exact counts and expects TRUE: a broken sketch path
    * flips a boolean and fails the hash gate.
    */
  def approxDistinctCounts(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("_as"),
        approx_count_distinct(col("l_partkey"), 0.02).as("_ap"))
      .select(
        col("l_returnflag"), col("n_suppliers"), col("n_parts"),
        (abs(col("_as") - col("n_suppliers")) <= col("n_suppliers") * 0.1).as("suppliers_ok"),
        (abs(col("_ap") - col("n_parts")) <= col("n_parts") * 0.1).as("parts_ok"))
      .orderBy("l_returnflag")

  /** ANALYZE-style column statistics — the table profile a cost-based
    * optimizer (or a data-quality monitor) consumes: per column, null
    * count, exact NDV, and min/max. One pass over the fact table; the
    * exact multi-column countDistinct costs one Expand (rows ×
    * columns) — the price of exactness, paid rarely; the refresh path
    * that doesn't rescan history is [[incrementalNdv]]'s sketch
    * union. Output is long-format (one row per column) so a stats
    * consumer joins it like any dimension.
    */
  /** Columns [[tableProfile]] profiles — public so the oracle twin
    * interpolates the SAME list (single source of truth).
    */
  val ProfileColumns: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount")

  def tableProfile(lineitem: DataFrame): DataFrame = {
    val cols = ProfileColumns
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"ndv_$c"),
      quant4(min(col(c)).cast("double")).as(s"min_$c"),
      quant4(max(col(c)).cast("double")).as(s"max_$c")))
    lineitem
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), expr(
        s"stack(${cols.size}, " +
          cols.map(c => s"'$c', nn_$c, ndv_$c, min_$c, max_$c").mkString(", ") +
          ") AS (col_name, n_nulls, ndv, min_d, max_d)"))
      .select("col_name", "n_rows", "n_nulls", "ndv", "min_d", "max_d")
      .orderBy("col_name")
  }

  /** Incremental distinct-count statistics via MERGEABLE HLL sketches
    * (`hll_sketch_agg` / `hll_union_agg`, Apache DataSketches): each
    * shard aggregates its own fixed-size sketch, and the corpus-wide
    * NDV is the estimate of their union — the way table statistics
    * actually stay fresh at 100 TB (persist one sketch per
    * ingested shard; a new shard appends its sketch and the union
    * re-estimates without rescanning history — contrast q38's HLL++
    * `approx_count_distinct`, which is one-shot). The gate shards by
    * order-key residue in-query and checks the union estimate against
    * the exact count (within-tolerance booleans, the q38 pattern:
    * sketch bytes aren't oracle-portable, the accuracy contract is).
    * lgConfigK = 14 bounds the error near 1%; tolerance is 5%.
    */
  def incrementalNdv(lineitem: DataFrame, shards: Int = 4): DataFrame = {
    val perShard = lineitem
      .groupBy((col("l_orderkey") % shards).as("shard"))
      .agg(
        expr("hll_sketch_agg(l_partkey, 14)").as("sk_part"),
        expr("hll_sketch_agg(l_suppkey, 14)").as("sk_supp"))
    val merged = perShard.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk_part))").as("_ep"),
      expr("hll_sketch_estimate(hll_union_agg(sk_supp))").as("_es"))
    val exact = lineitem.agg(
      countDistinct("l_partkey").as("n_parts"),
      countDistinct("l_suppkey").as("n_suppliers"))
    exact.join(merged)
      .select(
        col("n_parts"), col("n_suppliers"),
        (abs(col("_ep") - col("n_parts")) <= col("n_parts") * 0.05).as("parts_ok"),
        (abs(col("_es") - col("n_suppliers")) <= col("n_suppliers") * 0.05).as("suppliers_ok"))
  }

  /** Approximate grouped quantiles (Greenwald-Khanna sketches via
    * `approx_percentile`) checked against the exact rank-interpolated
    * percentile. This is the quantile shape that survives 100 TB: GK
    * sketches are fixed-size and merge associatively, so a grouped
    * quantile over a petabyte is one partial-agg shuffle of sketches
    * instead of a per-group sort — [[groupedPercentiles]]'s exact
    * form sorts each group. Declared output is exact values plus
    * within-tolerance booleans (the q38 HLL pattern: sketch internals
    * aren't oracle-portable, the accuracy contract is): accuracy
    * 1000 bounds rank error at 0.1%, and the 5%-of-value (+1 unit)
    * tolerance holds with wide margin on any data this runs over.
    */
  def approxQuantileReport(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(
        quant4(expr("percentile(l_quantity, 0.5)")).as("med_qty"),
        quant4(expr("percentile(l_extendedprice, 0.9)")).as("p90_price"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("_aq"),
        expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("_ap"),
        count(lit(1)).as("n_lines"))
      .select(
        col("l_returnflag"), col("med_qty"), col("p90_price"),
        (abs(col("_aq") - col("med_qty")) <= greatest(col("med_qty") * 0.05, lit(1.0)))
          .as("med_ok"),
        (abs(col("_ap") - col("p90_price")) <= greatest(col("p90_price") * 0.05, lit(1.0)))
          .as("p90_ok"),
        col("n_lines"))
      .orderBy("l_returnflag")

  /** PIVOT: per-returnflag rows with one revenue column per
    * linestatus — the wide report shape BI consumers ask for. The
    * pivot values are DECLARED (not discovered): an undeclared
    * `pivot(col)` runs an extra distinct-value job and caps at
    * `spark.sql.pivotMaxValues`; declaring them keeps the plan one
    * aggregate with an Expand, which is also what makes the twin
    * expressible as portable conditional aggregation.
    */
  def pivotRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(moneySum(revenueExpr))
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0.0)).as("rev_f"),
        coalesce(col("O"), lit(0.0)).as("rev_o"))
      .orderBy("l_returnflag")

  /** UNPIVOT (melt) — [[pivotRevenue]]'s inverse: the wide
    * per-linestatus columns back to (flag, metric, value) rows via
    * `Dataset.unpivot`, which compiles to one Expand — each input row
    * replicates to |value columns| rows in place, no shuffle at all.
    * Round-tripping the pivot under the gate pins both reshapes.
    */
  def unpivotRevenue(lineitem: DataFrame): DataFrame =
    pivotRevenue(lineitem)
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("rev_f"), col("rev_o")),
        "metric", "revenue")
      .orderBy("l_returnflag", "metric")

  /** ROLLUP hierarchy with grouping_id — one pass, Expand-based. */
  def rollupQty(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("long").as("gid"),
        moneySum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE over both dimensions — rollup's sibling that also emits the
    * (ALL, l_linestatus) slice rollup's hierarchy omits. Same one-pass
    * Expand shape: the scan is read once and each row is replicated
    * into its 4 grouping sets BEFORE the partial aggregate, so the
    * shuffle carries ≤ 4·|groups| pre-aggregated rows, not 4× the
    * fact table — cube at 100 TB costs one extra Expand, not three
    * extra scans.
    */
  def cubeQty(lineitem: DataFrame): DataFrame =
    lineitem
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("long").as("gid"),
        moneySum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** RANGE-framed rolling window — the VALUE-based frame §2.6's
    * row-framed form (q09) can't express: each order sees its
    * customer's orders in the trailing 30 CALENDAR days (by date
    * value), not the trailing 30 rows — sparse histories make the two
    * wildly different. Order key is the integer day number and the
    * frame is `rangeBetween(-30, 0)`, so the window math is pure
    * integers (count + cents sum) — engine-exact, and the window is
    * customer-partitioned: one history per task, never a global sort.
    * Output: (o_custkey, o_orderkey, dn, n_30d, cents_30d).
    */
  def rolling30dOrders(orders: DataFrame): DataFrame = {
    val o = orders.select(col("o_custkey"), col("o_orderkey"),
      datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("dn"),
      floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
    val w = Window.partitionBy("o_custkey").orderBy("dn").rangeBetween(-30, 0)
    o.select(col("o_custkey"), col("o_orderkey"), col("dn"),
      count(lit(1)).over(w).as("n_30d"),
      sum("cents").over(w).as("cents_30d"))
      .orderBy("o_custkey", "dn", "o_orderkey")
  }

  /** EXACT grouped median — not an approximation
    * (the GK-sketch grouped quantiles are q48's job; this is the
    * exact answer a finance auditor wants), computed WITHOUT ranking
    * the fact table: the value domain is small (quantities 1..50), so
    * the median falls out of per-(group, value) COUNTS — one
    * map-side-combined aggregate over the corpus, then all rank math
    * runs on the ≤|domain| histogram rows (cumulative counts, min
    * value whose cumulative count reaches the middle rank(s), average
    * of the middle one-or-two). A row_number over the fact table
    * would sort each group in ONE task — unusable with 3 groups at
    * 100 TB; the histogram form shuffles |groups|·|domain| rows
    * total. Integer counts and values throughout, one division of a
    * two-value integer sum at the end — engine-exact.
    */
  def exactMedianQty(lineitem: DataFrame): DataFrame = {
    val cnt = lineitem
      .select(col("l_returnflag").as("rf"), col("l_quantity").cast("long").as("q"))
      .groupBy("rf", "q").agg(count(lit(1)).as("c"))
    val cum = cnt
      .withColumn("cum", sum("c").over(Window.partitionBy("rf").orderBy("q")))
      .withColumn("n", sum("c").over(Window.partitionBy("rf")))
    def valAt(rank: String, alias: String): DataFrame =
      cum.filter(col("cum") >= expr(rank)).groupBy("rf").agg(min("q").as(alias))
    valAt("(n+1) DIV 2", "v1").join(valAt("(n+2) DIV 2", "v2"), "rf")
      .select(col("rf"),
        ((col("v1") + col("v2")).cast("double") / lit(2.0)).as("median_qty"))
      .orderBy("rf")
  }

  /** EWMA — exponentially weighted moving average (α = 1/2) of each
    * series' DAILY totals, the classic smoothing statistic
    * ([[forwardFillDaily]]'s sibling). An EWMA is inherently a
    * SEQUENTIAL recurrence (y = (y + x)/2), which no window aggregate
    * expresses; the scale-honest shape is: pre-aggregate the corpus
    * to per-(series, day) counts — ONE map-side-combined pass, the
    * only corpus-sized step — then fold each series' |days|-sized
    * sorted array with a higher-order `aggregate` in-task. Halving is
    * exact in IEEE and the fold order is fixed by the sort, so the
    * doubles are bit-identical to DuckDB's `list_reduce` twin.
    * Output: (rf, ewma) — the smoothed level at end of history.
    */
  def ewmaDailyQty(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_returnflag").as("rf"), to_date(col("l_shipdate")).as("dt"))
      .groupBy("rf", "dt").agg(count(lit(1)).cast("double").as("x"))
      .groupBy("rf")
      .agg(sort_array(collect_list(struct(col("dt"), col("x")))).as("a"))
      .select(col("rf"), expr(
        "aggregate(slice(a, 2, size(a) - 1), a[0].x, " +
          "(acc, e) -> (acc + e.x) / CAST(2.0 AS DOUBLE))").as("ewma"))
      .orderBy("rf")

  /** ANOMALY DETECTION — per-group 2σ outlier counts with ZERO
    * floating point: `x` is an outlier iff |x − μ| > 2σ, which
    * cross-multiplies to the PURE INTEGER test
    * `(n·x − S)² > 4·n·(n·Q − S²)` with S = Σx, Q = Σx² — no mean, no
    * sqrt, no division, so there is nothing to round and the oracle
    * twin is exact by construction (Spark DECIMAL(38,0) ⟷ DuckDB
    * HUGEINT; cent-scale values keep every product under 10³⁸ to
    * ~10¹¹ rows per group — beyond that, rescale the unit). Two
    * passes, both partial-aggregating: one for the per-group (n, S,
    * Q) sufficient statistic (broadcast back — |groups| rows), one
    * for the outlier count. The per-row test is codegen'd integer
    * math inside the scan pass.
    * Output: (rf, n, n_outliers).
    */
  def outlierCounts(lineitem: DataFrame): DataFrame = {
    val dec = "DECIMAL(38,0)"
    val x = lineitem.select(col("l_returnflag").as("rf"),
      floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
        .cast(dec).as("c"))
    val stats = x.groupBy("rf").agg(
      count(lit(1)).cast(dec).as("n"),
      sum("c").cast(dec).as("s"),
      sum(col("c") * col("c")).cast(dec).as("q"))
    x.join(broadcast(stats), "rf")
      .select(col("rf"), col("n"),
        when((col("n") * col("c") - col("s")) * (col("n") * col("c") - col("s"))
          > lit(4).cast(dec) * col("n") * (col("n") * col("q") - col("s") * col("s")),
          1L).otherwise(0L).as("is_out"))
      .groupBy("rf")
      .agg(first("n").cast("long").as("n"), sum("is_out").as("n_outliers"))
      .orderBy("rf")
  }

  /** MARKET-BASKET association rules — support / confidence / lift
    * over co-purchase pairs, the classic recommendation statistic:
    * pair support from ONE self-join on the basket key (a < b
    * orientation, each pair once), item supports and the basket count
    * from partial-aggregating passes, the one-row total broadcast
    * (never a window). `minSupport` prunes BEFORE the item-support
    * joins — the A-Priori downward-closure trick that keeps the rule
    * table support-bounded instead of pair-quadratic. All counts are
    * integers; confidence and lift are single divisions of integer
    * products (< 2^53, exact), quantized with the portable
    * [[Exact.quant6]]. Output: (pa, pb, pair_supp, conf_ab, conf_ba,
    * lift), lift > 1 ⇔ the pair co-occurs above independence.
    */
  def marketBasket(lineitem: DataFrame, minSupport: Long = 3L): DataFrame = {
    val baskets = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nb = baskets.agg(countDistinct(col("ok")).as("nb"))
    val itemSupp = baskets.groupBy("pk").agg(count(lit(1)).as("supp"))
    val pairSupp = baskets.as("a")
      .join(baskets.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("pair_supp"))
      .filter(col("pair_supp") >= minSupport)
    pairSupp
      .join(itemSupp.select(col("pk").as("pa"), col("supp").as("sa")), "pa")
      .join(itemSupp.select(col("pk").as("pb"), col("supp").as("sb")), "pb")
      .crossJoin(broadcast(nb))
      .select(col("pa"), col("pb"), col("pair_supp"),
        Exact.quant6(col("pair_supp").cast("double") / col("sa")).as("conf_ab"),
        Exact.quant6(col("pair_supp").cast("double") / col("sb")).as("conf_ba"),
        Exact.quant6((col("pair_supp") * col("nb")).cast("double")
          / (col("sa") * col("sb")).cast("double")).as("lift"))
      .orderBy("pa", "pb")
  }

  /** MERGE INTO / SCD-1 UPSERT — the other dimension-maintenance
    * shape next to SCD-2 ([[scd2Intervals]] keeps history; this
    * overwrites in place): matched keys take the update slice's row
    * wholesale, unmatched target rows pass through, brand-new keys
    * insert. One left-anti join on the key (updates side broadcast
    * when dimension-slice-sized) + a union — the WHEN MATCHED THEN
    * UPDATE / WHEN NOT MATCHED THEN INSERT core of SQL MERGE without
    * a delete arm. Schemas must match; the update slice must be
    * unique per key (enforce upstream with [[expectationsReport]]'s
    * uniqueness rule, or at commit time via the expectations hook).
    * Scale shape: the target never shuffles on anything but the key
    * anti-join; nothing is rewritten that a delta-maintained
    * manifested table wouldn't rewrite
    * ([[graft.sinks.LakeWriter.readBucketedTableMerged]] is the
    * storage-level twin of this row-level rule).
    */
  def mergeUpsert(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target
      .join(updates.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates.select(target.columns.map(col): _*))

  /** CORRELATED SCALAR SUBQUERY — orders priced above their own
    * customer's average order price, written as SQL with a correlated
    * scalar subquery (the form analysts actually write) and executed
    * by Catalyst's DECORRELATION: the optimizer rewrites the per-row
    * subquery into ONE aggregate over orders plus ONE equi-join on
    * o_custkey — no per-row re-execution, plan spec-asserted (the
    * executed plan contains an Aggregate+Join and no subquery
    * expression). The twin runs the same text in DuckDB, which
    * decorrelates identically, and both sides use the [[Exact]]
    * integer-quantized mean so the averages are bit-identical.
    * Output: (o_orderkey, o_custkey, price, cust_avg), price strictly
    * above the customer average.
    */
  def priceAboveCustomerAvg(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    // unique per call: a fixed view name would leak into the session
    // and let two concurrent callers resolve each other's frames; the
    // view is dropped right after spark.sql — analysis is eager, so
    // the returned plan no longer references it
    val vn = s"graft_corr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView(vn)
    try spark.sql(
      s"""SELECT o_orderkey, o_custkey, price, cust_avg FROM (
         |  SELECT o1.o_orderkey, o1.o_custkey,
         |    CAST(floor(o1.o_totalprice * 100.0 + 0.5) / 100.0 AS DOUBLE) AS price,
         |    CAST((SELECT floor(CAST(sum(CAST(floor(o2.o_totalprice * 1000000.0 + 0.5)
         |         AS DECIMAL(18,0))) AS DOUBLE) / 1000000.0 / count(*) * 10000.0 + 0.5) / 10000.0
         |     FROM $vn o2 WHERE o2.o_custkey = o1.o_custkey) AS DOUBLE) AS cust_avg
         |  FROM $vn o1)
         |WHERE price > cust_avg
         |ORDER BY o_orderkey""".stripMargin)
    finally spark.catalog.dropTempView(vn)
  }

  /** DATA-QUALITY EXPECTATIONS — the Deequ-shaped validation pass a
    * warehouse runs before publishing a table: declarative row rules
    * (each a Column predicate; a NULL predicate result counts as a
    * violation — unknown is not clean) plus uniqueness constraints,
    * reported as one (rule, n_violations, pass) row each.
    *
    * Scale shape: ALL row rules evaluate in ONE map-side-combined
    * aggregate pass over the table (k rules = k conditional sums in
    * one job, melted to rows afterward — never k scans); each
    * uniqueness constraint is one partial-aggregating shuffle on its
    * key, counting SURPLUS rows (Σ max(0, n−1) per duplicated key).
    */
  def expectationsReport(
      df: DataFrame,
      rowRules: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueKeys.nonEmpty, "no rules given")
    val rowReport =
      if (rowRules.isEmpty) Nil
      else {
        val aggCols = rowRules.map { case (n, p) =>
          sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)).as(n)
        }
        val one = df.agg(aggCols.head, aggCols.tail: _*)
        Seq(one.select(explode(array(rowRules.map { case (n, _) =>
          struct(lit(n).as("rule"), coalesce(col(n), lit(0L)).as("n_violations"))
        }: _*)).as("r")).select("r.rule", "r.n_violations"))
      }
    val uniqReport = uniqueKeys.map { case (n, cols) =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations"))
        .select(lit(n).as("rule"), col("n_violations"))
    }
    (rowReport ++ uniqReport).reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule")
  }

  /** PARTITION-COMPLETENESS check — [[expectationsReport]]'s temporal
    * sibling: the calendar days between the table's first and last
    * day that have NO rows. An ingestion pipeline alarms on this
    * (a silent missing day is the failure a monthly full-load hides);
    * a partitioned lake runs it against the partition column.
    * Scale shape: one distinct-days partial aggregate (≤ |days| rows
    * however large the table), a two-column bound row, and the
    * calendar explodes from that ONE row — nothing corpus-sized
    * moves after the first aggregate.
    */
  def dateGaps(df: DataFrame, dateCol: String): DataFrame = {
    // materialized once: both the bounds agg and the anti-join read
    // the distinct-days frame (<= |days| rows)
    val d = df.select(to_date(col(dateCol)).as("dt"))
      .filter(col("dt").isNotNull).distinct()
      .localCheckpoint()
    val all = d.agg(min("dt").as("lo"), max("dt").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("dt"))
    all.join(d, Seq("dt"), "left_anti")
      .select(col("dt").as("missing_date"))
      .orderBy("missing_date")
  }

  /** TIME-SERIES REINDEX + FORWARD FILL (LOCF) — [[dateGaps]]'s
    * repair: the per-flag daily revenue series reindexed onto the
    * full calendar (every flag × every day in the span), missing
    * days filled with the last observation. The fill is
    * `last(value, ignoreNulls)` over a flag-partitioned
    * unbounded-preceding frame — each series fills in its own task,
    * never a global window; the calendar explodes from a one-row
    * bound (the t139 shape) and cross-joins the tiny flag dimension.
    * `was_missing` keeps the repair auditable. Leading missing days
    * (before a series' first observation) stay null by LOCF's
    * definition.
    */
  def forwardFillDaily(lineitem: DataFrame): DataFrame = {
    // materialized once: the |flags|x|days| aggregate has three
    // consumers (bounds, flag dimension, grid join) — unmaterialized,
    // the corpus re-aggregates per consumer
    val daily = lineitem
      .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("day"))
      .agg(moneySum(revenueExpr).as("revenue"))
      .localCheckpoint()
    val cal = daily.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val flags = daily.select("l_returnflag").distinct()
    val w = Window.partitionBy("l_returnflag").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    cal.crossJoin(broadcast(flags))
      .join(daily, Seq("l_returnflag", "day"), "left")
      .select(col("l_returnflag"), col("day"),
        last("revenue", ignoreNulls = true).over(w).as("revenue"),
        col("revenue").isNull.as("was_missing"))
      .orderBy("l_returnflag", "day")
  }

  /** INTERSECT / EXCEPT over customer key sets, tagged and unioned. */
  def setopsStatus(orders: DataFrame): DataFrame = {
    def keys(status: String) =
      orders.filter(col("o_orderstatus") === status).select("o_custkey").distinct()
    val o = keys("O"); val f = keys("F")
    o.intersect(f).withColumn("tag", lit("both"))
      .unionByName(o.except(f).withColumn("tag", lit("only_o")))
      .unionByName(f.except(o).withColumn("tag", lit("only_f")))
      .orderBy("o_custkey", "tag")
  }

  /** Conditional aggregation (the hero-win-rate shape from the
    * reference's README): share of 'F' orders per nation.
    */
  def nationStatusShare(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        meanOfLong(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("f_share"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")

  /** Calendar bucketing: orders per year/month. */
  def monthlyOrders(orders: DataFrame): DataFrame =
    orders
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mth"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total_price"))
      .orderBy("yr", "mth")

  /** String functions: first word of p_type + aggregates per word. */
  def typeWordStats(part: DataFrame): DataFrame =
    part
      .groupBy(split(col("p_type"), " ").getItem(0).as("type_word"))
      .agg(
        count(lit(1)).as("n_parts"),
        meanOf(col("p_retailprice")).as("avg_price"),
        max("p_size").as("max_size"))
      .orderBy("type_word")

  /** Grouped exact percentiles (rank-interpolated, the SQL-standard
    * quantile_cont semantics — bit-identical across engines on equal
    * input, verified). Exact percentile sorts within the group; for
    * sketch-budget pipelines at extreme cardinality the approx twin
    * is `percentile_approx`, kept out of the oracle for the same
    * reason as HLL.
    */
  def groupedPercentiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(
        quant4(expr("percentile(l_quantity, 0.5)")).as("med_qty"),
        quant4(expr("percentile(l_quantity, 0.9)")).as("p90_qty"),
        quant4(expr("percentile(l_extendedprice, 0.5)")).as("med_price"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")

  /** Ranking-variant windows: quartile bucket (ntile), percent_rank,
    * cume_dist per brand over (retailprice, partkey) — the tiebreak
    * makes every rank deterministic.
    */
  def rankVariants(part: DataFrame): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice"), col("p_partkey"))
    part
      .select(
        col("p_brand"), col("p_partkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        quant4(percent_rank().over(w)).as("pr"),
        quant4(cume_dist().over(w)).as("cd"))
      .orderBy("p_brand", "p_partkey")
  }

  /** Pivot: order counts per priority × status, statuses as columns.
    * The value list is EXPLICIT — with it the pivot is one pass
    * (conditional aggregation); without it Spark must first scan for
    * distinct statuses (an extra job at 100 TB).
    */
  def statusPivot(orders: DataFrame): DataFrame =
    orders
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_orderpriority")

  /** Date arithmetic over a join: shipping delay (days between order
    * and ship date) statistics per priority.
    */
  def shipDelayStats(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days", datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .groupBy("o_orderpriority")
      .agg(
        meanOfLong(col("delay_days")).as("avg_delay"),
        min("delay_days").as("min_delay"),
        max("delay_days").as("max_delay"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")

  /** CDC SNAPSHOT DIFF — the change feed between two versions of the
    * same keyed table (e.g. two [[graft.sinks.LakeWriter]] manifested
    * commits read via time travel): one full outer join on the key,
    * payload columns compared null-safely. Emits `insert` (key only
    * in `newer`), `delete` (key only in `older`) and, for keys in
    * both with any payload column changed, an `update_preimage` +
    * `update_postimage` row PAIR (the standard change-data-feed
    * format — the pre-image is what lets a downstream aggregate
    * RETRACT the old contribution, see [[incrementalGroupSum]]).
    * Unchanged keys are dropped, so downstream incremental consumers
    * touch O(changed) rows, not O(table). Scale: one shuffle on the key for
    * both sides (co-partitioned if both snapshots are bucketed on the
    * key, in which case the exchange vanishes).
    */
  def snapshotDiff(older: DataFrame, newer: DataFrame, key: String): DataFrame = {
    val payload = older.columns.filterNot(_ == key).toSeq
    require(payload.nonEmpty, "snapshotDiff needs at least one payload column")
    require(newer.columns.sorted.sameElements(older.columns.sorted),
      "snapshotDiff requires identical schemas")
    val o = older.select(col(key).as("_ok"),
      struct(payload.map(col): _*).as("_opay"))
    val n = newer.select(col(key).as("_nk"),
      struct(payload.map(col): _*).as("_npay"))
    val changed = o.join(n, col("_ok") === col("_nk"), "full_outer")
      .withColumn("_arm",
        when(col("_ok").isNull, array(lit("insert")))
          .when(col("_nk").isNull, array(lit("delete")))
          .when(!(col("_opay") <=> col("_npay")),
            array(lit("update_preimage"), lit("update_postimage"))))
      .filter(col("_arm").isNotNull)
      .withColumn("change_type", explode(col("_arm")))
    val image = when(col("change_type").isin("delete", "update_preimage"),
      col("_opay")).otherwise(col("_npay"))
    changed.select(
      Seq(coalesce(col("_nk"), col("_ok")).as(key), col("change_type")) ++
        payload.map(c => image.getField(c).as(c)): _*)
  }

  /** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE for a grouped
    * (count, integer-sum) aggregate: fold a [[snapshotDiff]] change
    * feed into the previous MV state without touching the base table.
    * Inserts and update POST-images add their contribution, deletes
    * and update PRE-images retract theirs — group-moving updates come
    * out right by construction. Cost is O(|feed| + |groups|): one
    * aggregation of the feed, one full-outer merge with the MV; the
    * 100 TB base table is never re-read. Groups whose count reaches
    * zero are dropped. `mv` schema: (grp, n, s).
    */
  def incrementalGroupSum(mv: DataFrame, feed: DataFrame,
      grp: Column, valueInt: Column): DataFrame = {
    val sign = when(col("change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("change_type").isin("delete", "update_preimage"), lit(-1L))
    val delta = feed.select(grp.as("grp"), sign.as("_sg"), valueInt.as("_v"))
      .groupBy("grp")
      .agg(sum(col("_sg")).as("dn"), sum(col("_sg") * col("_v")).as("ds"))
    mv.select(col("grp"), col("n"), col("s"))
      .join(delta, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .filter(col("n") > 0)
  }

  /** Per-group LEAST-SQUARES linear trend (slope + intercept) with
    * ZERO float accumulation: x/y pre-quantized to integer units by
    * the caller, the five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    * summed in DECIMAL(38,0), the closed-form solution's numerator
    * and denominator formed as exact integer products, and only the
    * FINAL division done in (portably-quantized) doubles. One
    * partial-aggregating pass; no per-group iteration anywhere.
    * Output: (grp, n, slope, intercept) in y-units per x-unit.
    */
  def linearTrend(df: DataFrame, grp: Column, xInt: Column, yInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val x = df.select(grp.as("grp"), xInt.cast(dec).as("x"), yInt.cast(dec).as("y"))
    x.groupBy("grp")
      .agg(count(lit(1)).cast(dec).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("grp"), col("n").cast("long").as("n"),
        quant6((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("slope"),
        quant6((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("intercept"))
      .orderBy("grp")
  }

  /** KEY-SKEW PROFILE — the shuffle-planning statistic: for each
    * named key expression, the row count, distinct-key count, the
    * exact collision mass Σf² (Σf²/n is the expected number of rows
    * sharing a random row's key) and the heaviest key's frequency.
    * Pure integers — nothing to quantize. This is what decides
    * salting / AQE-skew settings BEFORE launching a 100 TB join:
    * max_f bounds the hottest post-shuffle partition no matter how
    * many reducers there are.
    */
  def keySkewProfile(df: DataFrame, keys: Seq[(String, Column)]): DataFrame = {
    require(keys.nonEmpty, "need at least one key expression")
    val profiles = keys.map { case (name, k) =>
      df.select(k.cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("f"))
        .agg(count(lit(1)).as("n_keys"), sum("f").as("n_rows"),
          sum(col("f") * col("f")).as("sum_f2"), max("f").as("max_f"))
        .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"),
          col("sum_f2"), col("max_f"))
    }
    profiles.reduce(_ unionByName _).orderBy("key_name")
  }

  /** HEAVY HITTERS over a (possibly huge-cardinality) column: a
    * Misra–Gries summary per partition (k counters in a plain hash
    * map, O(k) memory regardless of input size) proposes candidates,
    * then ONE semi-join recount gives exact counts for candidates
    * only. k is sized from the table count so that every value with
    * true frequency ≥ `minCount` provably survives the sketch
    * (undercount ≤ n_p/(k+1) per partition ⇒ any value with global
    * count > n/(k+1) surfaces in at least one partition), making the
    * output EXACT — the sketch is purely a shuffle-avoidance device:
    * the full-cardinality groupBy that a naive HAVING needs never
    * runs; only |candidates| × |partitions| summary rows shuffle.
    */
  def heavyHitters(df: DataFrame, valueCol: Column, minCount: Long): DataFrame = {
    require(minCount > 1, "minCount must exceed 1")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(valueCol.cast("long").as("v")).localCheckpoint()
    val n = vals.count()
    val k = (n / minCount + 1).toInt.max(16)
    val candidates = vals.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[Long, Long]
      it.foreach { row =>
        val v = row.getLong(0)
        if (counters.contains(v) || counters.size < k)
          counters(v) = counters.getOrElse(v, 0L) + 1L
        else {
          // decrement-all step (the arriving value is absorbed by the
          // same decrement); drop exhausted counters
          counters.keys.toArray.foreach { key =>
            val c = counters(key) - 1L
            if (c == 0L) counters.remove(key) else counters(key) = c
          }
        }
      }
      counters.keysIterator
    }.toDF("v").distinct()
    vals.join(broadcast(candidates), Seq("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("v"))
  }

  /** DETERMINISTIC STRATIFIED SAMPLE — exactly `perStratum` rows per
    * stratum, chosen by md5 rank of the row id: no RNG state, so the
    * sample is reproducible across engines, retries and partitionings
    * (the property that makes eval/holdout splits auditable). The
    * window sort shuffles once on the stratum key; rows-per-stratum
    * at 100 TB is the usual skew concern — a hot stratum sorts on one
    * task, so for massively-skewed strata pre-prune with a hash
    * threshold before ranking.
    */
  def stratifiedSample(
      df: DataFrame, stratum: String, idCol: String, perStratum: Int): DataFrame = {
    val rank = row_number().over(Window.partitionBy(stratum)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol)))
    df.withColumn("_r", rank).filter(col("_r") <= perStratum).drop("_r")
  }

  /** 2-D SKYLINE (Pareto frontier): the distinct (minimize `xCol`,
    * maximize `yCol`) points no other point dominates. Distributed
    * shape: range-partition by x and take each partition's LOCAL
    * skyline with a sorted running-max sweep (a locally-dominated
    * point is globally dominated, so survivors are a superset of the
    * answer and ~|skyline|-sized), then one tiny global sweep on the
    * survivors. No cross join at any stage — the naive NOT EXISTS is
    * O(n²).
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def sweep(pts: DataFrame): DataFrame =
      pts.mapPartitions { it =>
        var best = Long.MinValue
        it.flatMap { row =>
          val y = row.getLong(1)
          if (y > best) { best = y; Some((row.getDouble(0), y)) } else None
        }
      }.toDF(xCol, yCol)
    val pts = df.select(col(xCol).cast("double"), col(yCol).cast("long")).distinct()
    // per x keep only the max y, then sort by (x asc, y desc) so the
    // running max admits exactly the undominated points
    val perX = pts.groupBy(xCol).agg(max(yCol).as(yCol))
    val local = sweep(perX.repartitionByRange(col(xCol))
      .sortWithinPartitions(col(xCol), col(yCol).desc))
    sweep(local.coalesce(1).sortWithinPartitions(col(xCol), col(yCol).desc))
      .orderBy(xCol, yCol)
  }

  /** K-ANONYMOUS RELEASE: rows whose quasi-identifier combination is
    * shared by ≥ k rows survive with the identifier replaced by a
    * deterministic md5 pseudonym; rarer combinations are SUPPRESSED
    * wholesale (the re-identification risk is exactly the small
    * groups). One hash aggregation for the group sizes, one semi-ish
    * broadcast-able join back — the release never materializes the
    * suppressed rows. Pseudonymization is a pure column map, so the
    * release stays joinable to itself across tables hashed with the
    * same salt-free scheme (swap in a keyed hash for production
    * salting).
    */
  def kAnonymize(df: DataFrame, idCol: String, quasi: Seq[Column],
      quasiNames: Seq[String], k: Int): DataFrame = {
    require(quasi.nonEmpty && quasi.size == quasiNames.size && k >= 2,
      "need quasi-identifiers and k >= 2")
    val qcols = quasi.zip(quasiNames).map { case (c, n) => c.as(n) }
    val rows = df.select(
      md5(col(idCol).cast("string").cast("binary")).as("pseud") +: qcols: _*)
    val big = rows.groupBy(quasiNames.map(col): _*)
      .agg(count(lit(1)).as("_n")).filter(col("_n") >= k)
    rows.join(big, quasiNames)
      .select((col("pseud") +: quasiNames.map(col)) :+ col("_n").as("group_size"): _*)
      .orderBy("pseud")
  }

  /** Part-pair co-occurrence (the reference's "hero combinations"
    * capability): self-join on the order key with a `<` guard. Scale:
    * lines-per-order is small and bounded, so the self-join output is
    * ~|orders|·avg_lines² — linear in the fact table, and the join key
    * is the natural partitioning.
    */
  def partPairs(lineitem: DataFrame, k: Int = 20): DataFrame = {
    val a = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa")).distinct()
    val b = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb")).distinct()
    a.join(b, Seq("ok"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("pa"), col("pb"))
      .limit(k)
  }

  /** LATEST ROW PER KEY — the read side of an out-of-order CDC/upsert
    * stream: of all versions of a key, keep the one with the highest
    * `seqCol` (ties impossible by contract — enforce uniqueness
    * upstream with [[expectationsReport]]). ONE partial-aggregating
    * pass: `max_by` over the payload struct combines map-side, so the
    * shuffle carries ≤ |keys| rows per partition — unlike the
    * window-sort form (`row_number ... rn=1`), which shuffles and
    * sorts EVERY version. This is the compaction kernel for
    * merge-on-read tables at 100 TB: version count per key can be
    * huge; the aggregate never materializes the losers post-shuffle.
    */
  def latestRows(df: DataFrame, key: String, seqCol: String): DataFrame = {
    val payload = df.columns.filterNot(c => c == key || c == seqCol).toSeq
    require(payload.nonEmpty, "latestRows needs at least one payload column")
    df.groupBy(col(key))
      .agg(max(col(seqCol)).as(seqCol),
        max_by(struct(payload.map(col): _*), col(seqCol)).as("_p"))
      .select(Seq(col(key), col(seqCol)) ++ payload.map(c => col(s"_p.$c").as(c)): _*)
  }

  /** REFERENTIAL-INTEGRITY AUDIT: for each declared foreign key,
    * count the child rows whose key has no parent (one left-anti join
    * per FK — the anti side partial-aggregates to distinct keys
    * first, so the join carries |distinct child keys| rows, not
    * |child|), plus the smallest offending key as the repro pointer.
    * This is the "can I trust my joins" report a warehouse runs after
    * every load: an inner join silently DROPS orphan rows, so orphan
    * counts are exactly the rows each downstream join would lose.
    * Output one row per FK: (fk_name, child_rows, orphan_rows,
    * orphan_keys, min_orphan_key).
    */
  def fkOrphanReport(
      checks: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(checks.nonEmpty, "need at least one FK to audit")
    checks.map { case (name, child, childKey, parent, parentKey) =>
      val keyed = child.select(col(childKey).cast("long").as("k"))
      val perKey = keyed.groupBy("k").agg(count(lit(1)).as("f"))
      val orphans = perKey.join(
        parent.select(col(parentKey).cast("long").as("k")).distinct(),
        Seq("k"), "left_anti")
      val totals = perKey.agg(sum("f").as("child_rows"))
      val o = orphans.agg(
        coalesce(sum("f"), lit(0L)).as("orphan_rows"),
        count(lit(1)).as("orphan_keys"),
        min("k").as("min_orphan_key"))
      totals.crossJoin(broadcast(o)) // both one-row aggregates
        .select(lit(name).as("fk_name"), col("child_rows"),
          col("orphan_rows"), col("orphan_keys"), col("min_orphan_key"))
    }.reduce(_ unionByName _).orderBy("fk_name")
  }

  /** Per-group WEIGHTED MEDIAN: the smallest value whose cumulative
    * weight reaches half the group total (lower weighted median —
    * deterministic, no interpolation, integer-only comparisons via
    * the cross-multiplied `2·cum ≥ total` test). Distributed shape:
    * collapse to one row per DISTINCT (grp, value) with a partial
    * aggregate FIRST — the window cumsum then runs over the
    * value-histogram, which is bounded by the value domain, not the
    * row count (a 100 TB fact table with a few thousand distinct
    * prices windows over a few thousand rows per group).
    */
  def weightedMedian(df: DataFrame, grp: Column,
      valueInt: Column, weightInt: Column): DataFrame = {
    val hist = df.select(grp.as("grp"), valueInt.as("v"), weightInt.as("w"))
      .groupBy("grp", "v").agg(sum("w").as("w"))
    val wCum = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("grp")
    hist
      .withColumn("_cum", sum("w").over(wCum))
      .withColumn("_tot", sum("w").over(wTot))
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy("grp")
      .agg(min("v").as("weighted_median"), max("_tot").as("total_weight"))
      .orderBy("grp")
  }

  /** EXACT JOIN-CARDINALITY profile — the planner statistic that
    * predicts a join's output size WITHOUT running the join: per-key
    * frequency tables on both sides (partial-aggregated), joined on
    * the key (distinct-key-sized, not row-sized), Σ f_L·f_R summed in
    * DECIMAL(38,0) so hot keys can't overflow. Reading `est_rows`
    * against `left_rows + right_rows` is how you decide — BEFORE
    * launching a 100 TB join — whether the output explodes (many-to-
    * many key) or the join is safe; pairs with [[keySkewProfile]],
    * which bounds the hottest single key.
    */
  def joinCardinality(
      joins: Seq[(String, DataFrame, Column, DataFrame, Column)]): DataFrame = {
    require(joins.nonEmpty, "need at least one join to profile")
    val dec = DecimalType(38, 0)
    joins.map { case (name, left, lk, right, rk) =>
      val fl = left.select(lk.cast("long").as("k")).groupBy("k")
        .agg(count(lit(1)).cast(dec).as("fl"))
      val fr = right.select(rk.cast("long").as("k")).groupBy("k")
        .agg(count(lit(1)).cast(dec).as("fr"))
      fl.agg(sum("fl").as("lr")).crossJoin(broadcast(fr.agg(sum("fr").as("rr"))))
        .crossJoin(broadcast(fl.join(fr, Seq("k"))
          .agg(coalesce(sum(col("fl") * col("fr")), lit(0).cast(dec)).as("er"))))
        .select(lit(name).as("join_name"),
          col("lr").cast("long").as("left_rows"),
          col("rr").cast("long").as("right_rows"),
          col("er").cast("long").as("est_rows"))
    }.reduce(_ unionByName _).orderBy("join_name")
  }

  /** CROSS-TABLE RECONCILIATION by bucketed checksums: did a copy /
    * migration / replication stream lose, duplicate, or corrupt rows?
    * Comparing 100 TB row-by-row is a full shuffle of both tables;
    * instead each side collapses to `buckets` rows — per key-hash
    * bucket: row count, an order-independent integer key checksum
    * (Σ k·C mod M — commutative, so partial aggregation works), and
    * the integer value sum. One full-outer join of two
    * `buckets`-sized frames localizes any drift to its bucket; only
    * mismatched buckets are emitted, each a targeted re-scan range
    * for the row-level diff that follows. All-integer arithmetic —
    * a one-cent value change flips its bucket deterministically.
    */
  def reconciliationReport(src: DataFrame, dst: DataFrame,
      key: Column, valueInt: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(key.cast("long").as("k"), valueInt.cast("long").as("v"))
        .groupBy(pmod(col("k"), lit(buckets.toLong)).as("bucket"))
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(pmod(col("k") * 1000003L, lit(2147483647L))).as(s"ksum_$tag"),
          sum("v").as(s"vsum_$tag"))
    side(src, "src").join(side(dst, "dst"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_src"), lit(0L)).as("n_src"),
        coalesce(col("n_dst"), lit(0L)).as("n_dst"),
        coalesce(col("ksum_src"), lit(0L)).as("ksum_src"),
        coalesce(col("ksum_dst"), lit(0L)).as("ksum_dst"),
        coalesce(col("vsum_src"), lit(0L)).as("vsum_src"),
        coalesce(col("vsum_dst"), lit(0L)).as("vsum_dst"))
      .filter(col("n_src") =!= col("n_dst") ||
        col("ksum_src") =!= col("ksum_dst") || col("vsum_src") =!= col("vsum_dst"))
      .orderBy("bucket")
  }

  /** ITEM-ITEM COLLABORATIVE FILTERING top-k: cosine similarity on
    * binary baskets — sim(a,b) = co(a,b)/√(n_a·n_b) — for each item's
    * co-purchased partners, keeping the k most similar (quantized
    * sim DESC, partner id tiebreak). The pair frame comes from the
    * basket self-join on the basket key (output ~|baskets|·width², the
    * [[partPairs]] bound — never item×item), support joins are
    * item-cardinality-sized, and the final per-item rank windows over
    * each item's candidate partners only. √ is correctly-rounded
    * IEEE, so the quantized similarity is engine-portable. This is
    * the serving table behind "customers who bought X also bought Y".
    */
  def itemItemRecs(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, k: Int): DataFrame = {
    val b = baskets.select(col(basketCol).as("bk"), col(itemCol).as("it")).distinct()
    val supp = b.groupBy(col("it")).agg(count(lit(1)).as("supp"))
    val pairs = b.as("x").join(b.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("ia"), col("y.it").as("ib"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minSupport)
    // both directions: each pair serves recs for BOTH endpoints
    val directed = pairs
      .unionByName(pairs.select(col("ib").as("ia"), col("ia").as("ib"), col("co")))
      .join(supp.select(col("it").as("ia"), col("supp").as("sa")), Seq("ia"))
      .join(supp.select(col("it").as("ib"), col("supp").as("sb")), Seq("ib"))
      .withColumn("sim", quant6(col("co").cast("double") /
        sqrt((col("sa") * col("sb")).cast("double"))))
    val w = Window.partitionBy("ia").orderBy(col("sim").desc, col("ib"))
    directed.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("ia").as("item"), col("rnk"), col("ib").as("rec"),
        col("co"), col("sim"))
      .orderBy("item", "rnk")
  }

  /** EQUI-WIDTH HISTOGRAM in two passes: one tiny (min, max) aggregate
    * broadcast back onto the scan, then one hash aggregation on the
    * computed bin index — never a sort, never a window; the shuffle
    * carries ≤ `bins` rows per partition. Bin bounds are derived in
    * pure integer arithmetic over caller-quantized values (width =
    * ⌈range+1 / bins⌉), so every engine buckets identically; the max
    * value lands in the last bin by the +1. Empty bins are absent
    * (the report is |non-empty bins| rows at any data size).
    */
  def histogramInt(df: DataFrame, valueInt: Column, bins: Int): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val vals = df.select(valueInt.cast("long").as("v"))
    val bounds = vals.agg(min("v").as("lo"), max("v").as("hi"))
    vals.crossJoin(broadcast(bounds))
      .withColumn("_w", expr(s"(hi - lo + $bins) div $bins")) // ceil((range+1)/bins)
      .withColumn("bin", expr("(v - lo) div _w"))
      .groupBy("bin")
      .agg(min(col("lo") + col("bin") * col("_w")).as("bin_lo"),
        min(col("lo") + (col("bin") + 1) * col("_w") - 1).as("bin_hi"),
        count(lit(1)).as("cnt"))
      .orderBy("bin")
  }

  /** APPLY A CDC FEED — the full merge semantics [[mergeUpsert]]
    * stops short of: the feed carries `change_type` ∈
    * {upsert, delete} plus a monotone `seqCol`, possibly MANY changes
    * per key and out of order. Per key the LATEST change wins (ONE
    * `max_by` aggregate — map-side combine ships ≤ |touched keys|
    * rows per partition, the [[latestRows]] kernel; never a window
    * sort of the whole feed), then: untouched target rows pass
    * through an anti-join, latest-upsert keys take the feed payload,
    * latest-delete keys vanish. Target is scanned once, shuffled at
    * most once; the feed side is |touched keys| after its aggregate —
    * broadcast-eligible when the day's changes are small, which is
    * the usual 100 TB shape (fact-sized target, dimension-day feed).
    */
  def applyCdc(target: DataFrame, feed: DataFrame, key: String,
      seqCol: String): DataFrame = {
    val payload = target.columns.filterNot(_ == key).toSeq
    require(payload.nonEmpty, "applyCdc needs at least one payload column")
    val latest = feed.groupBy(col(key))
      .agg(max_by(struct((Seq("change_type") ++ payload).map(col): _*),
        col(seqCol)).as("_c"))
      .select(Seq(col(key), col("_c.change_type").as("change_type")) ++
        payload.map(c => col(s"_c.$c").as(c)): _*)
    target.join(latest.select(col(key)), Seq(key), "left_anti")
      .unionByName(latest.filter(col("change_type") === "upsert")
        .select(target.columns.map(col): _*))
  }

  /** SPEARMAN RANK CORRELATION per group, engine-exact: Pearson over
    * AVERAGE ranks (the ties-correct definition), with every rank
    * doubled so tied averages stay integral — for a value with c
    * copies below-cumulative cum, 2·avgrank = 2·cum − c + 1. Ranks
    * come from per-(group, value) HISTOGRAMS (one map-side-combined
    * pass per variable; the rank cumsum windows over ≤|domain| rows,
    * never the fact table — callers pick bounded-domain variables,
    * the [[exactMedianQty]] discipline), joined back to the facts on
    * (group, value). The five moments accumulate in DECIMAL(38,0) —
    * exact integers — and the single ρ division happens once per
    * group in IEEE double, quantized to 6 dp. ρ ∈ [−1, 1]; +1 ⇒
    * monotone increasing relationship, robust to any monotone
    * transform (the reason analysts reach for Spearman over Pearson
    * on skewed data).
    */
  def spearmanByGroup(df: DataFrame, grp: Column,
      xInt: Column, yInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df.select(grp.as("grp"), xInt.cast("long").as("x"),
      yInt.cast("long").as("y"))
    def rank2(valCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("grp").orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.groupBy(col("grp"), col(valCol)).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(w))
        .select(col("grp"), col(valCol),
          (col("cum") * 2 - col("c") + 1).cast(dec).as(out))
    }
    base
      .join(rank2("x", "rx"), Seq("grp", "x"))
      .join(rank2("y", "ry"), Seq("grp", "y"))
      .groupBy("grp")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum("rx").as("sx"), sum("ry").as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
      .select(col("grp"), col("n").cast("long").as("n"),
        quant6((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("spearman"))
      .orderBy("grp")
  }

  /** ROBUST OUTLIERS by MEDIAN ABSOLUTE DEVIATION, zero floating
    * point until the display columns: x is an outlier iff
    * |x − median| > k·MAD. [[outlierCounts]]'s 2σ rule breaks when
    * the outliers themselves inflate σ (masking); median/MAD have a
    * 50% breakdown point. Everything ×2-scaled to dodge the
    * half-integer medians: med2 = v₁+v₂ (sum of the middle one-or-two
    * values), dev2 = |2x − med2|, mad2 = median of dev2 doubled the
    * same way, and the test 2·dev2 > k·mad2 is pure integer. BOTH
    * medians run on per-(group, value) histograms (the
    * [[exactMedianQty]] shape — rank math over ≤|domain| rows, one
    * corpus pass each; dev2's domain is ≤ 2·|x domain|), so nothing
    * fact-sized is ever sorted. Output per group: n, median, mad (the
    * exact halved doubles), n_outliers.
    */
  def madOutliers(df: DataFrame, grp: Column, vInt: Column,
      k: Int = 3): DataFrame = {
    val base = df.select(grp.as("grp"), vInt.cast("long").as("v"))
    // histogram median, ×2: v1 + v2 at ranks (n+1)/2 and (n+2)/2
    def med2Of(rows: DataFrame, out: String): DataFrame = {
      val cum = rows.groupBy("grp", "v").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(Window.partitionBy("grp").orderBy("v")))
        .withColumn("n", sum("c").over(Window.partitionBy("grp")))
      def valAt(rank: String, alias: String): DataFrame =
        cum.filter(col("cum") >= expr(rank)).groupBy("grp").agg(min("v").as(alias))
      valAt("(n+1) DIV 2", "v1").join(valAt("(n+2) DIV 2", "v2"), "grp")
        .select(col("grp"), (col("v1") + col("v2")).as(out))
    }
    val med = med2Of(base, "med2")
    val dev = base.join(med, "grp")
      .select(col("grp"), abs(col("v") * 2 - col("med2")).as("v"))
    val mad = med2Of(dev, "mad2")
    base.join(med, "grp").join(mad, "grp")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        min(col("med2").cast("double") / 2.0).as("median"),
        min(col("mad2").cast("double") / 4.0).as("mad"),
        sum(when(abs(col("v") * 2 - col("med2")) * 2 >
          lit(k.toLong) * col("mad2"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("grp")
  }

  /** TPC-H Q21 SHAPE — "the supplier who kept the order waiting":
    * LATE lines (shipped > 90 days after order date — the fixture's
    * lateness signal) on finished multi-supplier orders where EVERY
    * late line belongs to this one supplier, written as the
    * correlated EXISTS / NOT EXISTS SQL an analyst writes (the twin
    * runs the same shape). Catalyst DECORRELATES both subqueries
    * into one semi- and one anti-join on l_orderkey — no per-row
    * re-execution (q56's spec-asserted discipline; the probe sides
    * carry only (orderkey, suppkey, late)). The classic hard case
    * for subquery planners: the inner predicates reference BOTH the
    * outer row's orderkey and its suppkey
    * (`l2.l_suppkey <> l1.l_suppkey`), so naive unnesting loses the
    * inequality.
    */
  def waitingSuppliers(lineitem: DataFrame, supplier: DataFrame,
      orders: DataFrame, k: Int = 50): DataFrame = {
    val spark = lineitem.sparkSession
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val (lv, sv, ov) = (s"graft_q21l_$tag", s"graft_q21s_$tag", s"graft_q21o_$tag")
    lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
      .createOrReplaceTempView(lv)
    supplier.select("s_suppkey", "s_name").createOrReplaceTempView(sv)
    orders.select("o_orderkey", "o_orderstatus", "o_orderdate")
      .createOrReplaceTempView(ov)
    try spark.sql(
      s"""WITH l AS (SELECT l_orderkey, l_suppkey,
         |    CASE WHEN datediff(l_shipdate, o_orderdate) > 90
         |      THEN 1 ELSE 0 END AS late
         |  FROM $lv JOIN $ov ON l_orderkey = o_orderkey
         |  WHERE o_orderstatus = 'F')
         |SELECT s_name, count(*) AS numwait
         |FROM $sv, l l1
         |WHERE s_suppkey = l1.l_suppkey
         |  AND l1.late = 1
         |  AND EXISTS (SELECT 1 FROM l l2
         |    WHERE l2.l_orderkey = l1.l_orderkey
         |      AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM l l3
         |    WHERE l3.l_orderkey = l1.l_orderkey
         |      AND l3.l_suppkey <> l1.l_suppkey
         |      AND l3.late = 1)
         |GROUP BY s_name
         |ORDER BY numwait DESC, s_name
         |LIMIT $k""".stripMargin)
    finally {
      spark.catalog.dropTempView(lv)
      spark.catalog.dropTempView(sv)
      spark.catalog.dropTempView(ov)
    }
  }

  /** Benford's-law first-digit conformance per group (Benford 1938 —
    * public): fabricated or unit-mixed numeric columns betray
    * themselves by a first-significant-digit distribution that
    * departs from log₁₀(1 + 1/d). To keep the report ENGINE-EXACT the
    * expected distribution is carried as the standard integer
    * PER-MILLE constants (301, 176, 125, 97, 79, 67, 58, 51, 46 —
    * they sum to 1000), and the deviation is the pure-integer
    * `1000·observed − n·expected_milli` (positive = digit
    * over-represented, in milli-row units) — no float logs, nothing
    * to round, digits absent from a group still emit a row. The first
    * digit comes from the value's decimal string, not a float log
    * (log10 at power-of-ten boundaries is ulp-fragile). One
    * map-side-combined aggregate over the corpus + a 9-row-per-group
    * broadcast shape. Output: (grp, digit, observed, n,
    * dev_milli).
    */
  def benfordReport(df: DataFrame, grp: Column, vPos: Column): DataFrame = {
    val expected = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
    val base = df.select(grp.as("grp"), vPos.cast("long").as("v"))
      .filter(col("v") > 0)
      .select(col("grp"), substring(col("v").cast("string"), 1, 1)
        .cast("long").as("digit"))
    val obs = base.groupBy("grp", "digit").agg(count(lit(1)).as("observed"))
    val totals = base.groupBy("grp").agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    import spark.implicits._
    val digits = expected.zipWithIndex
      .map { case (e, i) => (i + 1L, e) }.toDF("digit", "exp_milli")
    totals.crossJoin(broadcast(digits))
      .join(obs, Seq("grp", "digit"), "left")
      .select(col("grp"), col("digit"),
        coalesce(col("observed"), lit(0L)).as("observed"), col("n"),
        (coalesce(col("observed"), lit(0L)) * 1000L -
          col("n") * col("exp_milli")).as("dev_milli"))
      .orderBy("grp", "digit")
  }

  /** LAG-k AUTOCORRELATION of a per-group integer series — the
    * seasonality detector ("do Mondays look like last Monday?"):
    * Pearson correlation between the series and itself shifted by
    * `lag` positions in `tOrd` order. The (x, y) pairs come from one
    * `lead` window over the PRE-AGGREGATED series (the corpus never
    * sorts — callers pass a per-period aggregate, so the window runs
    * over |periods| rows per group); the correlation then uses the
    * [[spearmanByGroup]] integer-moment tail: all five sums in
    * DECIMAL(38,0), one final quantized double. Groups with fewer
    * than lag+1 points have NO (x, y) pair at all and are OMITTED
    * from the output (the y.isNotNull filter removes every row);
    * groups with exactly lag+1 points emit one row whose acf is NULL
    * via the zero-variance division — never a crash. Output:
    * (grp, n_pairs, acf).
    */
  def autocorrInt(df: DataFrame, grp: Column, tOrd: Column, vInt: Column,
      lag: Int): DataFrame = {
    require(lag >= 1, "lag must be positive")
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy("grp").orderBy("t")
    df.select(grp.as("grp"), tOrd.as("t"), vInt.cast("long").as("x"))
      .withColumn("y", lead("x", lag).over(w))
      .filter(col("y").isNotNull)
      .select(col("grp"), col("x").cast(dec).as("x"), col("y").cast(dec).as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("grp"), col("n").cast("long").as("n_pairs"),
        quant6((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("acf"))
      .orderBy("grp")
  }

  /** GINI COEFFICIENT per group over integer values — the
    * concentration statistic for corpus audits ("is 90% of the
    * revenue / token mass in 1% of the keys?"). Uses the rank
    * identity G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with x ascending.
    * Σᵢ i·xᵢ is INVARIANT under permuting equal values, so it folds
    * over the per-(grp, value) HISTOGRAM instead of ranking rows: a
    * run of c copies of v occupying ranks r+1..r+c contributes
    * Σ i·v = v·c·(2r+c+1)/2, i.e. 2·Σᵢ i·xᵢ = Σ_runs v·c·(2r+c+1)
    * with r the cumulative count of strictly-smaller values. The
    * only window runs over the histogram (|distinct values| rows per
    * group, value-domain-bounded), NEVER the fact table — the same
    * two-phase discipline as [[weightedMedian]] / the MAD medians —
    * so the fact table contributes one map-side-combined aggregate
    * and nothing else sorts at 100 TB. Emits the exact integer
    * numerator and denominator (DECIMAL(38,0) — audit-grade, no
    * quantization) plus `gini_micro` = ⌊numer·10⁶ / denom⌋ as BIGINT —
    * an EXACT integral division (Spark `div` on decimals), never a
    * float: every value in the row is engine-portable bit-for-bit.
    * (numer·10⁶ must fit DECIMAL(38,0) — holds to ~10³¹ fact rows per
    * group at cent-scale values; a zero denominator — all values 0 —
    * yields NULL in both engines by the explicit guard.) Output:
    * (grp, n, numer, denom, gini_micro).
    */
  def giniInt(df: DataFrame, grp: Column, vInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val hist = df.select(grp.as("grp"), vInt.cast("long").as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).cast(dec).as("c"))
    val w = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("r", sum("c").over(w) - col("c"))
      .groupBy("grp")
      .agg(sum(col("c")).as("n"),
        sum(col("v").cast(dec) * col("c")).as("sx"),
        // 2·Σ i·x accumulated run-wise: v·c·(2r + c + 1)
        sum(col("v").cast(dec) * col("c") *
          (lit(2).cast(dec) * col("r") + col("c") + 1)).as("six2"))
      .select(col("grp"), col("n").cast("long").as("n"),
        (col("six2") - (col("n") + 1) * col("sx")).as("numer"),
        (col("n") * col("sx")).as("denom"))
      .withColumn("gini_micro",
        when(col("denom") > 0,
          expr("(numer * 1000000) div denom")).cast("long"))
      .orderBy("grp")
  }

  /** EXACT TRIMMED MEAN per group — the robust location statistic
    * (drop the lowest and highest `trimPermille`‰ of rows EXACTLY,
    * mean of the rest): the outlier-insensitive aggregate a feature
    * pipeline reaches for when [[giniInt]]/MAD have flagged heavy
    * tails. Zero floating point and NO fact sort — the [[giniInt]]
    * histogram-rank discipline: per-(group, value) counts carry a
    * cumulative-rank window over |distinct values| rows, each value
    * contributes `overlap([cumStart, cumEnd], [kLo+1, n−kLo])`
    * multiplicity, and the mean is one integer micro-unit DIV.
    * k = ⌊n·trim/1000⌋ from EACH side (the standard definition), so
    * groups smaller than 1000/trim rows trim nothing and degrade to
    * the plain mean — exact, not a special case. Output: (grp, n,
    * kept, trimmed_mean_micro) — all bounded integers (driver-hash
    * discipline).
    */
  def trimmedMeanInt(df: DataFrame, grp: Column, vInt: Column,
      trimPermille: Int = 50): DataFrame =
    trimmedMeanFromHist(
      df.select(grp.as("grp"), vInt.cast("long").as("v"))
        .groupBy("grp", "v").agg(count(lit(1)).as("c")),
      trimPermille)

  /** [[trimmedMeanInt]]'s render half over a PRE-BUILT value histogram
    * (grp, v, c) — factored out because the histogram is the
    * statistic's ADDITIVE sufficient state: the streaming-MV gate
    * folds per-batch count deltas into a bucketed histogram table and
    * renders day-close output through THIS exact code path. */
  private[graft] def trimmedMeanFromHist(hist: DataFrame,
      trimPermille: Int): DataFrame = {
    require(trimPermille >= 0 && trimPermille < 500,
      "trim must leave a nonempty middle")
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cumEnd", sum("c").over(w))
      .withColumn("cumStart", col("cumEnd") - col("c"))
      .withColumn("n", sum("c").over(Window.partitionBy("grp")))
      .withColumn("kLo", expr(s"(n * $trimPermille) div 1000"))
      // kept multiplicity of this value = |[cumStart+1, cumEnd] ∩
      // [kLo+1, n−kLo]| — pure integer interval overlap
      .withColumn("keep",
        greatest(lit(0L),
          least(col("cumEnd"), col("n") - col("kLo")) -
            greatest(col("cumStart"), col("kLo"))))
      .groupBy("grp")
      .agg(first(col("n")).as("n"),
        sum(col("keep")).as("kept"),
        sum(col("v").cast(dec) * col("keep").cast(dec)).as("skept"))
      .select(col("grp"), col("n").cast("long").as("n"),
        col("kept").cast("long").as("kept"),
        when(col("kept") > 0,
          expr("(skept * 1000000) div kept")).cast("long")
          .as("trimmed_mean_micro"))
      .orderBy("grp")
  }

  /** L-DIVERSITY release — [[kAnonymize]] hardened against the
    * homogeneity attack: a k-anonymous group whose SENSITIVE value is
    * constant still leaks it ("all 10 people in this ZIP+age band
    * have the same diagnosis"), so a group survives only if it has
    * ≥ k rows AND ≥ l DISTINCT sensitive values (Machanavajjhala et
    * al. 2007 — public). Same shape as k-anonymity: one aggregate
    * over the quasi-identifier groups (count + exact count-distinct
    * of the sensitive column), suppression by NULL-SAFE inner join
    * (`<=>` — groupBy places NULL quasi values in one group, and a
    * plain-equality release join would silently suppress that group
    * even when it passes the k/l filter), each released row carrying
    * (group_size, sensitive_diversity) as the evidence. The sensitive
    * value itself is NOT released — that's the point.
    */
  def lDiversify(df: DataFrame, idCol: String, quasi: Seq[Column],
      quasiNames: Seq[String], sensitive: Column, k: Int, l: Int): DataFrame = {
    require(quasi.nonEmpty && quasi.size == quasiNames.size && k >= 2 && l >= 2,
      "need quasi-identifiers, k >= 2, l >= 2")
    val qcols = quasi.zip(quasiNames).map { case (c, n) => c.as(n) }
    val rows = df.select(md5(col(idCol).cast("string").cast("binary")).as("pseud")
      +: (qcols :+ sensitive.as("_sens")): _*)
    val ok = rows.groupBy(quasiNames.map(col): _*)
      .agg(count(lit(1)).as("_n"), countDistinct(col("_sens")).as("_l"))
      .filter(col("_n") >= k && col("_l") >= l)
      .select(quasiNames.map(c => col(c).as(s"_g_$c")) ++
        Seq(col("_n"), col("_l")): _*)
    val cond = quasiNames.map(c => col(c) <=> col(s"_g_$c")).reduce(_ && _)
    rows.join(ok, cond)
      .select((col("pseud") +: quasiNames.map(col)) ++
        Seq(col("_n").as("group_size"), col("_l").as("sensitive_diversity")): _*)
      .orderBy("pseud")
  }

  /** CUSUM CHANGEPOINT detection per series, zero floating point:
    * the one-sided cumulative-sum statistic s_t = max(0, s_{t−1} +
    * (x_t − target)) flags a sustained upward shift when s_t exceeds
    * a threshold. Two exactness moves: (1) the recurrence is replaced
    * by the closed form s_t = c_t − min(0, min_{j≤t} c_j) with
    * c_t = Σ_{i≤t} d_i — clamped CUSUM is cumsum minus running min,
    * so it's TWO WINDOW AGGREGATES, not a sequential fold; (2) the
    * target is the series' own mean, cross-multiplied away:
    * d_t = n·x_t − S (n = points, S = Σx), making every quantity a
    * pure integer in DECIMAL(38,0). The threshold is in the same
    * n-scaled units: s_t > h·n triggers. Windows run over the
    * PRE-AGGREGATED per-period series (|periods| rows per group).
    * Output: (grp, n_periods, t_detect = first triggering t or NULL,
    * s_max) — s_max in n-scaled units.
    */
  def cusumChangepoint(df: DataFrame, grp: Column, tOrd: Column,
      vInt: Column, h: Long): DataFrame = {
    require(h > 0, "threshold must be positive")
    val dec = DecimalType(38, 0)
    val base = df.select(grp.as("grp"), tOrd.as("t"), vInt.cast("long").as("x"))
    val stats = base.groupBy("grp").agg(
      count(lit(1)).cast(dec).as("n"), sum(col("x").cast(dec)).as("s"))
    val w = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(stats, "grp")
      .withColumn("c", sum(col("n") * col("x").cast(dec) - col("s")).over(w))
      .withColumn("cusum", col("c") -
        least(lit(0).cast(dec), min("c").over(w)))
      .groupBy("grp")
      .agg(max(col("n")).cast("long").as("n_periods"),
        min(when(col("cusum") > col("n") * lit(h).cast(dec), col("t")))
          .as("t_detect"),
        max("cusum").cast("long").as("s_max"))
      .orderBy("grp")
  }

  /** CUSUM against a FIXED reference target — the true MONITORING
    * form ([[cusumChangepoint]] self-calibrates against the series'
    * own mean, which needs the whole series; a 100 TB ingest monitors
    * against a target fixed a priori, which is what makes the
    * statistic streamable: s_t = max(0, s_{t−1} + (x_t − target)) is
    * a per-group sequential fold whose carried state is ONE number).
    * Batch closed form, zero floating point: s_t = c_t − min(0,
    * min_{j≤t} c_j) with c_t = Σ d_i, d_i = x_i − target, everything
    * DECIMAL(38,0). Windows run over the PRE-AGGREGATED per-period
    * series. The streamed fold
    * ([[graft.streaming.StreamGates.cusumGate]]) continues the same
    * recurrence across micro-batches via the carry identity
    * s_t = max(s₀ + c_t, c_t − min_{1≤k≤t} c_k) and must land on
    * this exact output. Output: (grp, n_periods, t_detect = first t
    * with s_t > h or NULL, s_max).
    */
  def cusumFixedTarget(df: DataFrame, grp: Column, tOrd: Column,
      vInt: Column, target: Long, h: Long): DataFrame = {
    require(h > 0, "threshold must be positive")
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(grp.as("grp"), tOrd.as("t"), vInt.cast("long").as("x"))
      .withColumn("c", sum((col("x") - lit(target)).cast(dec)).over(w))
      .withColumn("cusum", col("c") -
        least(lit(0).cast(dec), min("c").over(w)))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_periods"),
        min(when(col("cusum") > lit(h).cast(dec), col("t"))).as("t_detect"),
        max("cusum").cast("long").as("s_max"))
      .orderBy("grp")
  }

  /** DENSE DAILY SPINE gap fill: every calendar day between each
    * group's first and last observation, missing days zero-filled —
    * the preprocessing step that makes POSITIONAL window semantics
    * (lag/lead-k, rolling ROWS frames) CALENDAR-correct on sparse
    * series (the t193 caveat: `lead(x, 7)` is only "one week" if no
    * date is missing). One aggregate to the per-group bounds, one
    * `sequence` explode over the bounds (rows = groups × span days —
    * the pre-aggregated period domain, never fact-sized), one left
    * join back. Output: (grp, dt, x) dense per group.
    */
  def denseDailySpine(df: DataFrame, grp: Column, dt: Column,
      vInt: Column): DataFrame = {
    val base = df.select(grp.as("grp"), to_date(dt).as("dt"),
      vInt.cast("long").as("x"))
    val spine = base.groupBy("grp")
      .agg(min("dt").as("lo"), max("dt").as("hi"))
      .select(col("grp"), explode(sequence(col("lo"), col("hi"))).as("dt"))
    spine.join(base, Seq("grp", "dt"), "left")
      .select(col("grp"), col("dt"), coalesce(col("x"), lit(0L)).as("x"))
      .orderBy("grp", "dt")
  }

  /** EXACT GROUPED CDF — `cume_dist()` semantics with NO fact-table
    * sort window: one map-side-combined histogram aggregate, then the
    * cumulative count runs over the (grp, value) histogram
    * (value-domain bounded). cume_dist assigns every tie the fraction
    * of rows ≤ v, which is exactly cum/n over the histogram — so one
    * row per DISTINCT value carries the whole distribution, and a
    * per-row assignment is a cheap equi-join back. The division is a
    * single IEEE op on both engines (bit-identical, no quantization
    * needed). Output: (grp, v, cd).
    */
  def cdfByGroup(df: DataFrame, grp: Column, vInt: Column): DataFrame = {
    val h = df.select(grp.as("grp"), vInt.cast("long").as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("grp")))
      .select(col("grp"), col("v"),
        (col("cum").cast("double") / col("n").cast("double")).as("cd"))
      .orderBy("grp", "v")
  }

  /** DISCRETE HAZARD TABLE — the survival-analysis life table with
    * ZERO floating point: for every duration t at which an event
    * (churn, failure) occurred, the number at risk (subjects with
    * duration ≥ t, censored or not), the event count, and the hazard
    * d/n in exact integer micro-units (`d·1e6 DIV n`). Right-censored
    * subjects (still alive at observation end) leave the risk set at
    * their censoring time without an event — the Kaplan-Meier
    * accounting, emitted as the exact integer table rather than the
    * survival product (Π(1−dᵢ/nᵢ) needs exp/ln or float products,
    * neither bit-portable; the table is the auditable form and the
    * product is one in-memory fold for whoever wants it). At-risk
    * counts are a REVERSE cumulative sum over the duration histogram
    * — one corpus aggregate, then windows over |distinct durations|
    * rows (global window, single task: the histogram is
    * domain-bounded, never fact-sized). Output:
    * (t, at_risk, events, hazard_micro) for event times only.
    */
  def hazardTable(df: DataFrame, duration: Column, event: Column): DataFrame = {
    val base = df.select(duration.cast("long").as("t"),
      event.cast("boolean").as("e"))
    val h = base.groupBy("t").agg(count(lit(1)).as("c"),
      sum(when(col("e"), 1L).otherwise(0L)).as("d"))
    val w = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("at_risk", sum("c").over(w))
      .filter(col("d") > 0)
      .select(col("t"), col("at_risk"), col("d").as("events"),
        expr("CAST((d * 1000000) DIV at_risk AS BIGINT)").as("hazard_micro"))
      .orderBy("t")
  }

  /** ISLANDS & GAPS over a sparse integer key domain — contiguous
    * runs of PRESENT ids, the sequence-completeness audit ("which
    * order-key ranges did the extract actually deliver?"). The
    * classic SQL form sorts the whole domain under one
    * `id − row_number()` window; here the fact table only feeds two
    * distributed ANTI-JOINS (an island start has no id−1, an island
    * end has no id+1 — shuffle-partitioned equi-joins), and only the
    * BOUNDARY rows (2 per island) reach the pairing windows. The
    * k-th start matches the k-th end, so two row_number windows over
    * O(islands) rows zip them. Output:
    * (island_start, island_end, span_len).
    */
  def islands(df: DataFrame, idCol: Column): DataFrame = {
    val ids = df.select(idCol.cast("long").as("id")).distinct()
    val starts = ids
      .join(ids.select((col("id") + 1).as("id")), Seq("id"), "left_anti")
      .select(col("id").as("island_start"))
      .withColumn("rk", row_number().over(Window.orderBy("island_start")))
    val ends = ids
      .join(ids.select((col("id") - 1).as("id")), Seq("id"), "left_anti")
      .select(col("id").as("island_end"))
      .withColumn("rk", row_number().over(Window.orderBy("island_end")))
    starts.join(ends, "rk")
      .select(col("island_start"), col("island_end"),
        (col("island_end") - col("island_start") + 1).as("span_len"))
      .orderBy("island_start")
  }

  /** EXACT DISTRIBUTED NTILE — the SQL-standard bucket assignment
    * (first n mod k buckets take one extra row) with NO fact-sized
    * sort window: global rank = (cumulative histogram count of
    * strictly-smaller values) + (row_number within the tie group by
    * unique id). The histogram windows run over |distinct values|
    * rows per group; the tie window partitions by (grp, value), so
    * its sort is bounded by the largest tie multiplicity, never the
    * group. The bucket formula is pure integer CASE math, identical
    * in DuckDB. Output: (grp, id, bucket).
    */
  def ntileExact(df: DataFrame, grp: Column, vInt: Column, id: Column,
      k: Int): DataFrame = {
    require(k >= 1, "need at least one bucket")
    val base = df.select(grp.as("grp"), vInt.cast("long").as("v"),
      id.cast("long").as("id"))
    val wcum = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = base.groupBy("grp", "v").agg(count(lit(1)).as("c"))
      .withColumn("cumb", sum("c").over(wcum) - col("c"))
      .withColumn("n", sum("c").over(Window.partitionBy("grp")))
      .drop("c")
    val wtie = Window.partitionBy("grp", "v").orderBy("id")
    base.join(hist, Seq("grp", "v"))
      .withColumn("rank", col("cumb") + row_number().over(wtie))
      .withColumn("bucket", expr(
        s"""CASE WHEN rank <= (n % $k) * (n DIV $k + 1)
           |  THEN (rank - 1) DIV (n DIV $k + 1) + 1
           |  ELSE (n % $k) + (rank - (n % $k) * (n DIV $k + 1) - 1)
           |    DIV (n DIV $k) + 1 END""".stripMargin))
      .select(col("grp"), col("id"), col("bucket").cast("long").as("bucket"))
      .orderBy("grp", "id")
  }

  /** PER-GROUP LINEAR TREND (OLS) in EXACT INTEGER MOMENTS — the
    * "is this metric rising and how fast" statistic per key:
    * slope = (n·Σty − Σt·Σy) / (n·Σt² − (Σt)²) and the matching
    * intercept, both emitted as micro-units via integral DIV over
    * DECIMAL(38,0) moments — one map-side-combined aggregate per
    * group, no window, no float until nothing is left to round.
    * Input is a series (grp, t, x) of integers (the autocorr/EWMA
    * contract). Degenerate groups (single point / constant t) emit
    * NULL in both engines via the explicit variance guard. Output:
    * (grp, n, slope_micro, intercept_micro).
    */
  def linearTrendInt(df: DataFrame, grp: Column, tOrd: Column,
      vInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    df.select(grp.as("grp"), tOrd.cast("long").as("t"),
        vInt.cast("long").as("x"))
      .groupBy("grp")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("t").cast(dec)).as("st"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("t").cast(dec) * col("t").cast(dec)).as("stt"),
        sum(col("t").cast(dec) * col("x").cast(dec)).as("stx"))
      .select(col("grp"), col("n").cast("long").as("n"),
        expr("CAST(CASE WHEN n * stt - st * st > 0 THEN " +
          "((n * stx - st * sx) * 1000000) div (n * stt - st * st) " +
          "END AS BIGINT)").as("slope_micro"),
        expr("CAST(CASE WHEN n * stt - st * st > 0 THEN " +
          "((sx * stt - st * stx) * 1000000) div (n * stt - st * st) " +
          "END AS BIGINT)").as("intercept_micro"))
      .orderBy("grp")
  }

  /** WEEKDAY SEASONAL PROFILE — the robust "what does a normal
    * Tuesday look like" table per key: the LOWER MEDIAN of daily
    * event counts per (key, ISO weekday), computed with the q58
    * histogram-rank discipline (cumulative counts over the
    * ≤|count-domain| histogram per cell — the fact table contributes
    * ONE map-side-combined daily aggregate, nothing ever sorts it).
    * Weekday is ISO (1 = Monday … 7 = Sunday) — Spark's `weekday()+1`
    * and the twin's `isodow()` agree; Spark's `dayofweek()` does NOT
    * (Sunday-origin). Output: (grp, wd, n_days, median_daily).
    */
  def weekdayMedianProfile(df: DataFrame, grp: Column,
      dateCol: Column): DataFrame = {
    val daily = df.select(grp.as("grp"), dateCol.cast("date").as("d"))
      .groupBy("grp", "d").agg(count(lit(1)).as("x"))
      .withColumn("wd", (weekday(col("d")) + 1).cast("long"))
    val hist = daily.groupBy("grp", "wd", "x").agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum("c").over(
        Window.partitionBy("grp", "wd").orderBy("x")))
      .withColumn("n", sum("c").over(Window.partitionBy("grp", "wd")))
    cum.filter(col("cum") >= expr("(n + 1) DIV 2"))
      .groupBy("grp", "wd")
      .agg(max("n").as("n_days"), min("x").as("median_daily"))
      .orderBy("grp", "wd")
  }

  /** MANN–KENDALL TREND TEST statistic per group — the
    * distribution-free companion to [[linearTrendInt]]: S = Σ_{i<j}
    * sign(x_j − x_i) over the series in t order (Mann 1945 / Kendall,
    * public). Pure integer arithmetic — sign counts, no moments, no
    * division — so a monotone drift is detected regardless of
    * magnitude or outliers. Input is a pre-aggregated series
    * (grp, t, x); the pair join is per-group over |series|² /2 pairs
    * (bounded by the series length, NEVER facts — the same contract
    * that keeps autocorr/EWMA/trend windows small). Output:
    * (grp, n_pairs, s_stat); S ≈ +n_pairs = strongly rising,
    * −n_pairs = strongly falling, near 0 = no monotone trend.
    */
  def mannKendallInt(df: DataFrame, grp: Column, tOrd: Column,
      vInt: Column): DataFrame = {
    val s = df.select(grp.as("grp"), tOrd.cast("long").as("t"),
      vInt.cast("long").as("x"))
    val a = s.select(col("grp"), col("t").as("ta"), col("x").as("xa"))
    val b = s.select(col("grp").as("grpb"), col("t").as("tb"),
      col("x").as("xb"))
    a.join(b, col("grp") === col("grpb") && col("ta") < col("tb"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("xb") > col("xa"), 1L)
          .when(col("xb") < col("xa"), -1L).otherwise(0L)).as("s_stat"))
      .orderBy("grp")
  }

  /** THEIL–SEN ROBUST SLOPE per group — the median of all pairwise
    * slopes (Theil 1950 / Sen 1968, public): up to ~29% contaminated
    * observations cannot move it, where one bad day drags the OLS
    * slope ([[linearTrendInt]]) arbitrarily. Each pair's slope is an
    * exact micro-unit integral division (truncation toward zero —
    * verified identical to the twin's `//` on negatives); the median
    * is the LOWER median element of the slope multiset (rank
    * (m+1) div 2 under a total order — no interpolation, the same
    * element in both engines). Pair frame bounded by |series|² per
    * group, never facts — and the median comes from the q58/gini
    * HISTOGRAM-RANK discipline: pairs reduce map-side to a
    * (grp, slope) histogram, the cumulative window sorts only
    * |distinct slopes| rows (domain-bounded), NEVER the pair set —
    * measured 17.8 s → the pair-sort window was the cost, not the
    * join. Output: (grp, n_pairs, theil_sen_micro).
    */
  def theilSenInt(df: DataFrame, grp: Column, tOrd: Column,
      vInt: Column): DataFrame = {
    val s = df.select(grp.as("grp"), tOrd.cast("long").as("t"),
      vInt.cast("long").as("x"))
    val a = s.select(col("grp"), col("t").as("ta"), col("x").as("xa"))
    val b = s.select(col("grp").as("grpb"), col("t").as("tb"),
      col("x").as("xb"))
    val hist = a.join(b, col("grp") === col("grpb") && col("ta") < col("tb"))
      .select(col("grp"),
        expr("((xb - xa) * 1000000) div (tb - ta)").as("sm"))
      .groupBy("grp", "sm").agg(count(lit(1)).as("c"))
    hist
      .withColumn("cum", sum("c").over(
        Window.partitionBy("grp").orderBy("sm")))
      .withColumn("m", sum("c").over(Window.partitionBy("grp")))
      .filter(col("cum") >= expr("(m + 1) div 2"))
      .groupBy("grp")
      .agg(max("m").as("n_pairs"), min("sm").as("theil_sen_micro"))
      .orderBy("grp")
  }

  /** ROLLING EXACT MEDIAN over a per-key SERIES — the robust
    * trend-line a monitoring pipeline wants where a rolling mean is
    * outlier-dragged: for each observation, the LOWER MEDIAN (element
    * ⌈n/2⌉ of the ascending window — integer-exact, no interpolation,
    * so both engines index the same element) of the last `window`
    * observations in t-order, partial windows included. Input must be
    * a pre-aggregated series (grp, t, x) — the same contract as the
    * autocorrelation/EWMA family: at 100 TB the fact table reduces to
    * the series in ONE partial-agg pass and the window sorts only
    * |series| rows per key, never facts. Output: (grp, t, x, med).
    */
  def rollingMedianInt(df: DataFrame, grp: Column, tOrd: Column,
      vInt: Column, window: Int = 7): DataFrame = {
    require(window >= 1, "window must be positive")
    val w = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(-(window - 1), Window.currentRow)
    df.select(grp.as("grp"), tOrd.as("t"), vInt.cast("long").as("x"))
      .withColumn("win", sort_array(collect_list(col("x")).over(w)))
      .withColumn("med",
        element_at(col("win"), ((size(col("win")) + 1) / 2)
          .cast("int")).cast("long"))
      .select("grp", "t", "x", "med")
      .orderBy("grp", "t")
  }

  /** ANALYZE-style COLUMN STATISTICS — the optimizer-statistics
    * collection pass a warehouse runs per column: an EXACT equi-depth
    * histogram (SQL-standard ntile semantics via [[ntileExact]], so
    * NO fact-sized sort — the quantile boundaries come from the value
    * histogram, only tie groups window) with per-bucket row count,
    * exact NDV, and min/max. These are precisely the statistics
    * cost-based optimizers feed on (selectivity from depth + NDV,
    * range pruning from min/max). `id` must be unique (the ntile tie
    * break and the join-back key). Output:
    * (bucket, n, ndv, min_v, max_v).
    */
  def columnStats(df: DataFrame, vInt: Column, id: Column,
      k: Int): DataFrame = {
    val base = df.select(vInt.cast("long").as("v"), id.cast("long").as("id"))
    val buckets = ntileExact(base, lit("all"), col("v"), col("id"), k)
    base.join(buckets.select(col("id"), col("bucket")), "id")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), countDistinct(col("v")).as("ndv"),
        min("v").as("min_v"), max("v").as("max_v"))
      .orderBy("bucket")
  }

  /** DETERMINISTIC EXACT-k RESERVOIR per group — keep exactly
    * min(k, |group|) rows per group, chosen as the k smallest
    * md5(seed:id) values: the hash IS the reservoir (uniform over any
    * arrival order, replayable across engines/retries/partitionings —
    * the hash-Bernoulli discipline for FIXED-SIZE samples, where
    * [[stratifiedSample]]'s rate form gives binomial counts).
    *
    * At 100 TB a group is SAMPLED, not sorted: for groups of
    * ≥ `fullRankBelow` rows a hash-prefix pre-filter keeps only rows
    * whose 60-bit hash prefix falls under a per-group cutoff sized
    * (k + 6√k + 16)/|group| — a Binomial(‑6σ) margin, so fewer than
    * k survivors has probability ~10⁻⁹ per group — and ONLY the
    * survivors (≈ k per group) enter the rank window. Prefix order
    * agrees with full-hash order (fixed-length hex), so the k
    * smallest hashes all pass the filter whenever ≥ k rows do; the
    * optional `verified` pass recounts survivors per group and FAILS
    * LOUDLY on the ~10⁻⁹ under-sample instead of returning a biased
    * sample (costs one extra scan — disable for known-safe replays).
    * Output: input columns + sample_rank. The input must not already
    * contain the working column names (refused, not overwritten).
    */
  def reservoirK(df: DataFrame, grp: Column, id: Column, k: Int,
      seed: String, fullRankBelow: Long = 10000L,
      verified: Boolean = true): DataFrame = {
    require(k >= 1, "k must be positive")
    val helpers = Seq("_g", "_id", "_h", "_h60", "_cnt", "_cut")
    val clash = helpers.filter(df.columns.contains)
    require(clash.isEmpty,
      s"reservoirK: input already has working column(s) ${clash.mkString(", ")}")
    val h = md5(concat_ws(":", lit(seed), id.cast("string")))
    val base = df.withColumn("_g", grp).withColumn("_id", id)
      .withColumn("_h", h)
      // numeric value of the first 15 hex chars: 60 uniform bits,
      // order-compatible with the full hash string
      .withColumn("_h60", conv(substring(col("_h"), 1, 15), 16, 10)
        .cast("long"))
    val counts = base.groupBy("_g").agg(count(lit(1)).as("_cnt"))
    val margin = k + 6.0 * math.sqrt(k.toDouble) + 16.0
    val filtered = base.join(counts, "_g")
      .withColumn("_cut",
        floor(least(lit(1.0), lit(margin) / col("_cnt")) *
          lit(math.pow(2.0, 60))).cast("long"))
      .filter(col("_cnt") < fullRankBelow || col("_h60") <= col("_cut"))
    val w = Window.partitionBy("_g").orderBy(col("_h"), col("_id"))
    val ranked = filtered
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
    if (verified) {
      // verify against `counts`, not the survivors: a group whose rows
      // were ALL removed by the prefix cutoff has no row in `ranked`
      // and would silently vanish if the grouping started there — the
      // outer join makes zero-survivor groups detectable too
      val got = ranked.groupBy("_g").agg(count(lit(1)).as("_got"))
      val bad = counts.join(got, Seq("_g"), "left_outer")
        .filter(coalesce(col("_got"), lit(0L)) =!=
          least(lit(k.toLong), col("_cnt")))
      require(bad.limit(1).isEmpty,
        "reservoirK: hash-prefix pre-filter under-sampled a group — " +
          "raise the margin (probability ~1e-9; this is the loud check)")
    }
    ranked.drop("_g", "_id", "_h", "_h60", "_cnt", "_cut")
  }

  /** PAIRWISE CLUSTERING-QUALITY METRICS — precision / recall / F1 of
    * a predicted clustering against ground truth, counted over PAIRS
    * (the record-linkage evaluation standard: a pair is a true
    * positive iff the two records share a predicted cluster AND a
    * truth cluster). Three aggregates over the (pred, truth) frame —
    * per-cluster sizes, per-truth sizes, per-joint sizes — each
    * reduced to Σ c·(c−1)/2 in pure integer math, then the three
    * one-row totals cross-joined and divided once into micro-units.
    * Never materializes a pair. Output: one row (tp, pred_pairs,
    * true_pairs, precision_micro, recall_micro, f1_micro).
    */
  def clusteringPairMetrics(assigned: DataFrame, pred: Column,
      truth: Column): DataFrame = {
    val a = assigned.select(pred.as("p"), truth.as("t"))
    def pairSum(keys: Column*): DataFrame =
      a.groupBy(keys: _*).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("(c * (c - 1)) DIV 2")), lit(0L)).as("s"))
    val pp = pairSum(col("p")).select(col("s").as("pred_pairs"))
    val tt = pairSum(col("t")).select(col("s").as("true_pairs"))
    val tp = pairSum(col("p"), col("t")).select(col("s").as("tp"))
    tp.crossJoin(pp).crossJoin(tt)
      .select(col("tp"), col("pred_pairs"), col("true_pairs"),
        // explicit zero guards: an all-singleton clustering has zero
        // pairs — Spark's non-ANSI DIV would null silently but the
        // DuckDB twin's // ERRORS on divide-by-zero; the CASE makes
        // both engines emit NULL identically in the degenerate case
        expr("CAST(CASE WHEN pred_pairs > 0 THEN " +
          "(tp * 1000000) DIV pred_pairs END AS BIGINT)")
          .as("precision_micro"),
        expr("CAST(CASE WHEN true_pairs > 0 THEN " +
          "(tp * 1000000) DIV true_pairs END AS BIGINT)")
          .as("recall_micro"),
        expr("CAST(CASE WHEN pred_pairs + true_pairs > 0 THEN " +
          "(2 * tp * 1000000) DIV (pred_pairs + true_pairs) " +
          "END AS BIGINT)").as("f1_micro"))
  }

  /** TIME-WEIGHTED AVERAGE of a step series per key — the TWAP /
    * time-weighted-balance statistic: each observation holds until
    * the next one (last-observation-carried-forward), so the average
    * weights every value by its holding time, all in exact integers:
    * integral = Σ vᵢ·(tᵢ₊₁ − tᵢ) in DECIMAL(38,0), twap_micro =
    * (integral·1e6) DIV span. Keys with one observation (zero span)
    * are omitted — a step function needs two points to hold. The lead
    * window partitions by key (per-key series are short; the fact
    * table never sorts globally). Output:
    * (key, n_obs, span, twap_micro).
    */
  def timeWeightedAvg(df: DataFrame, key: Column, tOrd: Column,
      vInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy("k").orderBy("t", "v")
    df.select(key.as("k"), tOrd.cast("long").as("t"),
        vInt.cast("long").as("v"))
      .withColumn("t2", lead("t", 1).over(w))
      .filter(col("t2").isNotNull)
      .groupBy("k")
      .agg(count(lit(1)).as("n_obs"),
        sum(col("t2") - col("t")).as("span"),
        sum((col("t2") - col("t")).cast(dec) * col("v").cast(dec))
          .as("integral"))
      .filter(col("span") > 0)
      .select(col("k"), (col("n_obs") + 1).as("n_obs"), col("span"),
        expr("CAST((integral * 1000000) DIV CAST(span AS DECIMAL(38,0)) " +
          "AS BIGINT)").as("twap_micro"))
      .orderBy("k")
  }

  /** OHLC BARS — open/high/low/close of an integer value per
    * (series, bucket): the candlestick aggregation, one
    * partial-aggregating pass with `min(struct(t, id, v))` /
    * `max(struct(t, id, v))` argmin/argmax for open/close (ties on
    * time break by id — deterministic on any engine, never a
    * first()-in-partition-order trap) and plain min/max for low/high.
    * Output: (series, bucket, open, high, low, close, n).
    */
  def ohlcBars(df: DataFrame, series: Column, bucket: Column, tOrd: Column,
      id: Column, vInt: Column): DataFrame =
    df.select(series.as("s"), bucket.as("b"), tOrd.cast("long").as("t"),
        id.cast("long").as("i"), vInt.cast("long").as("v"))
      .groupBy("s", "b")
      .agg(min(struct(col("t"), col("i"), col("v"))).as("_o"),
        max("v").as("high"), min("v").as("low"),
        max(struct(col("t"), col("i"), col("v"))).as("_c"),
        count(lit(1)).as("n"))
      .select(col("s"), col("b"), col("_o.v").as("open"), col("high"),
        col("low"), col("_c.v").as("close"), col("n"))
      .orderBy("s", "b")
}
