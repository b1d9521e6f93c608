package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The eleven TPC-H query shapes the round-10 surface was still missing
  * (Q2, Q8, Q9, Q11, Q12, Q13, Q16, Q17, Q20, Q21, Q22), completing the
  * classic 22 alongside the ones in [[Relational]] (Q1/3/4/5/6/7/10/14/15/
  * 18/19). SURVEY.md §2.2 group C/D: the fixtures carry no `partsupp`
  * table and no `l_shipmode`/`l_commitdate`/`l_receiptdate`/`c_phone`
  * columns, so:
  *
  *  - `partsupp` is DERIVED deterministically from the fact table
  *    ([[partsupp]] below): the distinct (l_partkey, l_suppkey) pairs with
  *    integer-arithmetic `ps_supplycost_cents` / `ps_availqty`. Both
  *    engines compute the identical derivation (the oracle SQL carries the
  *    same CTE), so every query over it sits on the cross-engine hash.
  *  - Q12's ship-mode split becomes a shipping-lateness split, Q21's
  *    receipt-vs-commit lateness becomes shipdate-vs-orderdate+90d, and
  *    Q22's phone-prefix cohort becomes the nation key — each preserves
  *    the query's PLAN shape (CASE-sum over a join; double-correlated
  *    EXISTS/NOT EXISTS; anti join + scalar-average subquery), which is
  *    what the TPC-H patterns exercise.
  *
  * Determinism protocol (SURVEY.md §7.4): money exact in BIGINT cents,
  * quantities exact BIGINT (fixture quantities are integral 1..50),
  * ratios as ONE IEEE division of two exactly-represented integers, every
  * output totally ordered with unique tie-breaks.
  */
object TpchOps {

  private def centsExpr(term: Column): Column =
    floor(term * 100 + lit(0.5)).cast("long")

  /** Derived partsupp: one distinct over the fact's (partkey, suppkey) —
    * a map-side-combinable aggregation; at 100 TB this is the one-time
    * staged/bucketed table production would maintain, here derived inline
    * so the oracle can reproduce it as a CTE. Cost/availability are pure
    * integer arithmetic on the keys: engine-portable bit-for-bit.
    */
  private[operators] def partsupp(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .select(
        col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"),
        expr("CAST((l_partkey * 7 + l_suppkey * 3) % 90000 + 100 AS BIGINT)")
          .as("ps_supplycost_cents"),
        expr("CAST((l_partkey * 31 + l_suppkey * 17) % 100 + 1 AS BIGINT)")
          .as("ps_availqty"))

  /** C/TPC-H Q2 shape: min-cost supplier per part within a region — the
    * correlated-min subquery, expressed as a per-part window `min` over the
    * region-restricted supplier set (ONE ps_partkey exchange; the oracle
    * keeps the textbook correlated form, so window-min == correlated-min is
    * what the hash proves). Region/nation broadcast (bounded dims);
    * supplier unhinted (scales with SF — AQE's call). Part filter applied
    * BEFORE the window: the correlation is per-part, so restricting to
    * surviving parts first is equivalent and prunes the window input.
    */
  def q2MinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val euro = partsupp(spark, sfDir)
      .join(Tables.supplier(spark, sfDir), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("s_nationkey") === col("n_nationkey"))
      .join(
        broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(
        Tables.part(spark, sfDir).filter(col("p_size") === 15).select(col("p_partkey")),
        col("ps_partkey") === col("p_partkey"))
    val w = Window.partitionBy(col("ps_partkey"))
    euro
      .withColumn("min_cost", min(col("ps_supplycost_cents")).over(w))
      .filter(col("ps_supplycost_cents") === col("min_cost"))
      .select(
        centsExpr(col("s_acctbal")).as("s_acctbal_cents"),
        col("s_name"), col("n_name"), col("p_partkey"), col("ps_supplycost_cents"))
      .orderBy(col("s_acctbal_cents").desc, col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** C/TPC-H Q8 shape: national market share — one nation's fraction of a
    * region's PROMO-part purchase volume by year. The fact is reduced by
    * the part/date filters before the dimension hops; nation appears twice
    * (customer side and supplier side) under distinct aliases. Share is a
    * conditional-sum over total — two exact BIGINT-cents sums, ONE IEEE
    * division (class-2: no rounding function anywhere).
    */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val cn = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
    val sn = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val asia = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    Tables.lineitem(spark, sfDir)
      .join(
        Tables.part(spark, sfDir).filter(col("p_type") === "PROMO").select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(
        Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= expr("CAST('1995-01-01 00:00:00' AS TIMESTAMP_NTZ)") &&
            col("o_orderdate") < expr("CAST('1997-01-01 00:00:00' AS TIMESTAMP_NTZ)")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .join(broadcast(asia), col("cn_region") === col("r_regionkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .withColumn("vol_cents", centsExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_7", col("vol_cents")).otherwise(lit(0L)))
        .cast("double") / sum(col("vol_cents")).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** C/TPC-H Q9 shape: product-type profit by supplier nation and year.
    * Profit per line = revenue cents − supplycost·quantity, BOTH exact
    * BIGINT (quantities are integral). partsupp joins the fact on the
    * composite (partkey, suppkey) key; since it is derived from the fact's
    * distinct pairs, every line matches exactly one row — the production
    * shape where partsupp is the staged side of a fact co-partitioned join.
    */
  def q9ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .join(
        Tables.part(spark, sfDir).filter(col("p_name").like("%gear%")).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("s_nationkey") === col("n_nationkey"))
      .join(
        partsupp(spark, sfDir),
        col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(
        centsExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))) -
          col("ps_supplycost_cents") * col("l_quantity").cast("long")).as("profit_cents"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** D/TPC-H Q11 shape: important stock — per-part inventory value within
    * one nation's suppliers, kept when above 1/1000 of the national total.
    * The total is the SUM OF THE PER-PART AGGREGATE (one scan lineage, no
    * second pass), broadcast back as a 1-row cross join; the threshold
    * compare is fully integer (`value·1000 > total`), no fractional
    * arithmetic anywhere.
    */
  def q11ImportantStock(spark: SparkSession, sfDir: String): DataFrame = {
    val perPart = partsupp(spark, sfDir)
      .join(Tables.supplier(spark, sfDir), col("ps_suppkey") === col("s_suppkey"))
      .join(
        broadcast(Tables.nation(spark, sfDir).filter(col("n_name") === "NATION_9")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("ps_partkey"))
      .agg(sum(col("ps_supplycost_cents") * col("ps_availqty")).as("value_cents"))
    val total = perPart.agg(sum(col("value_cents")).as("total_cents"))
    perPart
      .crossJoin(broadcast(total))
      .filter(col("value_cents") * 1000 > col("total_cents"))
      .select(col("ps_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("ps_partkey"))
  }

  /** D/TPC-H Q12 shape: the CASE-sum priority split over the order join —
    * ship-mode becomes shipping lateness (shipdate > orderdate + 60 days),
    * the fixture-expressible analog. One equi join on orderkey, one
    * 2-group aggregate; both CASE sums ride the same partial aggregation.
    */
  def q12LatePriority(spark: SparkSession, sfDir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .withColumn(
        "ship_bucket",
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"), lit("LATE"))
          .otherwise(lit("ONTIME")))
      .groupBy(col("ship_bucket"))
      .agg(
        sum(when(high, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
        sum(when(high, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
      .orderBy(col("ship_bucket"))
  }

  /** C/TPC-H Q13 shape: customer order-count distribution — LEFT join with
    * the filter IN THE JOIN CONDITION (not a WHERE, which would turn it
    * inner), `count(o_orderkey)` skipping the null-extended rows, then the
    * distribution aggregate over the per-customer counts. Two exchanges:
    * custkey, then c_count.
    */
  def q13CustomerDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select(col("c_custkey"))
    val o = Tables.orders(spark, sfDir).select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"))
    c.join(o, col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "5-LOW", "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** D/TPC-H Q16 shape: supplier counts per (brand, type, size) over
    * partsupp, excluding one brand/type, a size IN-list, and flagged
    * suppliers via NOT IN → LEFT ANTI against the (bounded, broadcast)
    * negative-balance supplier list. `count(DISTINCT ps_suppkey)` is the
    * shape's point — the distinct rides Spark's Expand-based partial
    * distinct aggregation, no extra self-join.
    */
  def q16SupplierCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val flagged = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    partsupp(spark, sfDir)
      .join(
        Tables.part(spark, sfDir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49)),
        col("p_partkey") === col("ps_partkey"))
      .join(broadcast(flagged), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** D/TPC-H Q17 shape: small-quantity-order revenue — the correlated
    * 0.2·avg(quantity) threshold per part, INTEGER-EXACT as
    * `qty · 5 · count < sum` (both sides BIGINT: multiply out the division
    * so no engine evaluates a fractional average). The per-part aggregate
    * is |parts| rows joined back on partkey; output is the classic single
    * "average yearly revenue" row — one IEEE division by 7.0.
    */
  def q17SmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val pq = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("a_partkey"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("n_li"))
    Tables.lineitem(spark, sfDir)
      .join(
        Tables.part(spark, sfDir)
          .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(pq, col("a_partkey") === col("l_partkey"))
      .filter(col("l_quantity").cast("long") * 5 * col("n_li") < col("sum_qty"))
      .agg(
        (sum(centsExpr(col("l_extendedprice"))).cast("double") / lit(7.0)).as("avg_yearly_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** C/TPC-H Q20 shape: suppliers holding excess stock of a named part
    * family relative to a year's shipments — availqty·2 > shipped-sum
    * (integer-exact halving), reduced to a distinct supplier-key set that
    * SEMI-joins the supplier dimension. The shipped aggregate shuffles on
    * the composite key once; everything after is |suppliers|-scale.
    */
  def q20ExcessSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val shipped = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= expr("CAST('1996-01-01 00:00:00' AS TIMESTAMP_NTZ)") &&
        col("l_shipdate") < expr("CAST('1997-01-01 00:00:00' AS TIMESTAMP_NTZ)"))
      .groupBy(col("l_partkey").as("sh_partkey"), col("l_suppkey").as("sh_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sh_qty"))
    val excess = partsupp(spark, sfDir)
      .join(
        Tables.part(spark, sfDir).filter(col("p_name").like("small%")).select(col("p_partkey")),
        col("p_partkey") === col("ps_partkey"))
      .join(shipped, col("sh_partkey") === col("ps_partkey") && col("sh_suppkey") === col("ps_suppkey"))
      .filter(col("ps_availqty") * 2 > col("sh_qty"))
      .select(col("ps_suppkey")).distinct()
    Tables.supplier(spark, sfDir)
      .join(
        broadcast(Tables.nation(spark, sfDir).filter(col("n_name") === "NATION_9")),
        col("s_nationkey") === col("n_nationkey"))
      .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), col("s_suppkey"))
      // suppkey tie-break: replicated fixtures (GenData) duplicate names
      .orderBy(col("s_name"), col("s_suppkey"))
  }

  /** C/TPC-H Q21 shape: the double-correlated EXISTS / NOT EXISTS —
    * suppliers who were the ONLY late supplier on a multi-supplier
    * finished order (lateness = shipdate > orderdate + 90 days, the
    * fixture-expressible analog of receipt-vs-commit). The EXISTS with a
    * key inequality becomes a LEFT SEMI join on orderkey with the
    * suppkey-≠ residual; the NOT EXISTS a LEFT ANTI on the late subset.
    * All three sides shuffle on the same orderkey, so the semi and anti
    * reuse the exchange; per-order fan is bounded (≤7 lines/order).
    */
  def q21WaitingSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(
        Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY")).as("late"))
    val l1 = lo.filter(col("late"))
    val l2 = lo.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val l3 = lo.filter(col("late"))
      .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    l1
      .join(l2, col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"), "left_semi")
      .join(l3, col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"), "left_anti")
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(
        broadcast(Tables.nation(spark, sfDir).filter(col("n_name") === "NATION_9")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** C/TPC-H Q22 shape: dormant high-balance customers — balance above the
    * global positive-balance average (scalar subquery → 1-row broadcast
    * cross join; the average is one IEEE division of exact cents/count)
    * AND no orders in the fixture's final year (ANTI join on the
    * date-filtered order side; the fixtures give every customer SOME
    * order, so dormancy is time-boxed — same anti-join plan as the
    * original's "no orders at all"). Cohort key: nation (the phone-prefix
    * analog). All-BIGINT output.
    */
  def q22DormantCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(
        col("c_custkey"), col("c_nationkey"),
        centsExpr(col("c_acctbal")).as("bal_cents"), col("c_acctbal"))
    val avgPos = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("bal_cents")).cast("double") / count(lit(1)).cast("double")).as("avg_cents"))
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= expr("CAST('2000-08-01 00:00:00' AS TIMESTAMP_NTZ)"))
      .select(col("o_custkey"))
    cust
      .crossJoin(broadcast(avgPos))
      .filter(col("bal_cents") > col("avg_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("cntry"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal_cents")).as("totacctbal_cents"))
      .orderBy(col("cntry"))
  }

  private val dayUs = 86400000000L

  /** D+: SHIP-LATENCY PERCENTILES — p50/p90/p99 of order-to-ship days
    * per order priority (exact rank picks, rank max(1, (p·n) DIV 100),
    * lower-quantile convention) plus the one-division mean: the
    * fulfillment-SLA readout. Rank arithmetic runs on the per-priority
    * DISTINCT-GAP grid (gaps are calendar-bounded), never a raw-fact
    * sort — the KS/winsorized posture on the order domain.
    *
    * Scale: one lineitem⋈orders equi join (the q12 exchange), one
    * aggregate onto the (priority × gap) grid, ≤5-row output.
    */
  def shipLatencyPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val gaps = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) DIV $dayUs").as("ship_day"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderpriority"),
        expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV $dayUs").as("order_day")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), (col("ship_day") - col("order_day")).as("gap"))
    val grid = gaps.groupBy(col("o_orderpriority"), col("gap"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("o_orderpriority")).orderBy(col("gap"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("o_orderpriority"))))
      .withColumn("sum_gap", sum(col("cnt") * col("gap")).over(
        Window.partitionBy(col("o_orderpriority"))))
      .withColumn("cum_prev", col("cum") - col("cnt"))
    def pick(p: Int, name: String): DataFrame =
      grid.filter(expr(s"greatest(CAST(1 AS BIGINT), ($p * n) DIV 100)") > col("cum_prev")
          && expr(s"greatest(CAST(1 AS BIGINT), ($p * n) DIV 100)") <= col("cum"))
        .select(col("o_orderpriority"), col("gap").as(name),
          col("n"), col("sum_gap"))
    // each pick is ≤|priorities| rows but Spark's size estimate for it is
    // fact-scale (it descends from the lineitem join), so without a hint
    // the three-way assembly sort-merges ≤5-row tables — broadcast them
    pick(50, "p50_days").drop("n", "sum_gap")
      .join(broadcast(pick(90, "p90_days").drop("n", "sum_gap")), "o_orderpriority")
      .join(broadcast(pick(99, "p99_days")), "o_orderpriority")
      .select(col("o_orderpriority"), col("n"),
        col("p50_days"), col("p90_days"), col("p99_days"),
        (col("sum_gap").cast("double") / col("n").cast("double")).as("mean_days"))
      .orderBy(col("o_orderpriority"))
  }

  /** D+: PARETO 80/20 — the supplier concentration cutoff: how many
    * suppliers (by descending revenue, suppkey tie-break) cover 80% of
    * total revenue. The 80% threshold is EXACT integer arithmetic
    * (supplier included while 5·cum_prev < 4·total — no float share ever
    * compared), with one-division shares for reporting. The
    * concentration complement of `gini_revenue_segments` / `hhi`.
    *
    * Scale: one supplier-keyed revenue aggregate (bounded by the
    * supplier dimension), rank windows on that bounded table.
    */
  def paretoSuppliers80(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"),
        expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)")
          .as("c"))
      .groupBy(col("l_suppkey")).agg(sum(col("c")).as("rev"))
    val w = Window.orderBy(col("rev").desc, col("l_suppkey"))
    rev
      .withColumn("cum", sum(col("rev")).over(w))
      .withColumn("cum_prev", col("cum") - col("rev"))
      .crossJoin(broadcast(rev.agg(
        sum(col("rev")).as("total_cents"),
        count(lit(1)).as("n_suppliers"),
        max(col("rev")).as("top1_cents"))))
      .agg(
        max(col("n_suppliers")).as("n_suppliers"),
        sum(when(col("cum_prev") * 5L < col("total_cents") * 4L, 1L).otherwise(0L))
          .as("n_top_80"),
        max(col("total_cents")).as("total_cents"),
        max(col("top1_cents")).as("top1_cents"))
      .select(
        col("n_suppliers"), col("n_top_80"), col("total_cents"),
        (col("n_top_80").cast("double") / col("n_suppliers").cast("double"))
          .as("share_of_suppliers"),
        (col("top1_cents").cast("double") / col("total_cents").cast("double"))
          .as("top1_revenue_share"))
  }

  /** D+: OPEN-ORDER BACKLOG — concurrent open orders per week via the
    * interval-sweep pattern: each order contributes +1 at its order day
    * and −1 the day after its LAST shipment; the running sum over the
    * bounded day grid is the live backlog, rolled up to weekly peak and
    * week-end levels. The sweep is THE scale shape for interval
    * concurrency — no per-day × per-order join exists anywhere.
    *
    * Scale: one lineitem max-aggregate + one orders projection → a ±1
    * delta table with ≤2 rows per order, summed onto the calendar-
    * bounded day grid; the cumulative window and weekly rollup run on
    * ≤span-days rows.
    */
  def openOrdersWeekly(spark: SparkSession, sfDir: String): DataFrame = {
    val close = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) DIV $dayUs").as("ship_day"))
      .groupBy(col("l_orderkey")).agg(max(col("ship_day")).as("close_day"))
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV $dayUs").as("open_day"))
      .join(close, col("o_orderkey") === col("l_orderkey"))
    val deltas = orders.select(col("open_day").as("day"), lit(1L).as("delta"))
      .unionByName(orders.select((col("close_day") + 1L).as("day"), lit(-1L).as("delta")))
      .groupBy(col("day")).agg(sum(col("delta")).as("d"))
    deltas
      .withColumn("open", sum(col("d")).over(Window.orderBy(col("day"))))
      .groupBy(expr("day DIV 7").as("week"))
      .agg(
        max(col("open")).as("peak_open"),
        expr("max_by(open, day)").as("week_end_open"))
      .orderBy(col("week"))
  }
}
