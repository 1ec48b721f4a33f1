package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Numeric._

/** Relational core: the substrate every CellPhe pipeline stage runs on
  * (scan/filter/agg/join/window/topk). TPC-H-shaped so the plans are
  * recognisable; dimension sides broadcast explicitly.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: hash aggregate with map-side
    * partial aggregation; single scan, filter pushed to parquet. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        davg(col("l_quantity"), 2, 4).as("avg_qty"),
        davg(col("l_extendedprice"), 2, 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped: selective dim filters -> fact join -> agg -> top-k.
    * Customer/orders sides are small relative to lineitem; Catalyst
    * broadcasts below the threshold, AQE re-plans at runtime. */
  def topkRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = lineitem.filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped multi-way join; nation/region/supplier broadcast. */
  def localSupplier(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                    supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val r = region.filter(col("r_name") === "ASIA")
    val dims = broadcast(
      nation.join(r, nation("n_regionkey") === r("r_regionkey")).select("n_nationkey", "n_name"))
    val sup = broadcast(supplier.select("s_suppkey", "s_nationkey"))
    lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(dims, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc)
  }

  /** TPC-H Q6-shaped: pure filter + single agg; every predicate and the
    * two-column projection must reach the parquet scan. */
  def filterAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))

  /** Window functions: per-customer order rank + running spend. */
  def windowRank(orders: DataFrame): DataFrame = {
    val byPrice = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .withColumn("rnk", row_number().over(byPrice))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(28,2)")).over(byDate).cast("double"))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "rnk", "running_spend")
  }

  /** Anti join: customers that never ordered (existence filters are
    * semi/anti joins, never distinct-join-distinct). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")

  /** ROLLUP: counts at (type, day), (type), and grand-total levels in
    * one pass (NULL marks the aggregated-out level, as in SQL). */
  def rollupCounts(events: DataFrame): DataFrame =
    events.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))

  /** CUBE: every grouping-set combination in one pass — the QC
    * summary-at-all-grains sibling of [[rollupCounts]] (rollup emits
    * the hierarchy prefixes; cube adds the (day-only) slice). Same
    * expand-based single-shuffle plan. */
  def cubeCounts(events: DataFrame): DataFrame =
    events.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .cube(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))

  /** Pivot: one column per event type (conditional aggregation — the
    * portable formulation every engine shares). */
  def pivotCounts(events: DataFrame, types: Seq[String]): DataFrame = {
    val aggs = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(t))
    events.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("day"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Set difference: user-days with clicks but no purchases. */
  def clickersWithoutPurchase(events: DataFrame): DataFrame = {
    def userDays(t: String) = events.filter(col("event_type") === t)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day")).distinct()
    userDays("click").except(userDays("purchase"))
  }

  /** TPC-H Q2-shaped min-per-group + achiever join: cheapest price per
    * part, keeping every lineitem that achieves it. The min table is an
    * aggregate of the fact itself — broadcast after aggregation. */
  def minPricePerPart(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val mins = lineitem.groupBy(col("l_partkey"))
      .agg(min(col("l_extendedprice")).as("min_price"))
    lineitem.join(mins, Seq("l_partkey"))
      .filter(col("l_extendedprice") === col("min_price"))
      .join(broadcast(part.select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("min_price"), col("l_orderkey"))
  }

  /** TPC-H Q13-shaped: orders-per-customer distribution including
    * zero-order customers (left join, count non-null, then histogram). */
  def orderCountHistogram(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left")
      .groupBy(customer("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q16-shaped: distinct-count aggregate (suppliers per part
    * type/brand). countDistinct expands to a two-phase aggregate. */
  def distinctSuppliersPerType(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.join(broadcast(part.select("p_partkey", "p_type", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("p_brand"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"),
        count(lit(1)).as("line_cnt"))

  /** TPC-H Q18-shaped: orders whose total quantity exceeds a threshold
    * (aggregate + having + join back for order attributes). */
  def largeOrders(lineitem: DataFrame, orders: DataFrame, minQty: Double): DataFrame = {
    val totals = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(28,2)")).cast("double").as("total_qty"))
      .filter(col("total_qty") > minQty)
    totals.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("total_qty"),
        col("o_totalprice"))
  }

  /** TPC-H Q22-shaped: scalar subquery (corpus-wide average) + anti
    * join, aggregated per nation. The scalar is an order-independent
    * decimal-exact average so the comparison is cross-engine stable. */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(28,2)")).cast("double") /
        count(lit(1))).as("avg_bal"))
    customer.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(28,2)")).cast("double").as("totacctbal"))
  }

  /** TPC-H Q4-shaped: EXISTS decorrelated to a semi join (orders with
    * any lineitem shipped >60 days after the order date), counted by
    * priority. The semi join never duplicates orders — the classic
    * reason EXISTS must not become an inner join. */
  def latePriorityOrders(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** TPC-H Q7-shaped: bidirectional volume between two nations by ship
    * year; both nation dims broadcast through supplier and customer. */
  def nationVolume(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                   supplier: DataFrame, nation: DataFrame,
                   nationA: String, nationB: String): DataFrame = {
    val sn = broadcast(supplier.join(nation,
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("supp_nation")))
    val cn = broadcast(customer.join(nation,
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(sn, Seq("l_suppkey"))
      .join(cn, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("volume"))
  }

  /** TPC-H Q10-shaped: returned-item revenue per customer, top 20. */
  def returnedItemReport(lineitem: DataFrame, orders: DataFrame,
                         customer: DataFrame, nation: DataFrame): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q11-shaped: per-part revenue kept only when it exceeds a
    * multiple of the mean per-part revenue (HAVING against a broadcast
    * global scalar — computed once and reused, not recomputed per
    * group). The mean-relative threshold is scale-invariant: a
    * fraction-of-total cut (the literal Q11 form) selects nothing once
    * the part count outgrows 1/fraction. */
  def importantParts(lineitem: DataFrame, multiple: Double): DataFrame = {
    val perPart = lineitem.groupBy(col("l_partkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("value"))
    val threshold = perPart
      .agg((sum(col("value").cast("decimal(28,4)")).cast("double") / count(lit(1))
        * multiple).as("thr"))
    perPart.join(broadcast(threshold))
      .filter(col("value") > col("thr"))
      .select(col("l_partkey"), col("value"))
  }

  /** TPC-H Q12-shaped: late lineitems classified by order priority
    * (conditional aggregation over a join — one pass, two counters). */
  def latePriorityCounts(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))

  /** TPC-H Q14-shaped: promo revenue share in one month (two
    * conditional sums, one ratio — single scan + single aggregate). */
  def promoRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(broadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(cround(
        lit(100.0) *
          dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(0.0), 4) /
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4),
        4).as("promo_revenue_pct"))

  /** TPC-H Q17-shaped: correlated per-part average decorrelated to an
    * aggregate + join (lineitems under 20% of their part's mean
    * quantity, for one brand). */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame, brand: String): DataFrame = {
    val avgQty = lineitem.groupBy(col("l_partkey"))
      .agg((dsum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"))
    lineitem
      .join(broadcast(part.filter(col("p_brand") === brand).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(avgQty, Seq("l_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(cround(dsum(col("l_extendedprice"), 2) / lit(7.0), 4).as("avg_yearly"))
  }

  /** TPC-H Q15-shaped: top supplier by quarterly revenue — an
    * aggregated view joined against its own broadcast MAX (the
    * view-plus-scalar-subquery form; the revenue doubles on both sides
    * come from the same decimal-exact sum, so the equality is
    * cross-engine stable). */
  def topSupplierRevenue(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** TPC-H Q19-shaped: disjunctive brand/size/quantity predicates as a
    * join condition — Catalyst pushes the common conjuncts and keeps
    * the OR residual on the broadcast join. */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.join(broadcast(part.select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#19" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30))))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))

  /** TPC-H Q2 (full form): cheapest supplier per part within a region.
    * The min is an aggregate of the probe side itself (group + achiever
    * join-back, like Q15's MAX); supplier/nation/region and the part
    * filter broadcast, so the only shuffle keys on ps_partkey. The
    * supplycost equality is cross-engine safe: both engines derive the
    * identical double from the same integer/100.0 op (olap.Partsupp). */
  def regionalCheapestSupplier(partsupp: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      regionName: String, partType: String, maxSize: Int): DataFrame = {
    val dims = broadcast(supplier
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region.filter(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
    val p = broadcast(part
      .filter(col("p_type") === partType && col("p_size") <= maxSize)
      .select(col("p_partkey")))
    val eligible = partsupp
      .join(dims, col("ps_suppkey") === col("s_suppkey"))
      .join(p, col("ps_partkey") === col("p_partkey"))
    val mins = eligible.groupBy(col("ps_partkey").as("mk"))
      .agg(min(col("ps_supplycost")).as("min_cost"))
    eligible.join(mins, col("ps_partkey") === col("mk") &&
        col("ps_supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("ps_partkey").as("p_partkey"), col("min_cost").as("supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q8-shaped national market share: one nation's fraction of a
    * region's import volume for one part type, by order year. Two
    * decimal-exact conditional sums in ONE aggregate (numerator and
    * denominator never scan twice); part/nation/region dims broadcast,
    * customer and orders join on their natural keys. */
  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame, part: DataFrame,
      regionName: String, partType: String, nationName: String): DataFrame = {
    val p = broadcast(part.filter(col("p_type") === partType).select("p_partkey"))
    val nr = broadcast(nation
      .join(region.filter(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")))
    val custR = customer.join(nr, col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val sn = broadcast(supplier
      .join(nation.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation")))
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem.select("l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(orders
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custR, col("o_custkey") === col("c_custkey"))
      .join(sn, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(cround(
        dsum(when(col("supp_nation") === nationName, vol).otherwise(0.0), 4) /
          dsum(vol, 4), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9-shaped product-line profit by nation and year: revenue
    * minus supply cost over the parts matching a name fragment. The
    * partsupp join carries both fact keys (partkey, suppkey); the
    * filtered part set and supplier->nation map broadcast. */
  def productProfit(lineitem: DataFrame, orders: DataFrame, partsupp: DataFrame,
      part: DataFrame, supplier: DataFrame, nation: DataFrame,
      nameSubstr: String): DataFrame = {
    val p = broadcast(part.filter(col("p_name").contains(nameSubstr)).select("p_partkey"))
    val sn = broadcast(supplier
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")))
    lineitem
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(partsupp, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(sn, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        col("ps_supplycost") * col("l_quantity"), 4).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q20-shaped excess-stock suppliers: suppliers whose availqty
    * for some name-matched part exceeds half of what they shipped of it
    * in a year — a decorrelated agg + semi join (the supplier side is
    * never duplicated per qualifying part). */
  def excessSuppliers(lineitem: DataFrame, partsupp: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, namePrefix: String): DataFrame = {
    val p = broadcast(part.filter(col("p_name").startsWith(namePrefix)).select("p_partkey"))
    val shipped = lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(col("l_quantity"), 2).as("qty"))
    val excess = partsupp
      .join(p, col("ps_partkey") === col("p_partkey"))
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") > lit(0.5) * col("qty"))
      .select(col("ps_suppkey")).distinct()
    supplier.join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21-shaped: in multi-supplier orders, blame the UNIQUE
    * supplier that shipped last (exists/not-exists pair decorrelated to
    * per-order aggregates + a distinct-count filter), top 10 by count. */
  def lastShipperBlame(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val orderStats = lineitem.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("nsupp"),
        max(col("l_shipdate")).as("max_ship"))
    val lastShippers = lineitem.join(orderStats, Seq("l_orderkey"))
      .filter(col("l_shipdate") === col("max_ship") && col("nsupp") >= 2)
    val blamed = lastShippers.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_last"),
        min(col("l_suppkey")).as("s_blamed"))
      .filter(col("n_last") === 1)
    blamed.groupBy(col("s_blamed")).agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("s_blamed") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }
}
