package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational-core queries over the TPC-H-ish star schema: the join/agg
  * shapes the reference's per-task lookups become at warehouse scale
  * (SURVEY §2.4/§2.5). These are the bench headliners — each scaladoc notes
  * the intended physical plan; `.explain` is audited in PlanAuditSpec.
  */
object RelationalOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables.read(s, dir, n)

  /** TPC-H Q3 shape: selective dim filter → join fan-in → top-k by revenue.
    * customer scales linearly with SF (TPC-H SF×150k rows), so the join is
    * deliberately UNHINTED: statistics/AQE broadcast the filtered side while
    * it fits and fall back to a shuffle join at cluster scale — a forced
    * `broadcast()` would pin a driver-OOM plan at 100 TB. Top-10 is
    * TakeOrderedAndProject (no global sort).
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01 00:00:00").cast("timestamp")
    val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").where(col("o_orderdate") < cutoff)
    val li = t(s, dir, "lineitem").where(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .select(
        col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingPrioritySql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: snowflake fan-in (region→nation→customer + supplier)
    * around the orders⋈lineitem spine. nation/region are CONSTANT-size →
    * forced broadcast is always right; customer/supplier scale linearly
    * with SF → left unhinted so statistics/AQE broadcast only while they
    * fit (at sf0.001–0.1 the plan is identical to the hinted one, pinned
    * in PlanAuditSpec). The co-located-nation predicate
    * (c_nationkey = s_nationkey) mirrors Q5's local-supplier semantics.
    */
  def q5LocalSupplierRevenue(s: SparkSession, dir: String): DataFrame = {
    val reg = t(s, dir, "region").where(col("r_name") === "ASIA")
    val nat = t(s, dir, "nation")
    val cust = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val ord = t(s, dir, "orders").where(
      col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    val li = t(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(
        cust,
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("n_name")
  }

  val q5LocalSupplierRevenueSql: String =
    """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Ranked-window top-k per group (§2.6 extension the reference gets from
    * Catalyst for free): row_number over (priority, price desc). Spark 3.5+
    * pushes a WindowGroupLimit below the shuffle, so each partition only
    * keeps k rows — the scalable form of per-group top-k.
    */
  def topOrdersPerPriority(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rank_in_priority", row_number().over(w).cast("long"))
      .where(col("rank_in_priority") <= 3)
      .select(
        col("o_orderpriority"), col("rank_in_priority"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy("o_orderpriority", "rank_in_priority")
  }

  /** TPC-H Q6 shape: pure scan-filter-agg — the pushdown showcase. Every
    * predicate reaches the parquet reader; no shuffle at all (single global
    * aggregate).
    */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(
        col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.09 &&
          col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  val q6ForecastRevenueSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount >= 0.02 AND l_discount <= 0.09
      |  AND l_quantity < 24""".stripMargin

  /** ROLLUP over (returnflag, linestatus) — grouping-set hierarchy the
    * reference never had but Catalyst gives free (SURVEY §2.5). Null
    * grouping markers are coalesced to 'ALL' so the oracle compare is
    * null-free.
    */
  def rollupPricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")

  val rollupPricingSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** CUBE over the same pricing grain — all four grouping combinations in
    * one pass (Spark expands grouping sets map-side; still one shuffle).
    */
  def cubePricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")

  val cubePricingSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Running (cumulative) daily revenue per return flag — the
    * rows-unbounded-preceding window frame (§2.6). Frame state is one
    * accumulator per partition row stream; the shuffle keys on the flag,
    * order is within-partition — no global sort.
    */
  def runningRevenue(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("ship_day"))
      .agg(round(sum(col("l_extendedprice")), 2).as("day_rev"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("ship_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_rev", round(sum(col("day_rev")).over(w), 2))
      .where(col("ship_day") < lit("1995-04-01").cast("date"))
      .orderBy("l_returnflag", "ship_day")
  }

  val runningRevenueSql: String =
    """WITH daily AS (
      |  SELECT l_returnflag, date_trunc('day', l_shipdate)::DATE AS ship_day,
      |    round(sum(l_extendedprice), 2) AS day_rev
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, ship_day, day_rev,
      |  round(sum(day_rev) OVER (PARTITION BY l_returnflag ORDER BY ship_day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_rev
      |FROM daily
      |WHERE ship_day < DATE '1995-04-01'
      |ORDER BY l_returnflag, ship_day""".stripMargin

  /** Day-over-day revenue deltas per return flag — the lag() window
    * family (§2.6): previous-day revenue and the signed delta, null-safe
    * on the first day of each partition. Same partitioning as
    * [[runningRevenue]]: shuffle on the flag, order within partitions.
    */
  def revenueDeltas(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("ship_day"))
      .agg(round(sum(col("l_extendedprice")), 2).as("day_rev"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("ship_day"))
    daily
      .withColumn("prev_rev", lag(col("day_rev"), 1).over(w))
      .withColumn("delta", round(col("day_rev") - coalesce(col("prev_rev"), col("day_rev")), 2))
      .where(col("ship_day") < lit("1995-04-01").cast("date"))
      .orderBy("l_returnflag", "ship_day")
  }

  val revenueDeltasSql: String =
    """WITH daily AS (
      |  SELECT l_returnflag, date_trunc('day', l_shipdate)::DATE AS ship_day,
      |    round(sum(l_extendedprice), 2) AS day_rev
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, ship_day, day_rev,
      |  lag(day_rev, 1) OVER (PARTITION BY l_returnflag ORDER BY ship_day) AS prev_rev,
      |  round(day_rev - coalesce(
      |    lag(day_rev, 1) OVER (PARTITION BY l_returnflag ORDER BY ship_day),
      |    day_rev), 2) AS delta
      |FROM daily
      |WHERE ship_day < DATE '1995-04-01'
      |ORDER BY l_returnflag, ship_day""".stripMargin

  /** Left-semi join (EXISTS shape, §2.4): orders having at least one
    * late-shipped line, counted per priority. The semi join never
    * materializes lineitem columns — at scale that halves the shuffle.
    */
  def semiJoinLateOrders(s: SparkSession, dir: String): DataFrame = {
    val late = t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"))
    t(s, dir, "orders")
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")
  }

  val semiJoinLateOrdersSql: String =
    """SELECT o_orderpriority, count(*) AS n_late_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q10 shape: returned-item revenue per customer, top 20. Three-way
    * join with the selective filter (returnflag = 'R') applied BEFORE the
    * joins so the big side shrinks first; top-20 via TakeOrderedAndProject.
    * customer is SF-scaled → unhinted (stats/AQE decide); nation is
    * constant-size → hinted broadcast.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val returned = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
    val ord = t(s, dir, "orders").where(
      col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
    returned
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedItemsSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q18 shape (large-volume orders): a grouped HAVING feeding a
    * LEFT SEMI join back onto the fact chain, then the customer/order
    * rollup. The qualifying-order set is ~1% of orders at the 250
    * threshold — small at test scale but PROPORTIONAL to the corpus, so
    * the join is left unhinted and AQE broadcasts only when the measured
    * aggregate actually fits. Top-k via orderBy+limit plans
    * TakeOrderedAndProject.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val qualifying = li
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sq"))
      .where(col("sq") > 250)
      .select(col("l_orderkey").as("q_orderkey"))
    // no forced broadcast: the qualifying set scales with order count
    // (~1% of orders) — at 100 TB that exceeds the broadcast limit, so
    // AQE decides from the actual aggregate size (same rule as J1)
    li
      .join(qualifying, col("l_orderkey") === col("q_orderkey"), "left_semi")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(20)
  }

  val q18LargeOrdersSql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  round(sum(l_quantity), 2) AS total_qty
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(l_quantity) > 250)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 20""".stripMargin

  /** Grouped top-k via the typed [[graft.functions.TopKAggregator]] — the
    * §2.11 `Aggregator` surface as a first-class query. Same result as the
    * ranked-window form ([[topOrdersPerPriority]]'s shape), different
    * physical contract: the aggregate is MERGEABLE, so map-side partials
    * hold k rows per group and the exchange moves groups·k rows — the
    * bound a 100 TB grouped top-k needs when a window's per-partition
    * group-limit can't apply (e.g. opaque scoring models).
    */
  def topOrdersAggregator(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import s.implicits._
    val topk = new graft.functions.TopKAggregator(k).toColumn
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.name("topk"))
      .flatMap { case (pri, items) =>
        items.zipWithIndex.map { case ((price, okey), i) =>
          (pri, (i + 1).toLong, okey, price)
        }
      }
      .toDF("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rank")
  }

  def topOrdersAggregatorSql(k: Int = 3): String =
    s"""SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
       |  SELECT o_orderpriority, o_orderkey, o_totalprice,
       |    row_number() OVER (PARTITION BY o_orderpriority
       |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
       |  FROM orders)
       |WHERE rank <= $k ORDER BY o_orderpriority, rank""".stripMargin

  /** TPC-H Q14 shape: promo revenue share — conditional aggregate over a
    * part-dim join, one output row. part is SF-scaled (TPC-H SF×200k), so
    * the join is unhinted: parquet size stats broadcast it while small.
    */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(
        col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-07-01 00:00:00").cast("timestamp"))
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg(
        round(
          sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(0.0)) * 100.0 /
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("promo_revenue_pct"))

  val q14PromoRevenueSql: String =
    """SELECT round(
      |  sum(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) * 100.0 /
      |  sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""".stripMargin

  /** TPC-H Q17 shape: small-quantity-order revenue — the correlated scalar
    * subquery (avg quantity per part) planned as an aggregate joined back.
    * The aggregate is one row PER PART (SF-scaled), so the join-back is
    * unhinted: AQE broadcasts the measured aggregate while it fits and
    * shuffles on partkey beyond that.
    */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val avgQty = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    li.join(avgQty, col("l_partkey") === col("a_partkey"))
      .where(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(
        round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q17SmallQuantitySql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
      |  count(*) AS n_lines
      |FROM lineitem l
      |WHERE l_quantity < 0.5 * (
      |  SELECT avg(l_quantity) FROM lineitem WHERE l_partkey = l.l_partkey)""".stripMargin

  /** The SAME Q17 semantics written as a GENUINE correlated scalar subquery
    * through `spark.sql` — the decorrelation demo: Catalyst's
    * RewriteCorrelatedScalarSubquery turns the per-row subquery into the
    * aggregate-joined-back plan of [[q17SmallQuantity]] (a per-row
    * re-execution would be O(n·n) at 100 TB; the rewrite makes it one
    * aggregate + one join). The optimized plan is pinned subquery-free in
    * PlanAuditSpec; correctness shares [[q17SmallQuantitySql]]'s oracle.
    */
  def q17CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem l
        |WHERE l_quantity < 0.5 * (
        |  SELECT avg(l_quantity) FROM lineitem WHERE l_partkey = l.l_partkey)""".stripMargin)
  }

  /** TPC-H Q4 shape: orders with at least one late-shipped line, counted by
    * priority. The EXISTS subquery (correlated on orderkey AND an
    * inequality against the outer row's date) plans as a LEFT SEMI hash
    * join on the equi-key with the date comparison as its residual — the
    * decorrelation shape distinct from Q17's scalar aggregate. The
    * reference lacks commit/receipt dates, so "late" = shipped more than
    * 90 days after order date.
    */
  def q4LateOrders(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").where(
      col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > expr("timestampadd(DAY, 90, o_orderdate)"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val q4LateOrdersSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q13 shape: the order-count DISTRIBUTION over customers,
    * INCLUDING zero-order customers — the left-outer-join-then-count-child
    * shape (count(o_orderkey) counts non-nulls, so unmatched customers
    * contribute n_orders = 0). A join-condition filter (non-urgent orders
    * only) must stay in the JOIN, not a WHERE — moving it would silently
    * drop the zero bucket.
    */
  def q13OrderHistogram(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "customer")
      .join(
        t(s, dir, "orders").where(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
    perCust
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("n_orders").desc)
  }

  val q13OrderHistogramSql: String =
    """SELECT n_orders, count(*) AS n_customers FROM (
      |  SELECT c_custkey, count(o_orderkey) AS n_orders
      |  FROM customer
      |  LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY n_orders ORDER BY n_customers DESC, n_orders DESC""".stripMargin

  /** TPC-H Q22 shape: customers with above-average positive balance and NO
    * URGENT orders — an uncorrelated scalar subquery (the average,
    * broadcast as a one-row frame) plus NOT EXISTS (left ANTI join whose
    * right side is pre-filtered; every customer here has SOME order, so
    * the anti join must apply the priority filter on the build side, not
    * as a residual, to produce a non-trivial result). The average is
    * rounded to 4dp on BOTH engines before the comparison so summation
    * order cannot flip a boundary row.
    */
  def q22IdleBalance(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val avgBal = cust.where(col("c_acctbal") > 0.0)
      .agg(round(avg(col("c_acctbal")), 4).as("ab"))
    cust
      .crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("ab"))
      .join(
        t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nation"))
      .agg(
        count(lit(1)).as("n_custs"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy("nation")
  }

  val q22IdleBalanceSql: String =
    """SELECT c_nationkey AS nation, count(*) AS n_custs,
      |  round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT round(avg(c_acctbal), 4) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey ORDER BY nation""".stripMargin

  /** TPC-H Q2 shape: ARGMIN per group via a correlated scalar EQUALITY
    * subquery (`price = (SELECT min(price) ... WHERE same part)`) — the
    * other decorrelation pattern beside Q17's inequality-vs-aggregate:
    * Catalyst rewrites it to a per-part min aggregate joined back on
    * (partkey, price). Expressed through `spark.sql` so the rewrite is
    * exercised from SQL; the DuckDB oracle runs the IDENTICAL text.
    */
  private val q2ArgminText: String =
    """SELECT l_partkey, l_suppkey, round(l_extendedprice, 2) AS min_price
      |FROM lineitem l
      |WHERE l_extendedprice = (
      |  SELECT min(l_extendedprice) FROM lineitem
      |  WHERE l_partkey = l.l_partkey)
      |ORDER BY l_partkey, l_suppkey LIMIT 50""".stripMargin

  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(q2ArgminText)
  }

  val q2MinCostSupplierSql: String = q2ArgminText

  /** TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS and
    * NOT-EXISTS BOTH correlated against the same fact table — the last
    * classic decorrelation pattern after Q2/Q4/Q17/Q22. A late line (shipped
    * >90 days after order date, the Q4 lateness adaption — the reference
    * schema has no commit/receipt dates) qualifies when its order has
    * ANOTHER supplier's line (EXISTS → left-semi on orderkey with a
    * supplier-inequality residual) but NO other supplier's LATE line
    * (NOT EXISTS → left-anti whose correlated condition references TWO
    * outer columns, l_orderkey and o_orderdate). Catalyst plans one semi
    * and one anti hash join over the same scan — a per-row re-execution of
    * either subquery would be O(n²) at 100 TB. Shared text: the DuckDB
    * oracle runs the IDENTICAL query.
    */
  private val q21Text: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_1'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  def q21WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    Seq("supplier", "lineitem", "orders", "nation")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(q21Text)
  }

  val q21WaitingSuppliersSql: String = q21Text

  /** TPC-H Q20 shape (part-availability supplier screen): the NESTED
    * semi-join chain — an IN whose subquery itself contains an IN plus a
    * grouped HAVING: suppliers shipping >90 units of some PROMO part since
    * 1997 (~19% of suppliers at sf0.01). Catalyst decorrelates both levels to left-semi hash joins (part
    * screen into the per-(supplier, part) aggregate, aggregate into
    * supplier); nothing re-executes per row. Shared text with the oracle.
    */
  private val q20Text: String =
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING sum(l_quantity) > 90)
      |ORDER BY s_suppkey""".stripMargin

  def q20PromoSuppliers(s: SparkSession, dir: String): DataFrame = {
    Seq("supplier", "lineitem", "part")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(q20Text)
  }

  val q20PromoSuppliersSql: String = q20Text

  /** TPC-H Q12 shape (shipping-priority split): join + TWO-WAY conditional
    * aggregation — the high/low line counts branch on the SAME dimension
    * column inside sum(CASE), so one pass computes both. The lateness band
    * (shipped >60 days after order) filters before the group; the reference
    * schema has no shipmode, so priority plays its role. One shuffle for
    * the join, map-side partials for the conditional sums.
    */
  def q12ShipPriority(s: SparkSession, dir: String): DataFrame = {
    val urgent = Seq("1-URGENT", "2-HIGH")
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > expr("timestampadd(DAY, 60, o_orderdate)"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin(urgent: _*), 1).otherwise(0))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin(urgent: _*), 1).otherwise(0))
          .as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val q12ShipPrioritySql: String =
    """SELECT l_linestatus,
      |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
      |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END)::BIGINT AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q15 shape (top supplier): an aggregated view referenced TWICE —
    * once as the join input and once under a scalar MAX. The SQL
    * scalar-subquery form executes the subquery as a SEPARATE plan in
    * Spark, so lineitem is scanned and aggregated twice (measured: 2
    * scans, 0 reuse) — at 100 TB that is a second full pass over the
    * fact table. The library form therefore builds ONE DataFrame plan
    * where both references descend from the same grouped aggregate:
    * Spark's ReuseExchange collapses the identical shuffles, so the fact
    * table is scanned once (pinned in PlanAuditSpec). The one-row max
    * side broadcasts; revenue is rounded to 2dp on BOTH engines so
    * summation order cannot break the equality with its own max. The
    * DuckDB oracle runs the standard subquery text.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val revenue = t(s, dir, "lineitem")
      .where(
        col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01 00:00:00").cast("timestamp") &&
          // explicit (vacuous) not-null: the join pushes IsNotNull into its
          // branch only — stating it in the shared view keeps BOTH branches
          // canonically identical so ReuseExchange can collapse them
          col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("mx"))
    t(s, dir, "supplier")
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(maxRev))
      .where(col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q16 shape (supplier screen): count DISTINCT suppliers per part
    * attribute with a NOT IN exclusion — Spark plans the single-column
    * NOT IN as a null-aware anti join (the decorrelation pattern distinct
    * from NOT EXISTS' plain anti join). Keys here are non-null, so at
    * 100 TB the equivalent NOT EXISTS rewrite (plain anti, shuffle-able
    * build side) is the escape hatch if the excluded set outgrows a
    * broadcast — noted because Spark only plans NAAJ as a broadcast hash
    * join. The excluded set (negative-balance suppliers) is a small
    * fraction by construction. Shared Spark/DuckDB text.
    */
  private val q16Text: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  def q16SupplierCounts(s: SparkSession, dir: String): DataFrame = {
    Seq("part", "lineitem", "supplier")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(q16Text)
  }

  val q16SupplierCountsSql: String = q16Text

  /** TPC-H Q7 shape: bilateral trade volume between two nations by year —
    * the DIMENSION-PAIR disjunction (either direction of the pair
    * qualifies) over the lineitem⋈orders spine with BOTH endpoints'
    * nation dims joined (supplier's and customer's), grouped on a derived
    * year. The two nation aliases are constant-size → hinted broadcast;
    * supplier/customer are SF-scaled → unhinted (stats/AQE broadcast while
    * they fit). The OR evaluates post-join on two broadcast-joined columns;
    * the only real shuffle is the final (nation, nation, year) aggregate.
    */
  def q7TradeVolume(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .where(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(
        col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7TradeVolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q8 shape (national market share): the full 8-table snowflake —
    * two nation aliases on opposite ends of the spine (supplier's nation
    * numerator, customer's nation → region market filter) — with a
    * conditional-share aggregate sum(CASE)/sum per derived year. All
    * SF-scaled sides (part/customer/supplier) unhinted; nation/region
    * hinted. Share rounded to 4dp on both engines.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val natS = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val natC = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("c_rkey"))
    val reg = t(s, dir, "region").where(col("r_name") === "ASIA")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").where(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(reg), col("c_rkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_1", rev).otherwise(0.0)) / sum(rev),
        4).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  round(sum(CASE WHEN n1.n_name = 'NATION_1'
      |            THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
      |        / sum(l_extendedprice * (1.0 - l_discount)), 4) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |JOIN region ON n2.n_regionkey = r_regionkey
      |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q9 shape (product-line profit by nation and year): LIKE-filtered
    * part dim, profit = revenue − cost proxy (0.5·retail·qty — the
    * reference schema has no partsupp/supplycost), grouped on (supplier
    * nation, derived year). One big shuffle (lineitem⋈orders on orderkey);
    * part/supplier unhinted (SF-scaled), nation hinted.
    */
  def q9ProfitByNation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").where(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.5) * col("p_retailprice") * col("l_quantity")), 2).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)

  val q9ProfitByNationSql: String =
    """SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |  round(sum(l_extendedprice * (1.0 - l_discount)
      |            - 0.5 * p_retailprice * l_quantity), 2) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q19 shape: revenue under an OR of three conjunctive
    * brand/size/quantity bands — the DISJUNCTIVE-predicate showcase.
    * Catalyst distributes the common `p_partkey = l_partkey` out of the OR
    * and pushes the per-table residuals (brand/size bands to the part
    * scan, quantity bands to lineitem) so neither scan reads rows no
    * branch could accept; the OR itself evaluates post-join.
    */
  def q19BandedRevenue(s: SparkSession, dir: String): DataFrame = {
    def band(brand: String, szLo: Int, szHi: Int, qLo: Double, qHi: Double) =
      col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .where(
        band("Brand#1", 1, 15, 1, 20) ||
          band("Brand#13", 10, 30, 10, 30) ||
          band("Brand#20", 20, 50, 20, 40))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19BandedRevenueSql: String =
    """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
      |        AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
      |        AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  /** TPC-H Q11 shape: per-supplier value with a HAVING threshold that is
    * ITSELF an aggregate over the same data (suppliers holding > 0.2% of
    * total line value). The scalar total is one broadcast row — computed
    * once, not per group; threshold rounded to 2dp on both engines so
    * summation order cannot flip a boundary supplier.
    */
  def q11SupplierValue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val perSupp = li.groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice")).as("value"))
    // grand total folded FROM the per-supplier sums (Σ groups ≡ Σ rows):
    // both references then descend from the same supplier-keyed exchange,
    // so ReuseExchange scans+pre-aggregates the fact table ONCE (pinned in
    // PlanAuditSpec) — the SQL form's independent total would re-scan it.
    // Summation-order drift is absorbed by the 2dp rounding on both
    // engines (same tolerance the oracle comparison already relies on).
    val threshold = perSupp.agg(
      round(sum(col("value")) * 0.002, 2).as("cut"))
    perSupp
      .crossJoin(broadcast(threshold))
      .where(col("value") > col("cut"))
      .select(col("l_suppkey").as("suppkey"), round(col("value"), 2).as("value"))
      .orderBy(col("value").desc, col("suppkey"))
  }

  val q11SupplierValueSql: String =
    """SELECT l_suppkey AS suppkey, round(sum(l_extendedprice), 2) AS value
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING sum(l_extendedprice) > (
      |  SELECT round(sum(l_extendedprice) * 0.002, 2) FROM lineitem)
      |ORDER BY value DESC, suppkey""".stripMargin

  /** Brand revenue: lineitem ⋈ part — completes coverage of all ten shared
    * tables and exercises the fact-⋈-product-dim shape. part is SF-scaled
    * → unhinted (size stats broadcast it while small).
    */
  def brandRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        round(avg(col("p_retailprice")), 4).as("avg_retail"))
      .orderBy("p_brand")

  val brandRevenueSql: String =
    """SELECT p_brand, count(*) AS n_lines,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  round(avg(p_retailprice), 4) AS avg_retail
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  val topOrdersPerPrioritySql: String =
    """SELECT o_orderpriority, rank_in_priority, o_orderkey, round(o_totalprice, 2) AS totalprice
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_priority
      |  FROM orders)
      |WHERE rank_in_priority <= 3
      |ORDER BY o_orderpriority, rank_in_priority""".stripMargin
}
