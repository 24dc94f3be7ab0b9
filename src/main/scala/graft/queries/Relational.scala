package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables

/**
 * Core relational query suite over the TPC-H-ish tables.
 *
 * Determinism contract with the DuckDB oracle:
 *  - money aggregates go through `moneySum` (exact decimal accumulation,
 *    emitted as double) so the result is bit-identical regardless of
 *    aggregation order / engine;
 *  - integral aggregates are cast to LONG on both sides;
 *  - every LIMIT is preceded by a total order (unique key tiebreaker).
 *
 * Scale notes: all queries are pure DataFrame plans — Catalyst pushes
 * filters/projections into the parquet scan, aggregates run partial+final,
 * and small dimension joins broadcast via AQE size-based planning —
 * fixed-cardinality dims (nation/region) are hinted, sf-proportional
 * ones (customer/supplier/part) are not, so plans degrade to shuffle
 * joins instead of failing when a dim outgrows the broadcast limit.
 * No driver-side loops.
 */
object Relational {

  /** Exact decimal accumulation of a per-row double expression, emitted as
    * double: deterministic across engines and row orders. */
  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  private def moneyAvg(c: Column): Column =
    (sum(c.cast(DecimalType(28, 6))).cast(DoubleType) /
      count(c).cast(DoubleType))

  /** SQL fragment mirroring [[moneySum]] for the DuckDB oracle. */
  private def sqlMoneySum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"
  private def sqlMoneyAvg(e: String): String =
    s"(CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE) / CAST(COUNT($e) AS DOUBLE))"

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1 style pricing summary: scan-filter-agg-sort. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("sum_charge"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        moneyAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       | ${sqlMoneySum("l_quantity")} AS sum_qty,
       | ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
       | ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       | ${sqlMoneySum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       | ${sqlMoneyAvg("l_quantity")} AS avg_qty,
       | ${sqlMoneyAvg("l_extendedprice")} AS avg_price,
       | ${sqlMoneyAvg("l_discount")} AS avg_disc,
       | COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q3
  /** TPC-H Q3 style: 3-way join + agg + top-N (tie-free via key order). */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
    // customer is sf-proportional: no hint — AQE broadcasts it while it
    // fits and falls back to a shuffle join beyond the broadcast limit.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       | ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
       | AND l_orderkey = o_orderkey
       | AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
       | AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
       |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q5
  /** TPC-H Q5 style: 6-way join through the star schema + agg. */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.load(spark, sfDir, "region")
    val nation = Tables.load(spark, sfDir, "nation")
    val cust = Tables.load(spark, sfDir, "customer")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.load(spark, sfDir, "lineitem")
    val supp = Tables.load(spark, sfDir, "supplier")
    // fixed dims (region/nation) hinted; supplier is sf-proportional so
    // AQE decides; fact-fact join shuffles on keys.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    s"""SELECT n_name,
       | ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       | AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q6
  /** TPC-H Q6 style: tight filter + scalar aggregate (pure pushdown test). */
  def q6RevenueDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    s"""SELECT ${sqlMoneySum("l_extendedprice * l_discount")} AS revenue,
       | COUNT(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       | AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q10
  /** TPC-H Q10 style: returned-item ranking, join + agg + top-N. */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
    val nation = Tables.load(spark, sfDir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, n_name,
       | ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       | AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
       | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       | AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  // ------------------------------------------------------------ window
  /** Top-3 parts by revenue within each brand — window ranking. */
  def qWindowTopParts(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
    val li = Tables.load(spark, sfDir, "lineitem")
    val rev = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rank_in_brand", row_number().over(w))
      .filter(col("rank_in_brand") <= 3)
      .select(col("p_brand"), col("p_partkey"),
        col("revenue"), col("rank_in_brand").cast(LongType).as("rank_in_brand"))
      .orderBy(col("p_brand"), col("rank_in_brand"))
  }

  val qWindowTopPartsSql: String =
    s"""SELECT p_brand, p_partkey, revenue, CAST(rank_in_brand AS BIGINT) AS rank_in_brand
       |FROM (
       |  SELECT p_brand, p_partkey, revenue,
       |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rank_in_brand
       |  FROM (
       |    SELECT p_brand, p_partkey,
       |      ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |    FROM lineitem, part WHERE l_partkey = p_partkey
       |    GROUP BY p_brand, p_partkey))
       |WHERE rank_in_brand <= 3
       |ORDER BY p_brand, rank_in_brand""".stripMargin

  // ---------------------------------------------------------- semi/anti
  /** Customers with orders but no high-value order: semi + anti join. */
  def qSemiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val ord = Tables.load(spark, sfDir, "orders")
    val bigOrders = ord.filter(col("o_totalprice") > 300000.0)
    cust
      .join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_custkey")).cast(LongType).as("sum_key"))
  }

  val qSemiAntiSql: String =
    """SELECT COUNT(*) AS n_customers, CAST(SUM(c_custkey) AS BIGINT) AS sum_key
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      | AND NOT EXISTS (SELECT 1 FROM orders
      |                 WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin

  // ------------------------------------------------------------- q13
  /** TPC-H Q13 style: distribution of orders per customer (outer join + double agg). */
  def q13OrderDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(!col("o_orderpriority").startsWith("1"))
    val perCust = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND NOT o_orderpriority LIKE '1%'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ------------------------------------------------------------ set ops
  /** Set algebra over key domains: UNION / INTERSECT / EXCEPT. */
  def qSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val ordCust = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey").as("k")).distinct()
    val custAll = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("k")).distinct()
    val withOrders = custAll.intersect(ordCust)
    val withoutOrders = custAll.except(ordCust)
    val unioned = withOrders.select(lit("with").as("grp"), col("k"))
      .union(withoutOrders.select(lit("without").as("grp"), col("k")))
    unioned.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast(LongType).as("sum_k"))
      .orderBy(col("grp"))
  }

  val qSetOpsSql: String =
    """SELECT grp, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
      |FROM (
      |  SELECT 'with' AS grp, k FROM (
      |    SELECT DISTINCT c_custkey AS k FROM customer
      |    INTERSECT SELECT DISTINCT o_custkey AS k FROM orders)
      |  UNION ALL
      |  SELECT 'without' AS grp, k FROM (
      |    SELECT DISTINCT c_custkey AS k FROM customer
      |    EXCEPT SELECT DISTINCT o_custkey AS k FROM orders))
      |GROUP BY grp ORDER BY grp""".stripMargin

  // ------------------------------------------------------------- rollup
  /** Multi-level aggregate via ROLLUP (order status × priority). */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
    ord.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  val qRollupSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       | ${sqlMoneySum("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- cube
  /** Full CUBE (all 4 grouping sets of returnflag × linestatus) — the
    * rollup's sibling shape; one aggregate pass, grouping-set expansion
    * handled by Spark's Expand operator (map-side, no extra scan). */
  def qCube(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  val qCubeSql: String =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       | ${sqlMoneySum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** TPC-H Q12 (adapted to the fixture's columns): one shipping year of
    * line items joined to their orders, counting high- vs low-priority
    * lines per line status — the canonical big-join +
    * conditional-aggregation shape. The fixture carries no
    * `l_shipmode`/`l_commitdate`, so `l_linestatus` plays the grouping
    * role and the one-year `l_shipdate` window the receipt window.
    * Scale: the filter prunes lineitem before the shuffle join on
    * orderkey; the aggregation is partial map-side (2 groups). */
  def q12ShippedPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val hi = Seq("1-URGENT", "2-HIGH")
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
    val ord = Tables.load(spark, sfDir, "orders")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin(hi: _*), lit(1L))
          .otherwise(lit(0L))).cast(LongType).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin(hi: _*), lit(1L))
          .otherwise(lit(0L))).cast(LongType).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // ------------------------------------------------------------- events
  /** Event-stream style day × type aggregate (date_trunc + conditional agg). */
  def qEventsDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        moneySum(col("value")).as("sum_value"),
        sum(when(col("value") > 50.0, lit(1L)).otherwise(lit(0L)))
          .cast(LongType).as("n_high"))
      .orderBy(col("day"), col("event_type"))
  }

  val qEventsDailySql: String =
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       | COUNT(*) AS n_events,
       | COUNT(DISTINCT user_id) AS n_users,
       | ${sqlMoneySum("value")} AS sum_value,
       | CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** ORDERED-FUNNEL analysis: how many users progressed view → click →
    * purchase, each step strictly after the previous one — the
    * product-analytics shape (and, for training-data pipelines, the
    * session-quality signal behind interaction-filtered corpora). Each
    * step is a groupBy-min over a progressively SHRINKING user set
    * joined on user_id — no self-join of the full event table, no
    * window over the whole stream; at 100 TB the chain is three
    * user-keyed shuffles whose right sides AQE broadcasts as they
    * shrink. Second-floored timestamps keep the strict-after compare
    * integral on both engines. */
  def qEventFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"),
        col("event_type"),
        expr("unix_micros(ts) div 1000000").as("sec"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("sec")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("sec") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("sec")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("sec") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("sec")).as("t3"))
    s1.agg(count(lit(1)).cast(LongType).as("n_view"))
      .crossJoin(s2.agg(count(lit(1)).cast(LongType).as("n_view_click")))
      .crossJoin(s3.agg(count(lit(1)).cast(LongType).as("n_full_funnel")))
  }

  val qEventFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |s1 AS (SELECT user_id, MIN(sec) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, MIN(sec) AS t2 FROM e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE event_type = 'click' AND sec > t1 GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, MIN(sec) AS t3 FROM e
      |  JOIN s2 ON e.user_id = s2.user_id
      |  WHERE event_type = 'purchase' AND sec > t2 GROUP BY e.user_id)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_view,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_view_click,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_full_funnel""".stripMargin

  /** All relational queries + oracles, keyed by public name. */
  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _, q1Sql),
    "q3_shipping_priority" -> (q3ShippingPriority _, q3Sql),
    "q5_local_supplier" -> (q5LocalSupplier _, q5Sql),
    "q6_revenue_delta" -> (q6RevenueDelta _, q6Sql),
    "q10_returned_items" -> (q10ReturnedItems _, q10Sql),
    "q12_shipped_priority" -> (q12ShippedPriority _, q12Sql),
    "q_event_funnel" -> (qEventFunnel _, qEventFunnelSql),
    "q13_order_distribution" -> (q13OrderDistribution _, q13Sql),
    "q_window_top_parts" -> (qWindowTopParts _, qWindowTopPartsSql),
    "q_semi_anti" -> (qSemiAnti _, qSemiAntiSql),
    "q_set_ops" -> (qSetOps _, qSetOpsSql),
    "q_rollup" -> (qRollup _, qRollupSql),
    "q_cube" -> (qCube _, qCubeSql),
    "q_events_daily" -> (qEventsDaily _, qEventsDailySql))
}
