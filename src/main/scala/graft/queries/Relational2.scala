package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables

/**
 * Second tranche of TPC-H-shaped queries: EXISTS semi-joins, conditional
 * ratio aggregates, DISTINCT-count groups, HAVING-over-agg joins,
 * disjunctive multi-predicate joins, scalar subqueries + anti-joins, and
 * batch sessionization via window lag.
 *
 * Same determinism contract as [[Relational]] (decimal-exact money sums,
 * BIGINT casts, total orders before LIMIT, second-truncated epochs).
 */
object Relational2 {

  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)
  private def sqlMoneySum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"

  // ------------------------------------------------------------------ q4
  /** TPC-H Q4 style: EXISTS semi-join with a correlated condition. */
  def q4OrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val li = Tables.load(spark, sfDir, "lineitem")
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast(LongType).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      | AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      | AND EXISTS (SELECT 1 FROM lineitem
      |             WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ----------------------------------------------------------------- q14
  /** TPC-H Q14 style: promo revenue ratio (conditional aggregate). */
  def q14PromoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val part = Tables.load(spark, sfDir, "part")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * moneySum(when(col("p_type") === "PROMO", disc)
          .otherwise(lit(0.0))) / moneySum(disc)).as("promo_revenue_pct"),
        count(lit(1)).cast(LongType).as("n_rows"))
  }

  val q14Sql: String =
    s"""SELECT 100.0 * ${sqlMoneySum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       |  / ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS promo_revenue_pct,
       | CAST(COUNT(*) AS BIGINT) AS n_rows
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       | AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       | AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  // ----------------------------------------------------------------- q16
  /** TPC-H Q16 style: DISTINCT-count per group over a join. */
  def q16SupplierCnt(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_size").isin(1, 5, 10, 15, 20, 25))
    val li = Tables.load(spark, sfDir, "lineitem")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey AND p_size IN (1, 5, 10, 15, 20, 25)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  // ----------------------------------------------------------------- q18
  /** TPC-H Q18 style: join against a HAVING-filtered aggregate. */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(moneySum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300.0)
    val ord = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer")
    ord.join(big, ord("o_orderkey") === big("l_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey,
       | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       | o_totalprice, sum_qty
       |FROM orders
       |JOIN (SELECT l_orderkey, ${sqlMoneySum("l_quantity")} AS sum_qty
       |      FROM lineitem GROUP BY l_orderkey
       |      HAVING ${sqlMoneySum("l_quantity")} > 300.0) big
       |  ON o_orderkey = big.l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT 20""".stripMargin

  // ----------------------------------------------------------------- q19
  /** TPC-H Q19 style: disjunction of conjunctive predicates on a join. */
  def q19DiscountedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    val cond =
      (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#13" && col("l_quantity").between(10, 20)) ||
      (col("p_size").between(1, 15) && col("l_quantity") < 30)
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).cast(LongType).as("n_rows"))
  }

  val q19Sql: String =
    s"""SELECT ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       | CAST(COUNT(*) AS BIGINT) AS n_rows
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey AND (
       |  (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
       |  OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 10 AND 20)
       |  OR (p_size BETWEEN 1 AND 15 AND l_quantity < 30))""".stripMargin

  // ----------------------------------------------------------------- q22
  /** TPC-H Q22 style: scalar subquery threshold + anti-join. */
  def q22IdleRichCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val ord = Tables.load(spark, sfDir, "orders")
    // decimal-exact average kept inside the plan via a broadcast
    // single-row cross join (no driver round trip)
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast(DecimalType(28, 6))).cast(DoubleType) /
        count(col("c_acctbal")).cast(DoubleType)).as("avg_bal"))
    // "idle" = never placed an URGENT order: the fixture gives nearly
    // every customer SOME order, so the classic no-orders-at-all
    // anti-join returns zero rows at small SFs and the oracle hash
    // pins nothing — the priority-scoped anti-join keeps the Q22
    // shape (threshold + anti-join) with a load-bearing result
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT")
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).cast(LongType).as("numcust"),
        moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val q22Sql: String =
    s"""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       | ${sqlMoneySum("c_acctbal")} AS totacctbal
       |FROM customer
       |WHERE c_acctbal > (
       |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
       |         / CAST(COUNT(c_acctbal) AS DOUBLE)
       |  FROM customer WHERE c_acctbal > 0.0)
       | AND NOT EXISTS (SELECT 1 FROM orders
       |   WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // ----------------------------------------------- batch sessionization
  /** Gap-based sessionization of the events stream IN BATCH: window lag
    * marks session starts (gap > 30 min), a running sum numbers sessions,
    * output is the session-count histogram over users. */
  def qEventSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts").cast(LongType).as("sec"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val marked = ev.withColumn("new_session",
      when(lag(col("sec"), 1).over(w).isNull ||
        col("sec") - lag(col("sec"), 1).over(w) > 1800L, 1L).otherwise(0L))
    val perUser = marked.groupBy(col("user_id"))
      .agg(sum(col("new_session")).cast(LongType).as("n_sessions"),
        count(lit(1)).cast(LongType).as("n_events"))
    perUser.groupBy(col("n_sessions"))
      .agg(count(lit(1)).cast(LongType).as("n_users"),
        sum(col("n_events")).cast(LongType).as("sum_events"))
      .orderBy(col("n_sessions"))
  }

  val qEventSessionsSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
      |  FROM events),
      |marked AS (
      |  SELECT user_id,
      |    CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
      |      OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM e),
      |per_user AS (
      |  SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM marked GROUP BY user_id)
      |SELECT n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(n_events) AS BIGINT) AS sum_events
      |FROM per_user GROUP BY n_sessions ORDER BY n_sessions""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q4_order_priority" -> (q4OrderPriority _, q4Sql),
    "q14_promo_revenue" -> (q14PromoRevenue _, q14Sql),
    "q16_supplier_cnt" -> (q16SupplierCnt _, q16Sql),
    "q18_large_orders" -> (q18LargeOrders _, q18Sql),
    "q19_discounted_revenue" -> (q19DiscountedRevenue _, q19Sql),
    "q22_idle_rich_customers" -> (q22IdleRichCustomers _, q22Sql),
    "q_event_sessions" -> (qEventSessions _, qEventSessionsSql))
}
