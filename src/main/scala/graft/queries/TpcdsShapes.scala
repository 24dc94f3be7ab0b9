package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables

/**
 * TPC-DS-SHAPED rewrite stress over the TPC-H-ish fixture corpus — the
 * query shapes the reference's plan-stability suite runs its 103-query
 * TPC-DS corpus through (reference:
 * src/test/resources/tpcds/queries/q1.sql, q65.sql;
 * goldstandard/PlanStabilitySuite.scala:83-290): deep date-filtered
 * snowflakes, reused aggregate CTEs, and a correlated above-average
 * threshold. Each runs with covering indexes on every join leg, so the
 * ScoreBasedIndexPlanOptimizer must compose multi-index rewrites
 * through aggregates and self-joined CTEs — the stress that found real
 * bugs in earlier rounds' single-join shapes.
 *
 * Determinism for the DuckDB oracle: every money aggregate goes
 * through exact DECIMAL(28,6) sums cast to double, INCLUDING the
 * second-level averages a threshold compares against — a distributed
 * double-sum would flip near-threshold rows between runs.
 */
object TpcdsShapes {

  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)
  private def sqlMoneySum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"

  import IndexAccel.ensureIndex

  /**
   * TPC-DS q1 shape (reference tpcds/queries/q1.sql): per-(customer,
   * dim) totals CTE, correlated above-1.2×-group-average threshold,
   * dim filter, two dimension joins, ORDER BY + LIMIT. Mapped onto the
   * fixture corpus: orders(1996) as the returns fact, nation as the
   * store dim. The DataFrame decorrelates the subquery the way
   * Catalyst would — a per-nation aggregate joined back on the
   * correlation key; the oracle keeps TPC-DS's literal correlated form,
   * so a hash match also proves the decorrelation equivalent.
   */
  def qds1ReturnsAboveAvg(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.ordByCust)
    ensureIndex(spark, sfDir, AccelIndexes.custDim)
    // own the nation dim index (shared config with qdsDeepSnowflake) so
    // the regional filter leg joins bucketed regardless of suite order
    ensureIndex(spark, sfDir, AccelIndexes.nationDim)
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val cust = Tables.load(spark, sfDir, "customer")
    val nation = Tables.load(spark, sfDir, "nation")

    val ctr = ord
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey").as("ctr_cust"),
        col("c_nationkey").as("ctr_nation"))
      .agg(moneySum(col("o_totalprice")).as("total"))
    val thresholds = ctr
      .groupBy(col("ctr_nation").as("avg_nation"))
      .agg((moneySum(col("total")) / count(lit(1)) * lit(1.2)).as("thr"))
    val winners = ctr
      .join(thresholds, col("ctr_nation") === col("avg_nation"))
      .filter(col("total") > col("thr"))
    winners
      .join(Tables.load(spark, sfDir, "customer"),
        col("ctr_cust") === col("c_custkey"))
      .join(nation, col("ctr_nation") === col("n_nationkey"))
      .filter(col("n_regionkey") === 1)
      .select(col("c_name"), col("total").as("total_spend"))
      .orderBy(col("c_name"))
      .limit(100)
  }

  val qds1Sql: String =
    s"""WITH ctr AS (
       |  SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_nation,
       |    ${sqlMoneySum("o_totalprice")} AS total
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT c_name, ctr1.total AS total_spend
       |FROM ctr ctr1
       |JOIN customer ON ctr1.ctr_cust = c_custkey
       |JOIN nation ON ctr1.ctr_nation = n_nationkey
       |WHERE n_regionkey = 1
       |  AND ctr1.total > (
       |    SELECT ${sqlMoneySum("ctr2.total")} / COUNT(*) * 1.2
       |    FROM ctr ctr2 WHERE ctr2.ctr_nation = ctr1.ctr_nation)
       |ORDER BY c_name LIMIT 100""".stripMargin

  /**
   * TPC-DS q65 shape (reference tpcds/queries/q65.sql): a per-(group,
   * item) revenue aggregate CTE read TWICE — once raw, once re-
   * aggregated to per-group averages — self-joined on the group key
   * with an under-10%-of-average threshold, then two dimension joins.
   * Mapped: lineitem per (suppkey, partkey), supplier and part as the
   * store/item dims. The reused CTE means the covering index on
   * lineitem(l_suppkey) serves two distinct aggregate consumers in one
   * plan.
   */
  def qds65UnderperfParts(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liBySupp)
    ensureIndex(spark, sfDir, AccelIndexes.suppDim)
    ensureIndex(spark, sfDir, AccelIndexes.partDim)
    val li = Tables.load(spark, sfDir, "lineitem")
    val sa = li
      .groupBy(col("l_suppkey").as("sa_supp"), col("l_partkey").as("sa_part"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
    val sb = sa
      .groupBy(col("sa_supp").as("sb_supp"))
      .agg((moneySum(col("revenue")) / count(lit(1))).as("ave"))
    sa.join(sb, col("sa_supp") === col("sb_supp"))
      .filter(col("revenue") <= col("ave") * lit(0.1))
      .join(Tables.load(spark, sfDir, "supplier"),
        col("sa_supp") === col("s_suppkey"))
      .join(Tables.load(spark, sfDir, "part"),
        col("sa_part") === col("p_partkey"))
      .select(col("s_name"), col("p_name"), col("revenue"))
      // total order: (s_name, p_name) ties exist, and a LIMIT boundary
      // over a non-total sort is nondeterministic across engines
      .orderBy(col("s_name"), col("p_name"), col("revenue"))
      .limit(100)
  }

  val qds65Sql: String =
    s"""WITH sa AS (
       |  SELECT l_suppkey AS sa_supp, l_partkey AS sa_part,
       |    ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |  FROM lineitem GROUP BY 1, 2),
       |sb AS (
       |  SELECT sa_supp AS sb_supp,
       |    ${sqlMoneySum("revenue")} / COUNT(*) AS ave
       |  FROM sa GROUP BY 1)
       |SELECT s_name, p_name, revenue
       |FROM sa JOIN sb ON sa_supp = sb_supp
       |JOIN supplier ON sa_supp = s_suppkey
       |JOIN part ON sa_part = p_partkey
       |WHERE revenue <= ave * 0.1
       |ORDER BY s_name, p_name, revenue LIMIT 100""".stripMargin

  /**
   * TPC-DS deep-snowflake shape (q15/q25 family): a 5-table chain —
   * fact → date-filtered fact → customer → nation → region — with the
   * selective filter at the FAR end (region name), aggregated by the
   * middle dim. Four covering indexes, one per join leg: the optimizer
   * must stack JoinIndexRule at the bottom (bucketed zero-shuffle
   * lineitem⋈orders) and keep each dim leg index-served up the chain.
   */
  def qdsDeepSnowflake(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liJoin)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.custDim)
    ensureIndex(spark, sfDir, AccelIndexes.nationDim)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, sfDir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("n_name"))
  }

  val qdsDeepSql: String =
    s"""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       | ${sqlMoneySum("l_extendedprice")} AS sum_price
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /**
   * TPC-DS q95 shape (reference tpcds/queries/q95.sql): one CTE — the
   * fact self-joined against itself on the order key with a
   * different-warehouse inequality — consumed by TWO IN-subqueries
   * (semi joins) over the same fact, plus a date-filtered dimension
   * join and a COUNT(DISTINCT) headline. Mapped: lineitem is
   * web_sales (suppkey ≅ warehouse), lineitem's 'R' returnflag rows
   * are web_returns, orders(1996) the date dim. Every join and both
   * semi joins key on l_orderkey, so ONE bucketed covering index
   * serves the fact five times without re-shuffling.
   */
  def qds95MultiSupplierShip(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liShip)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    val li = Tables.load(spark, sfDir, "lineitem")
    // ws_wh: orders shipped from at least two distinct suppliers
    val multi = li.select(col("l_orderkey").as("m1_ord"),
        col("l_suppkey").as("m1_supp"))
      .join(li.select(col("l_orderkey").as("m2_ord"),
          col("l_suppkey").as("m2_supp")),
        col("m1_ord") === col("m2_ord") && col("m1_supp") =!= col("m2_supp"))
      .select(col("m1_ord"))
    val returned = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("r_ord"))
      .join(multi, col("r_ord") === col("m1_ord"))
      .select(col("r_ord"))
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(multi, col("l_orderkey") === col("m1_ord"), "left_semi")
      .join(returned, col("l_orderkey") === col("r_ord"), "left_semi")
      .agg(countDistinct(col("l_orderkey")).cast(LongType).as("n_orders"),
        moneySum(col("l_extendedprice")).as("sum_price"))
  }

  val qds95Sql: String =
    s"""WITH multi AS (
       |  SELECT a.l_orderkey FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey)
       |SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       | ${sqlMoneySum("l_extendedprice")} AS sum_price
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       | AND l_orderkey IN (SELECT l_orderkey FROM multi)
       | AND l_orderkey IN (
       |   SELECT r.l_orderkey FROM lineitem r
       |   JOIN multi m ON r.l_orderkey = m.l_orderkey
       |   WHERE r.l_returnflag = 'R')""".stripMargin

  /**
   * TPC-DS q14 shape (reference tpcds/queries/q14a.sql): a
   * `cross_items` CTE built from a THREE-WAY INTERSECT of
   * (brand, type) attribute tuples across sales channels, an
   * `avg_sales` scalar-subquery threshold, and a channel aggregate
   * filtered to cross-channel items above the average. Mapped:
   * channels are lineitem's linenumber slices (1 / 2 / ≥3), part
   * carries the attribute tuple, and the HAVING threshold is a
   * broadcast scalar share of exact-decimal total revenue.
   */
  def qds14CrossChannel(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liByPart)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    def channel(pred: org.apache.spark.sql.Column): DataFrame =
      li.filter(pred)
        .join(part, col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"), col("p_type").as("typ"))
    val crossAttrs = channel(col("l_linenumber") === 1)
      .intersect(channel(col("l_linenumber") === 2))
      .intersect(channel(col("l_linenumber") >= 3))
    val crossItems = part
      .join(crossAttrs, col("p_brand") === col("brand") &&
        col("p_type") === col("typ"))
      .select(col("p_partkey").as("ci_part"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    // avg_sales: one exact-decimal scalar, broadcast under every group
    val threshold = li.agg((moneySum(rev) / lit(30.0)).as("thr"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(crossItems, col("l_partkey") === col("ci_part"),
        "left_semi")
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        moneySum(rev).as("sum_rev"))
      .join(broadcast(threshold))
      .filter(col("sum_rev") > col("thr"))
      .select(col("brand"), col("n_rows"), col("sum_rev"))
      .orderBy(col("brand"))
  }

  val qds14Sql: String = {
    val rev = "l_extendedprice * (1 - l_discount)"
    s"""WITH cross_attrs AS (
       |  SELECT p_brand AS brand, p_type AS typ FROM lineitem
       |    JOIN part ON l_partkey = p_partkey WHERE l_linenumber = 1
       |  INTERSECT
       |  SELECT p_brand, p_type FROM lineitem
       |    JOIN part ON l_partkey = p_partkey WHERE l_linenumber = 2
       |  INTERSECT
       |  SELECT p_brand, p_type FROM lineitem
       |    JOIN part ON l_partkey = p_partkey WHERE l_linenumber >= 3),
       |cross_items AS (
       |  SELECT p_partkey FROM part JOIN cross_attrs
       |    ON p_brand = brand AND p_type = typ),
       |avg_sales AS (
       |  SELECT ${sqlMoneySum(rev)} / 30.0 AS thr FROM lineitem)
       |SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_rows,
       | ${sqlMoneySum(rev)} AS sum_rev
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_partkey IN (SELECT p_partkey FROM cross_items)
       |GROUP BY p_brand
       |HAVING ${sqlMoneySum(rev)} > (SELECT thr FROM avg_sales)
       |ORDER BY brand""".stripMargin
  }

  /**
   * TPC-DS q27 shape (reference tpcds/queries/q27.sql): a fact joined
   * through two dimensions and aggregated under GROUP BY ROLLUP — the
   * Expand-operator path none of the other shapes exercise. Mapped:
   * lineitem ⋈ orders(1995) ⋈ customer ⋈ nation, ROLLUP over
   * (n_name, c_mktsegment). The rollup's Expand multiplies rows AFTER
   * the joins, so every join leg must still be index-served; subtotal
   * rows label their collapsed level with a sentinel (the fixture's
   * dims are never null, so COALESCE is unambiguous and keeps the
   * DuckDB row-sort deterministic).
   */
  def qds27RollupAgg(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liRev)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.custSeg)
    ensureIndex(spark, sfDir, AccelIndexes.nationDim)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val cust = Tables.load(spark, sfDir, "customer")
    val nation = Tables.load(spark, sfDir, "nation")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        moneySum(rev).as("sum_rev"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("n_rows"), col("sum_rev"))
      .orderBy(col("nation"), col("segment"))
  }

  val qds27Sql: String = {
    val rev = "l_extendedprice * (1 - l_discount)"
    s"""SELECT COALESCE(n_name, 'ALL') AS nation,
       | COALESCE(c_mktsegment, 'ALL') AS segment,
       | CAST(COUNT(*) AS BIGINT) AS n_rows,
       | ${sqlMoneySum(rev)} AS sum_rev
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       | JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       | AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       |GROUP BY ROLLUP (n_name, c_mktsegment)
       |ORDER BY nation, segment""".stripMargin
  }

  /**
   * TPC-DS q87 shape (reference tpcds/queries/q87.sql): a chained
   * EXCEPT of per-channel DISTINCT customer sets, counted — written
   * with the IDIOMATIC `.except()`. Catalyst lowers that to LeftAnti
   * joins on NULL-SAFE equality, whose hash keys become
   * (coalesce(k, 0), isnull(k)) — defeating bucket reuse even when
   * every scan is index-served (measured: both anti joins re-shuffled).
   * The IS NOT NULL guards on each channel let
   * [[graft.index.rules.NormalizeNullSafeJoinKeys]] prove the rewrite
   * to plain equality, after which the whole set algebra — three
   * distincts and two anti joins — runs bucket-aligned off one
   * o_custkey covering index: the 100 TB plan for audience
   * subtraction, reached from the idiomatic API by the ENGINE, not by
   * hand-tuning the query.
   */
  def qds87ExceptChannels(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.ordByCust)
    val ord = Tables.load(spark, sfDir, "orders")
    def channel(pred: org.apache.spark.sql.Column): DataFrame =
      ord.filter(pred && col("o_custkey").isNotNull)
        .select(col("o_custkey")).distinct()
    val h1 = channel(
      col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
    val h2 = channel(
      col("o_orderdate") >= lit("1995-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val urgent = channel(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    h1.except(h2).except(urgent)
      .agg(count(lit(1)).cast(LongType).as("n_cust"))
  }

  val qds87Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM (
      |  SELECT DISTINCT o_custkey FROM orders
      |   WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |     AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
      |     AND o_custkey IS NOT NULL
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders
      |   WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
      |     AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |     AND o_custkey IS NOT NULL
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders
      |   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |     AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |     AND o_custkey IS NOT NULL)""".stripMargin

  /**
   * TPC-DS q23 shape (reference tpcds/queries/q23a.sql): TWO filtering
   * CTEs feed one fact aggregate — `frequent_ss_items` (items sold in
   * more than K distinct baskets, a HAVING over COUNT(DISTINCT)) and
   * `best_ss_customer` (customers whose spend beats a SHARE OF THE
   * MAXIMUM spend — a scalar MAX over an aggregate CTE, the only shape
   * in the corpus where a threshold derives from an extreme, not an
   * average), both semi-joined into a date-filtered fact⋈orders sum.
   * Mapped: parts in >4 distinct orders, customers above 50% of max
   * 1995-96 spend, lineitem⋈orders(1996) as the fact.
   */
  def qds23FrequentBuyers(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liByPart)
    ensureIndex(spark, sfDir, AccelIndexes.ordByCust)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    // frequent items: parts appearing in more than 4 distinct orders —
    // the groupBy runs on the partkey-bucketed index, shuffle-free
    val frequent = li
      .groupBy(col("l_partkey").as("fi_part"))
      .agg(countDistinct(col("l_orderkey")).as("n_ord"))
      .filter(col("n_ord") > 4)
      .select(col("fi_part"))
    // best customers: spend above half of the maximum customer spend.
    // The max is ONE row — broadcast under the filter, never a shuffle.
    val spend = ord
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("o_custkey").as("bc_cust"))
      .agg(moneySum(col("o_totalprice")).as("spend"))
    val maxSpend = spend.agg(max(col("spend")).as("max_spend"))
    val best = spend
      .join(broadcast(maxSpend))
      .filter(col("spend") > col("max_spend") * lit(0.5))
      .select(col("bc_cust"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(ord.filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(frequent, col("l_partkey") === col("fi_part"), "left_semi")
      .join(best, col("o_custkey") === col("bc_cust"), "left_semi")
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        moneySum(rev).as("sum_rev"))
  }

  val qds23Sql: String =
    s"""WITH frequent AS (
       |  SELECT l_partkey FROM lineitem
       |  GROUP BY 1 HAVING COUNT(DISTINCT l_orderkey) > 4),
       |spend AS (
       |  SELECT o_custkey, ${sqlMoneySum("o_totalprice")} AS spend
       |  FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY 1),
       |best AS (
       |  SELECT o_custkey FROM spend
       |  WHERE spend > (SELECT MAX(spend) FROM spend) * 0.5)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       | ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS sum_rev
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_partkey IN (SELECT l_partkey FROM frequent)
       |  AND o_custkey IN (SELECT o_custkey FROM best)""".stripMargin

  /**
   * TPC-DS q77 shape (reference tpcds/queries/q77.sql): per-channel
   * aggregate CTEs — sales and returns — FULL OUTER joined on the
   * group key into a net-profit report. The outer join of two
   * index-served aggregates is the path q77 exercises that no inner/
   * semi shape does: the join must keep the aggregates' bucket-aligned
   * partitioning through a FullOuter SMJ. Mapped: lineitem(flag≠'R')
   * as sales, lineitem(flag='R') as returns, both rolled up to the
   * nation through orders(1995)⋈customer⋈nation.
   */
  def qds77ChannelProfit(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liShip)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.custDim)
    ensureIndex(spark, sfDir, AccelIndexes.nationDim)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val cust = Tables.load(spark, sfDir, "customer")
    val nation = Tables.load(spark, sfDir, "nation")
    def channel(pred: org.apache.spark.sql.Column): DataFrame =
      li.filter(pred)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
    val sales = channel(col("l_returnflag") =!= "R")
      .groupBy(col("n_name").as("sl_nation"))
      .agg(moneySum(col("l_extendedprice")).as("sum_rev"),
        count(lit(1)).cast(LongType).as("n_sales"))
    val returns = channel(col("l_returnflag") === "R")
      .groupBy(col("n_name").as("rt_nation"))
      .agg(moneySum(col("l_extendedprice")).as("sum_ret"))
    sales.join(returns, col("sl_nation") === col("rt_nation"), "full_outer")
      .select(
        coalesce(col("sl_nation"), col("rt_nation")).as("nation"),
        coalesce(col("n_sales"), lit(0L)).as("n_sales"),
        coalesce(col("sum_rev"), lit(0.0)).as("sum_rev"),
        coalesce(col("sum_ret"), lit(0.0)).as("sum_ret"),
        (coalesce(col("sum_rev"), lit(0.0)) -
          coalesce(col("sum_ret"), lit(0.0))).as("net"))
      .orderBy(col("nation"))
  }

  val qds77Sql: String =
    s"""WITH sales AS (
       |  SELECT n_name AS sl_nation,
       |    ${sqlMoneySum("l_extendedprice")} AS sum_rev,
       |    CAST(COUNT(*) AS BIGINT) AS n_sales
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |    JOIN customer ON o_custkey = c_custkey
       |    JOIN nation ON c_nationkey = n_nationkey
       |  WHERE l_returnflag <> 'R'
       |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       |  GROUP BY 1),
       |returns AS (
       |  SELECT n_name AS rt_nation,
       |    ${sqlMoneySum("l_extendedprice")} AS sum_ret
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |    JOIN customer ON o_custkey = c_custkey
       |    JOIN nation ON c_nationkey = n_nationkey
       |  WHERE l_returnflag = 'R'
       |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       |  GROUP BY 1)
       |SELECT COALESCE(sl_nation, rt_nation) AS nation,
       |  COALESCE(n_sales, CAST(0 AS BIGINT)) AS n_sales,
       |  COALESCE(sum_rev, CAST(0 AS DOUBLE)) AS sum_rev,
       |  COALESCE(sum_ret, CAST(0 AS DOUBLE)) AS sum_ret,
       |  COALESCE(sum_rev, CAST(0 AS DOUBLE)) -
       |    COALESCE(sum_ret, CAST(0 AS DOUBLE)) AS net
       |FROM sales FULL OUTER JOIN returns ON sl_nation = rt_nation
       |ORDER BY nation""".stripMargin

  /**
   * TPC-DS q51 shape (reference tpcds/queries/q51.sql): per-channel
   * MONTHLY aggregates, a CUMULATIVE-SUM WINDOW over each series, and
   * a FULL OUTER join comparing the two running totals (web overtaking
   * store). The WindowExec-over-indexed-aggregate path and the
   * subset-partitioning join (the window leaves both sides hash-
   * partitioned on the supplier alone, which ALSO satisfies the
   * two-key join — no exchange between the windows and the join) are
   * exercised by no other shape. Cumulative sums stay DECIMAL through
   * the window so the running totals are order-independent and
   * engine-exact. Mapped: sales = non-return lineitems, returns = 'R'
   * rows, series keyed (l_suppkey, order month).
   */
  def qds51CumulativeChannels(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensureIndex(spark, sfDir, AccelIndexes.liShip)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val joined = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("l_returnflag"),
        col("l_extendedprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
    def series(pred: org.apache.spark.sql.Column,
        keyName: String, monthName: String, cumName: String): DataFrame = {
      // ONE supplier-hash exchange feeds the whole series: the monthly
      // aggregate's (supp, month) clustering and the window's (supp)
      // clustering are both satisfied by hash(supp) — subset
      // partitioning — so neither adds an exchange of its own. At
      // scale this halves the series' shuffles; months per supplier
      // are bounded, so no partition outgrows its executor.
      val monthly = joined.filter(pred)
        .repartition(col("l_suppkey"))
        .groupBy(col("l_suppkey").as(keyName), col("month").as(monthName))
        .agg(sum(col("l_extendedprice").cast(DecimalType(28, 6))).as("rev"))
      val w = Window.partitionBy(col(keyName)).orderBy(col(monthName))
      monthly.withColumn(cumName, sum(col("rev")).over(w)).drop("rev")
    }
    val sales = series(col("l_returnflag") =!= "R", "s_supp", "s_month", "cum_sales")
    val rets = series(col("l_returnflag") === "R", "r_supp", "r_month", "cum_ret")
    // COALESCE both totals before comparing: a month where only the
    // returns channel moved must pass (0-sales side), which also keeps
    // the join genuinely FULL OUTER — a bare null-rejecting predicate
    // would let Catalyst legally collapse it to inner
    sales.join(rets,
        col("s_supp") === col("r_supp") && col("s_month") === col("r_month"),
        "full_outer")
      .filter(coalesce(col("cum_ret"), lit(0).cast(DecimalType(28, 6))) >
        coalesce(col("cum_sales"), lit(0).cast(DecimalType(28, 6))))
      .select(
        coalesce(col("s_supp"), col("r_supp")).as("suppkey"),
        coalesce(col("s_month"), col("r_month")).as("month"),
        coalesce(col("cum_sales").cast(DoubleType), lit(0.0)).as("cum_sales"),
        col("cum_ret").cast(DoubleType).as("cum_ret"))
      .orderBy(col("suppkey"), col("month"))
  }

  val qds51Sql: String =
    """WITH joined AS (
      |  SELECT l_suppkey, l_returnflag, l_extendedprice,
      |    strftime(o_orderdate, '%Y-%m') AS month
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
      |sales AS (
      |  SELECT s_supp, s_month, SUM(rev) OVER (
      |      PARTITION BY s_supp ORDER BY s_month
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_sales
      |  FROM (SELECT l_suppkey AS s_supp, month AS s_month,
      |          SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS rev
      |        FROM joined WHERE l_returnflag <> 'R' GROUP BY 1, 2)),
      |rets AS (
      |  SELECT r_supp, r_month, SUM(rev) OVER (
      |      PARTITION BY r_supp ORDER BY r_month
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ret
      |  FROM (SELECT l_suppkey AS r_supp, month AS r_month,
      |          SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS rev
      |        FROM joined WHERE l_returnflag = 'R' GROUP BY 1, 2))
      |SELECT COALESCE(s_supp, r_supp) AS suppkey,
      |  COALESCE(s_month, r_month) AS month,
      |  COALESCE(CAST(cum_sales AS DOUBLE), 0.0) AS cum_sales,
      |  CAST(cum_ret AS DOUBLE) AS cum_ret
      |FROM sales FULL OUTER JOIN rets
      |  ON s_supp = r_supp AND s_month = r_month
      |WHERE COALESCE(cum_ret, CAST(0 AS DECIMAL(28,6))) >
      |  COALESCE(cum_sales, CAST(0 AS DECIMAL(28,6)))
      |ORDER BY suppkey, month""".stripMargin

  /**
   * TPC-DS q4 shape (reference tpcds/queries/q4.sql): a per-customer
   * per-year per-channel totals CTE, SELF-JOINED SIX WAYS (first/second
   * year × three channels) with growth-ratio comparisons across
   * channels — the deepest reused-CTE composition in the corpus.
   * Mapped: channels are l_returnflag classes (N/A/R), years 1995/1996
   * from o_orderdate; a customer qualifies when their 'A'-channel
   * year-over-year growth beats BOTH other channels' growth. Each
   * CTE instance is a date+flag-filtered li⋈ord aggregate, so all six
   * legs must index-rewrite (liShip co-bucketed with ordSnow3 on
   * orderkey), and the final name lookup joins custDim. Ratios divide
   * exact-decimal sums cast to double — deterministic in both engines.
   */
  def qds4YoyChannelGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liShip)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.custDim)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    def yearTotal(year: Int, flag: String, tag: String): DataFrame =
      li.filter(col("l_returnflag") === flag)
        .join(ord.filter(
          col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
            col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as(s"${tag}_cust"))
        .agg(moneySum(col("l_extendedprice")).as(s"${tag}_total"))
    val sf = yearTotal(1995, "N", "sf"); val ss = yearTotal(1996, "N", "ss")
    val cf = yearTotal(1995, "A", "cf"); val cs = yearTotal(1996, "A", "cs")
    val wf = yearTotal(1995, "R", "wf"); val ws = yearTotal(1996, "R", "ws")
    ss.join(sf, col("ss_cust") === col("sf_cust"))
      .join(cf, col("sf_cust") === col("cf_cust"))
      .join(cs, col("sf_cust") === col("cs_cust"))
      .join(wf, col("sf_cust") === col("wf_cust"))
      .join(ws, col("sf_cust") === col("ws_cust"))
      .filter(col("sf_total") > 0 && col("cf_total") > 0 &&
        col("wf_total") > 0)
      .filter(col("cs_total") / col("cf_total") >
        col("ss_total") / col("sf_total") &&
        col("cs_total") / col("cf_total") >
          col("ws_total") / col("wf_total"))
      .join(Tables.load(spark, sfDir, "customer"),
        col("ss_cust") === col("c_custkey"))
      .select(col("c_custkey").as("cust_id"), col("c_name").as("name"))
      .orderBy(col("name"))
      .limit(100)
  }

  val qds4Sql: String =
    s"""WITH year_total AS (
       |  SELECT o_custkey AS cust, l_returnflag AS channel,
       |    CAST(strftime(o_orderdate, '%Y') AS INT) AS dyear,
       |    ${sqlMoneySum("l_extendedprice")} AS total
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
       |    AND o_orderdate < TIMESTAMP '1997-01-01'
       |  GROUP BY 1, 2, 3)
       |SELECT c_custkey AS cust_id, c_name AS name
       |FROM year_total sf, year_total ssy, year_total cf, year_total csy,
       |     year_total wf, year_total wsy, customer
       |WHERE ssy.cust = sf.cust AND sf.cust = cf.cust AND sf.cust = csy.cust
       |  AND sf.cust = wf.cust AND sf.cust = wsy.cust
       |  AND sf.channel = 'N' AND ssy.channel = 'N'
       |  AND cf.channel = 'A' AND csy.channel = 'A'
       |  AND wf.channel = 'R' AND wsy.channel = 'R'
       |  AND sf.dyear = 1995 AND ssy.dyear = 1996
       |  AND cf.dyear = 1995 AND csy.dyear = 1996
       |  AND wf.dyear = 1995 AND wsy.dyear = 1996
       |  AND sf.total > 0 AND cf.total > 0 AND wf.total > 0
       |  AND csy.total / cf.total > ssy.total / sf.total
       |  AND csy.total / cf.total > wsy.total / wf.total
       |  AND c_custkey = ssy.cust
       |ORDER BY name LIMIT 100""".stripMargin

  /**
   * TPC-DS q64 shape (reference tpcds/queries/q64.sql): ONE wide
   * multi-dimension join — the fact through seven legs including the
   * SAME dimension under two aliases (nation as the customer's and the
   * supplier's geography, q64's ad1/ad2 customer_address pattern) with
   * a cross-alias inequality, gated by a returns-ratio CTE semi-join
   * (cs_ui), grouped per (brand, supplier nation, year) and SELF-JOINED
   * year-over-year with a count comparison. The fact leg reads ONE
   * bucketed covering index (liWide) carrying all three foreign keys;
   * nationDim serves both aliases through renames (the r12 alias-
   * tracing fix is load-bearing here).
   */
  def qds64WideMultiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liWide)
    ensureIndex(spark, sfDir, AccelIndexes.liByPart)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.custDim)
    ensureIndex(spark, sfDir, AccelIndexes.nationDim)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    ensureIndex(spark, sfDir, AccelIndexes.suppNat)
    val li = Tables.load(spark, sfDir, "lineitem")
    val nation = Tables.load(spark, sfDir, "nation")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val disc = col("l_extendedprice") * col("l_discount")
    // cs_ui: LOW-discount parts — sale > 12 × discount-amount (the
    // returns-ratio HAVING of the original, on the fixture's columns)
    val csUi = li.groupBy(col("l_partkey").as("ui_part"))
      .agg(moneySum(rev).as("ui_sale"), moneySum(disc).as("ui_refund"))
      .filter(col("ui_sale") > lit(12.0) * col("ui_refund"))
      .select(col("ui_part"))
    val ordYr = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .withColumn("syear",
        when(col("o_orderdate") < lit("1996-01-01").cast("timestamp"),
          lit(1995)).otherwise(lit(1996)))
    val custNation = nation.select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cn_name"))
    val suppNation = nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("sn_name"))
    // geography rides the DIM side: supplier⋈nation and customer⋈nation
    // pre-join as small dim-dim joins, so the wide fact stream is never
    // re-keyed on a nationkey
    val suppGeo = Tables.load(spark, sfDir, "supplier")
      .join(suppNation, col("s_nationkey") === col("sn_key"))
    val custGeo = Tables.load(spark, sfDir, "customer")
      .join(custNation, col("c_nationkey") === col("cn_key"))
    // join order = one fact re-key per DISTINCT key: orderkey first
    // (zero-shuffle on the liWide×ordSnow3 buckets), then ONE partkey
    // exchange serving BOTH the cs_ui gate (an inner join — csUi's key
    // is unique, so it is IN-equivalent, and staying inner keeps
    // Catalyst from pushing it below the ord join as a semi) and the
    // part dim, then suppkey, then custkey
    val crossSales = li
      .join(ordYr, col("l_orderkey") === col("o_orderkey"))
      .join(csUi, col("l_partkey") === col("ui_part"))
      .join(Tables.load(spark, sfDir, "part")
        .filter(col("p_type").isin("STANDARD", "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(suppGeo, col("l_suppkey") === col("s_suppkey"))
      .join(custGeo, col("o_custkey") === col("c_custkey"))
      .filter(col("cn_name") =!= col("sn_name"))
      .groupBy(col("p_brand").as("brand"), col("sn_name").as("supp_nation"),
        col("syear"))
      .agg(count(lit(1)).cast(LongType).as("cnt"), moneySum(rev).as("s1"))
    val cs1 = crossSales.filter(col("syear") === 1995)
      .select(col("brand").as("b1"), col("supp_nation").as("n1"),
        col("cnt").as("cnt1"), col("s1").as("rev1"))
    val cs2 = crossSales.filter(col("syear") === 1996)
      .select(col("brand").as("b2"), col("supp_nation").as("n2"),
        col("cnt").as("cnt2"), col("s1").as("rev2"))
    cs1.join(cs2, col("b1") === col("b2") && col("n1") === col("n2"))
      .filter(col("cnt2") <= col("cnt1"))
      .select(col("b1").as("brand"), col("n1").as("supp_nation"),
        col("cnt1"), col("rev1"), col("cnt2"), col("rev2"))
      .orderBy(col("brand"), col("supp_nation"))
  }

  val qds64Sql: String = {
    val rev = "l_extendedprice * (1 - l_discount)"
    val disc = "l_extendedprice * l_discount"
    s"""WITH cs_ui AS (
       |  SELECT l_partkey AS ui_part
       |  FROM lineitem GROUP BY 1
       |  HAVING ${sqlMoneySum(rev)} > 12 * ${sqlMoneySum(disc)}),
       |cross_sales AS (
       |  SELECT p_brand AS brand, sn.n_name AS supp_nation,
       |    CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
       |      THEN 1995 ELSE 1996 END AS syear,
       |    CAST(COUNT(*) AS BIGINT) AS cnt,
       |    ${sqlMoneySum(rev)} AS s1
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
       |    AND o_orderdate < TIMESTAMP '1997-01-01'
       |    AND cn.n_name <> sn.n_name
       |    AND p_type IN ('STANDARD', 'PROMO')
       |    AND l_partkey IN (SELECT ui_part FROM cs_ui)
       |  GROUP BY 1, 2, 3)
       |SELECT cs1.brand AS brand, cs1.supp_nation AS supp_nation,
       |  cs1.cnt AS cnt1, cs1.s1 AS rev1, cs2.cnt AS cnt2, cs2.s1 AS rev2
       |FROM cross_sales cs1 JOIN cross_sales cs2
       |  ON cs1.brand = cs2.brand AND cs1.supp_nation = cs2.supp_nation
       |WHERE cs1.syear = 1995 AND cs2.syear = 1996 AND cs2.cnt <= cs1.cnt
       |ORDER BY brand, supp_nation""".stripMargin
  }

  /**
   * TPC-DS q35/q10 shape (reference tpcds/queries/q35.sql): a
   * DISJUNCTION of EXISTS subqueries — `EXISTS(store) AND
   * (EXISTS(web) OR EXISTS(catalog))`. Catalyst plans the AND-side
   * EXISTS as a LeftSemi but each OR-branch as an ExistenceJoin (the
   * boolean-producing join type no other corpus query exercises) —
   * the join-type gate must admit it or all three probe legs lose
   * index acceleration. Mapped: active-in-1995 customers who placed
   * an URGENT or a LOW-priority order, demographics per (nation,
   * segment). All three probes ride ONE custkey-bucketed orders
   * index against the custkey-bucketed customer index. Driven through
   * spark.sql over temp views: EXISTS has no DataFrame form, and the
   * rewrite rules must fire on SQL-origin plans identically.
   */
  def qds35OrExistsDemo(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.ordPrio)
    ensureIndex(spark, sfDir, AccelIndexes.custFull)
    ensureIndex(spark, sfDir, AccelIndexes.nationDim)
    Tables.load(spark, sfDir, "customer")
      .createOrReplaceTempView("qds35_customer")
    Tables.load(spark, sfDir, "orders")
      .createOrReplaceTempView("qds35_orders")
    Tables.load(spark, sfDir, "nation")
      .createOrReplaceTempView("qds35_nation")
    spark.sql(
      s"""SELECT n_name AS nation, c_mktsegment AS segment,
         |  CAST(COUNT(*) AS BIGINT) AS n_cust,
         |  ${sqlMoneySum("c_acctbal")} AS sum_bal
         |FROM qds35_customer JOIN qds35_nation ON c_nationkey = n_nationkey
         |WHERE EXISTS (SELECT 1 FROM qds35_orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '1995-01-01'
         |      AND o_orderdate < TIMESTAMP '1996-01-01')
         |  AND (EXISTS (SELECT 1 FROM qds35_orders
         |         WHERE o_custkey = c_custkey
         |           AND o_orderpriority = '1-URGENT')
         |    OR EXISTS (SELECT 1 FROM qds35_orders
         |         WHERE o_custkey = c_custkey
         |           AND o_orderpriority = '5-LOW'))
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  val qds35Sql: String =
    s"""SELECT n_name AS nation, c_mktsegment AS segment,
       |  CAST(COUNT(*) AS BIGINT) AS n_cust,
       |  ${sqlMoneySum("c_acctbal")} AS sum_bal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |    AND o_orderdate >= TIMESTAMP '1995-01-01'
       |    AND o_orderdate < TIMESTAMP '1996-01-01')
       |  AND (EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |         AND o_orderpriority = '1-URGENT')
       |    OR EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |         AND o_orderpriority = '5-LOW'))
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /**
   * TPC-DS q88 shape (reference tpcds/queries/q88.sql): EIGHT
   * band-scoped counts of the same fact, assembled into one row. The
   * literal form — which the DuckDB oracle keeps — runs eight
   * independent scalar subqueries, i.e. EIGHT full scans; at 100 TB
   * that is 8× the IO for zero extra information. The Spark side runs
   * the scale-correct plan instead: ONE pass with eight conditional
   * aggregates (`sum(when band then 1)`), a single scan + a single
   * one-row aggregate — and the oracle hash pins the two forms exactly
   * equivalent. The one-pass form also needs no index at all: no
   * filter survives to push (every row participates in some band test),
   * so the honest plan is a raw columnar scan of exactly two columns.
   */
  def qds88BandCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val lo = col("l_discount") < 0.03
    val hi = col("l_discount") >= 0.03
    def band(fromQ: Int, toQ: Int, side: org.apache.spark.sql.Column) =
      sum(when(col("l_quantity").between(fromQ, toQ) && side, 1L)
        .otherwise(0L)).cast(LongType)
    li.agg(
      band(1, 5, lo).as("b1"), band(6, 10, lo).as("b2"),
      band(11, 15, lo).as("b3"), band(16, 20, lo).as("b4"),
      band(21, 25, hi).as("b5"), band(26, 30, hi).as("b6"),
      band(31, 40, hi).as("b7"), band(41, 50, hi).as("b8"))
  }

  val qds88Sql: String = {
    def leg(n: Int, fromQ: Int, toQ: Int, side: String) =
      s"""(SELECT CAST(COUNT(*) AS BIGINT) AS b$n FROM lineitem
         |  WHERE l_quantity BETWEEN $fromQ AND $toQ AND l_discount $side)"""
        .stripMargin
    s"""SELECT * FROM
       | ${leg(1, 1, 5, "< 0.03")},
       | ${leg(2, 6, 10, "< 0.03")},
       | ${leg(3, 11, 15, "< 0.03")},
       | ${leg(4, 16, 20, "< 0.03")},
       | ${leg(5, 21, 25, ">= 0.03")},
       | ${leg(6, 26, 30, ">= 0.03")},
       | ${leg(7, 31, 40, ">= 0.03")},
       | ${leg(8, 41, 50, ">= 0.03")}""".stripMargin
  }

  /**
   * TPC-DS q67 shape (reference tpcds/queries/q67.sql): a ROLLUP over
   * five grouping dimensions feeding a per-category RANK() window, rows
   * kept while `rk <= 100`. Mapped: lineitem⋈orders(1995)⋈part⋈supplier
   * with ROLLUP(p_brand, p_type, year, month, s_name). The stress is
   * the AggIndexRule × window interplay: the rollup lowers to an
   * Expand (5 grouping sets), so the fact join underneath must stay
   * index-served while everything above reuses the one shuffle the
   * window needs. Rollup NULLs are COALESCEd to sentinels BEFORE the
   * window so the partition key is a plain column in both engines.
   */
  def qds67RollupRank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensureIndex(spark, sfDir, AccelIndexes.liWide)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    ensureIndex(spark, sfDir, AccelIndexes.suppDim)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val sales = coalesce(
      col("l_extendedprice") * (lit(1.0) - col("l_discount")), lit(0.0))
    val dw1 = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .rollup(col("p_brand"), col("p_type"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"), col("s_name"))
      .agg(moneySum(sales).as("sumsales"))
      .select(coalesce(col("p_brand"), lit("ALL")).as("brand"),
        coalesce(col("p_type"), lit("ALL")).as("ptype"),
        coalesce(col("yr"), lit(-1)).as("yr"),
        coalesce(col("mo"), lit(-1)).as("mo"),
        coalesce(col("s_name"), lit("ALL")).as("sname"),
        col("sumsales"))
    dw1.withColumn("rk", rank().over(
        Window.partitionBy(col("brand")).orderBy(col("sumsales").desc)))
      .filter(col("rk") <= 100)
      .orderBy(col("brand"), col("ptype"), col("yr"), col("mo"),
        col("sname"), col("sumsales"), col("rk"))
      .limit(100)
  }

  val qds67Sql: String =
    s"""WITH dw1 AS (
       |  SELECT COALESCE(p_brand, 'ALL') AS brand,
       |    COALESCE(p_type, 'ALL') AS ptype,
       |    COALESCE(yr, -1) AS yr, COALESCE(mo, -1) AS mo,
       |    COALESCE(s_name, 'ALL') AS sname, sumsales
       |  FROM (
       |    SELECT p_brand, p_type,
       |      EXTRACT(YEAR FROM o_orderdate) AS yr,
       |      EXTRACT(MONTH FROM o_orderdate) AS mo, s_name,
       |      ${sqlMoneySum(
             "COALESCE(l_extendedprice * (1.0 - l_discount), 0.0)")}
       |        AS sumsales
       |    FROM lineitem
       |      JOIN orders ON l_orderkey = o_orderkey
       |      JOIN part ON l_partkey = p_partkey
       |      JOIN supplier ON l_suppkey = s_suppkey
       |    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       |    GROUP BY ROLLUP (p_brand, p_type, yr, mo, s_name)))
       |SELECT * FROM (
       |  SELECT brand, ptype, yr, mo, sname, sumsales,
       |    RANK() OVER (PARTITION BY brand ORDER BY sumsales DESC) AS rk
       |  FROM dw1)
       |WHERE rk <= 100
       |ORDER BY brand, ptype, yr, mo, sname, sumsales, rk
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q72 shape (reference tpcds/queries/q72.sql — the notorious
   * wide inventory join): sales fact ⋈ inventory fact on the ITEM plus
   * a same-week condition on derived date keys, an on-hand <
   * ordered-quantity INEQUALITY residual, a ship-after-5-days date
   * gate, a demographic dim filter, and a LEFT OUTER promo leg counted
   * by null-ness. Mapped: lineitem(sales, via orders) ⋈
   * lineitem(inventory role) on l_partkey + week(l_shipdate), customer
   * segment as the demographic, parts with p_type LIKE 'PROMO%' as the
   * promotion dim. The scale point the port exercises: BOTH fact sides
   * ride ONE partkey-bucketed covering index (accel_ci_li_inv), so the
   * widest join in the corpus is zero-shuffle on its big legs and the
   * join-order decision under an index pair is forced — the q72
   * failure mode in real engines is re-keying the inventory side.
   */
  def qds72InventoryGate(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liInv)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.custSeg)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val liRaw = Tables.load(spark, sfDir, "lineitem")
    val sales = liRaw.select(
      col("l_partkey").as("sl_part"), col("l_orderkey").as("sl_ord"),
      col("l_quantity").as("sl_qty"), col("l_shipdate").as("sl_ship"))
    val inv = liRaw.select(
      col("l_partkey").as("inv_part"), col("l_quantity").as("inv_qty"),
      year(col("l_shipdate")).as("inv_yr"),
      weekofyear(col("l_shipdate")).as("inv_wk"))
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val cust = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val promo = Tables.load(spark, sfDir, "part")
      .filter(col("p_type").like("PROMO%"))
      .select(col("p_partkey").as("promo_part"))
    // fact⋈fact FIRST, on lineitem-side keys only (partkey + the ship
    // week) — both sides ride the ONE partkey-bucketed index, so the
    // widest join never shuffles its big legs; the orders/customer/
    // promo dims attach afterwards on the (already joined) stream
    sales
      .join(inv,
        col("sl_part") === col("inv_part") &&
          col("inv_yr") === year(col("sl_ship")) &&
          col("inv_wk") === weekofyear(col("sl_ship")) &&
          col("inv_qty") < col("sl_qty")) // inequality stays residual
      .join(ord, col("sl_ord") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey")) // demographic gate
      .filter(col("sl_ship") >
        col("o_orderdate") + expr("INTERVAL 5 DAYS"))
      .join(promo, col("sl_part") === col("promo_part"), "left_outer")
      .groupBy(year(col("o_orderdate")).as("yr"),
        weekofyear(col("o_orderdate")).as("wk"))
      .agg(
        sum(when(col("promo_part").isNull, 1L).otherwise(0L))
          .cast(LongType).as("no_promo"),
        sum(when(col("promo_part").isNotNull, 1L).otherwise(0L))
          .cast(LongType).as("promo"),
        count(lit(1)).cast(LongType).as("total_cnt"))
      .orderBy(col("total_cnt").desc, col("yr"), col("wk"))
      .limit(100)
  }

  val qds72Sql: String =
    s"""SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
       |  weekofyear(o_orderdate) AS wk,
       |  CAST(SUM(CASE WHEN promo_part IS NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS no_promo,
       |  CAST(SUM(CASE WHEN promo_part IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS promo,
       |  CAST(COUNT(*) AS BIGINT) AS total_cnt
       |FROM lineitem sl
       |  JOIN orders ON sl.l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN lineitem inv ON sl.l_partkey = inv.l_partkey
       |    AND EXTRACT(YEAR FROM inv.l_shipdate) =
       |        EXTRACT(YEAR FROM sl.l_shipdate)
       |    AND weekofyear(inv.l_shipdate) = weekofyear(sl.l_shipdate)
       |    AND inv.l_quantity < sl.l_quantity
       |  LEFT OUTER JOIN (SELECT p_partkey AS promo_part FROM part
       |    WHERE p_type LIKE 'PROMO%') p ON sl.l_partkey = promo_part
       |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       |  AND c_mktsegment = 'BUILDING'
       |  AND sl.l_shipdate > o_orderdate + INTERVAL 5 DAY
       |GROUP BY 1, 2
       |ORDER BY total_cnt DESC, yr, wk
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q93 shape (reference tpcds/queries/q93.sql): sales LEFT
   * OUTER returns on a composite key, a CASE computing
   * returns-adjusted revenue — and the q93 trap: the WHERE clause
   * compares a RETURNS-side column (`sr_reason_sk = r_reason_sk`), so
   * the outer join is semantically INNER and the optimizer must prove
   * it (Catalyst's EliminateOuterJoin) BEFORE the index rules can see a
   * plain equi-join to serve bucketed. Mapped: lineitem sales ⋈
   * (returnflag='R' lineitem, aggregated to unique (orderkey, partkey))
   * on the composite key, reason dim = the return's supplier nation.
   * Both fact legs and the orders join ride one orderkey-bucketed index
   * (accel_ci_li_qty).
   */
  def qds93ReturnsAdjusted(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liQty)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow)
    ensureIndex(spark, sfDir, AccelIndexes.suppNat)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ret = li.filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey").as("r_ord"), col("l_partkey").as("r_part"))
      .agg(sum(col("l_quantity")).as("ret_qty"),
        max(col("l_suppkey")).as("ret_supp"))
    val supp = Tables.load(spark, sfDir, "supplier")
      .filter(col("s_nationkey") === 7)
    val actSales = when(col("ret_qty").isNotNull,
      (col("l_quantity") - col("ret_qty")) * col("l_extendedprice"))
      .otherwise(col("l_quantity") * col("l_extendedprice"))
    li.join(ret,
        col("l_orderkey") === col("r_ord") &&
          col("l_partkey") === col("r_part"), "left_outer")
      // orders joins while the stream is still orderkey-partitioned
      // (the SMJ output keeps the left side's bucketing), so this leg
      // is zero-shuffle too; the supplier re-key comes last
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      // the reason filter references the RETURNS side: the left outer
      // is semantically inner, and the engine must prove it
      .join(supp, col("ret_supp") === col("s_suppkey"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(moneySum(actSales).as("sumsales"))
      .orderBy(col("sumsales"), col("custkey"))
      .limit(100)
  }

  val qds93Sql: String =
    s"""SELECT o_custkey AS custkey,
       |  ${sqlMoneySum(
         """CASE WHEN ret_qty IS NOT NULL
           | THEN (l_quantity - ret_qty) * l_extendedprice
           | ELSE l_quantity * l_extendedprice END""".stripMargin)}
       |    AS sumsales
       |FROM lineitem
       |  LEFT OUTER JOIN (
       |    SELECT l_orderkey AS r_ord, l_partkey AS r_part,
       |      SUM(l_quantity) AS ret_qty, MAX(l_suppkey) AS ret_supp
       |    FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2) r
       |    ON l_orderkey = r_ord AND l_partkey = r_part
       |  JOIN supplier ON ret_supp = s_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |WHERE s_nationkey = 7
       |GROUP BY 1
       |ORDER BY sumsales, custkey
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q28 shape (reference tpcds/queries/q28.sql): six quantity
   * bands, each computing avg / count / count(DISTINCT) of the list
   * price under a band-specific OR-of-ranges filter. The literal form
   * (and the oracle here) scans the fact SIX times — once per band
   * subquery. The engine form is ONE scan: a CASE classifies each row
   * into its (disjoint) band, and the three aggregates come out of a
   * two-phase distinct expansion — groupBy(band, price) counts
   * duplicates map-side, then groupBy(band) finishes count / distinct /
   * exact-decimal average in the same pass. At 100 TB that is 1 read
   * of 4 columns instead of 6 reads of the table.
   */
  def qds28BandStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val band = qds28Bands.foldRight(lit(null).cast("int")) {
      case ((b, (qLo, qHi), (pLo, pHi), (dLo, dHi), (tLo, tHi)), acc) =>
        when(col("l_quantity").between(qLo, qHi) &&
          (col("l_extendedprice").between(pLo, pHi) ||
            col("l_discount").between(dLo, dHi) ||
            col("l_tax").between(tLo, tHi)), lit(b)).otherwise(acc)
    }
    li.select(band.as("band"), col("l_extendedprice").as("lp"))
      .filter(col("band").isNotNull)
      .groupBy(col("band"), col("lp"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("band"))
      .agg(
        (sum(col("lp").cast(DecimalType(28, 6)) * col("c")).cast(DoubleType)
          / sum(col("c"))).as("avg_lp"),
        sum(col("c")).cast(LongType).as("cnt"),
        count(lit(1)).cast(LongType).as("cntd"))
      .orderBy(col("band"))
  }

  /** (band, quantity range, price range, discount range, tax range) —
    * the one source both the DataFrame CASE and the oracle's six
    * subqueries are generated from, so they can never drift. */
  private val qds28Bands
      : Seq[(Int, (Int, Int), (Int, Int), (Double, Double), (Double, Double))] =
    Seq(
      (1, (1, 8), (900, 10900), (0.02, 0.05), (0.01, 0.04)),
      (2, (9, 16), (20000, 30000), (0.04, 0.07), (0.03, 0.06)),
      (3, (17, 24), (35000, 45000), (0.01, 0.04), (0.05, 0.08)),
      (4, (25, 32), (15000, 25000), (0.06, 0.09), (0.00, 0.03)),
      (5, (33, 40), (50000, 60000), (0.03, 0.06), (0.02, 0.05)),
      (6, (41, 50), (28000, 38000), (0.05, 0.08), (0.04, 0.07)))

  val qds28Sql: String = qds28Bands.map {
    case (b, (qLo, qHi), (pLo, pHi), (dLo, dHi), (tLo, tHi)) =>
      s"""SELECT $b AS band,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
         |    / COUNT(l_extendedprice) AS avg_lp,
         |  CAST(COUNT(l_extendedprice) AS BIGINT) AS cnt,
         |  CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS cntd
         |FROM lineitem
         |WHERE l_quantity BETWEEN $qLo AND $qHi
         |  AND (l_extendedprice BETWEEN $pLo AND $pHi
         |    OR l_discount BETWEEN $dLo AND $dHi
         |    OR l_tax BETWEEN $tLo AND $tHi)""".stripMargin
  }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY band")

  /**
   * TPC-DS q47 shape (reference tpcds/queries/q47.sql): monthly sales
   * by (brand, store) with a yearly-average deviation filter and the
   * previous/next month's sales alongside. TPC-DS spells prev/next as
   * a THREE-WAY SELF-JOIN of the aggregate CTE on consecutive rank —
   * the oracle keeps that literal form; the engine form is lag/lead
   * window functions over the same partition, so a hash match also
   * proves the window rewrite ≡ the rank self-join. Mapped: brand =
   * p_brand, store = s_name, months from l_shipdate (1995 plus the
   * edge months 1994-12 / 1996-01 so interior rows keep both
   * neighbors; lag/lead NULLs at series edges reproduce the self
   * join's inner-ness via IS NOT NULL).
   *
   * Scale note — this is the shape [[graft.execution.AlignAggExchange]]
   * exists for: the monthly aggregate groups on (brand, sname, yr, moy)
   * but both window passes partition on prefixes of it, so Spark's
   * default plan re-shuffles the aggregated stream. The windows are
   * ordered narrowest-partition-first ((brand, sname) lag/lead below
   * the (brand, sname, yr) average), which makes the second window
   * ride the first one's clustering, and the prep rule then keys the
   * AGGREGATE exchange on (brand, sname) — one shuffle serves the
   * aggregate and both windows.
   */
  def qds47MonthlyDeviation(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensureIndex(spark, sfDir, AccelIndexes.liInv)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    ensureIndex(spark, sfDir, AccelIndexes.suppDim)
    val yr = year(col("l_shipdate")); val moy = month(col("l_shipdate"))
    val v1 = Tables.load(spark, sfDir, "lineitem")
      .filter(yr === 1995 || (yr === 1994 && moy === 12) ||
        (yr === 1996 && moy === 1))
      .join(Tables.load(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand").as("brand"), col("s_name").as("sname"),
        yr.as("yr"), moy.as("moy"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(28, 6))).as("ssd"))
    val wMo = Window.partitionBy(col("brand"), col("sname"))
      .orderBy(col("yr"), col("moy"))
    val wYr = Window.partitionBy(col("brand"), col("sname"), col("yr"))
    v1.withColumn("psum_d", lag(col("ssd"), 1).over(wMo))
      .withColumn("nsum_d", lead(col("ssd"), 1).over(wMo))
      .withColumn("avg_ms",
        sum(col("ssd")).over(wYr).cast(DoubleType) / count(lit(1)).over(wYr))
      .filter(col("yr") === 1995 && col("psum_d").isNotNull &&
        col("nsum_d").isNotNull && col("avg_ms") > 0 &&
        abs(col("ssd").cast(DoubleType) - col("avg_ms")) / col("avg_ms") > 0.1)
      .select(col("brand"), col("sname"), col("yr"), col("moy"),
        col("ssd").cast(DoubleType).as("sum_sales"), col("avg_ms"),
        col("psum_d").cast(DoubleType).as("psum"),
        col("nsum_d").cast(DoubleType).as("nsum"))
      .orderBy(col("sum_sales") - col("avg_ms"), col("brand"),
        col("sname"), col("moy"))
      .limit(100)
  }

  val qds47Sql: String =
    s"""WITH v1 AS (
       |  SELECT p_brand AS brand, s_name AS sname,
       |    CAST(strftime(l_shipdate, '%Y') AS INT) AS yr,
       |    CAST(strftime(l_shipdate, '%m') AS INT) AS moy,
       |    SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS ssd
       |  FROM lineitem
       |    JOIN part ON l_partkey = p_partkey
       |    JOIN supplier ON l_suppkey = s_suppkey
       |  WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
       |    OR (CAST(strftime(l_shipdate, '%Y') AS INT) = 1994
       |        AND CAST(strftime(l_shipdate, '%m') AS INT) = 12)
       |    OR (CAST(strftime(l_shipdate, '%Y') AS INT) = 1996
       |        AND CAST(strftime(l_shipdate, '%m') AS INT) = 1)
       |  GROUP BY 1, 2, 3, 4),
       |v2 AS (
       |  SELECT *,
       |    CAST(SUM(ssd) OVER (PARTITION BY brand, sname, yr) AS DOUBLE)
       |      / COUNT(*) OVER (PARTITION BY brand, sname, yr) AS avg_ms,
       |    RANK() OVER (PARTITION BY brand, sname ORDER BY yr, moy) AS rn
       |  FROM v1)
       |SELECT v.brand, v.sname, v.yr, v.moy,
       |  CAST(v.ssd AS DOUBLE) AS sum_sales, v.avg_ms,
       |  CAST(p.ssd AS DOUBLE) AS psum, CAST(n.ssd AS DOUBLE) AS nsum
       |FROM v2 v, v2 p, v2 n
       |WHERE v.brand = p.brand AND v.brand = n.brand
       |  AND v.sname = p.sname AND v.sname = n.sname
       |  AND v.rn = p.rn + 1 AND v.rn = n.rn - 1
       |  AND v.yr = 1995 AND v.avg_ms > 0
       |  AND (CASE WHEN v.avg_ms > 0
       |       THEN abs(CAST(v.ssd AS DOUBLE) - v.avg_ms) / v.avg_ms
       |       ELSE NULL END) > 0.1
       |ORDER BY CAST(v.ssd AS DOUBLE) - v.avg_ms, v.brand, v.sname, v.moy
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q78 shape (reference tpcds/queries/q78.sql): per channel,
   * keep only sales with NO matching return — spelled as LEFT OUTER
   * JOIN returns + `IS NULL` on the return key, over a COMPOSITE key —
   * aggregate each channel, then ratio the primary channel against the
   * other two through LEFT joins whose null-intolerant `> 0` gates make
   * them semantically inner (Catalyst's EliminateOuterJoin must prove
   * it). Mapped: channels are l_linenumber mod 3 classes; returns are
   * the channel's 'R' rows collapsed to unique (orderkey, partkey), so
   * the no-return gate kills every line of a returned (order, part) —
   * non-degenerate, unlike keying on the row's own id. The composite
   * (orderkey, partkey) join rides the orderkey-bucketed liChan pair
   * via subset-key co-partitioning on BOTH sides, and each channel's
   * orders join shares the same buckets: all three channel pipelines
   * run zero-shuffle up to their group-by. The three channel
   * aggregates hash on identical (yr, part, prio) key order, so the
   * final three-way join adds NO exchange above them.
   */
  def qds78NoReturnRatio(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3Prio)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    def channel(m: Int, tag: String): DataFrame = {
      val sales = li.filter(pmod(col("l_linenumber"), lit(3)) === m)
      val rets = sales.filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey").as(s"${tag}_rord"),
          col("l_partkey").as(s"${tag}_rpart"))
        .agg(count(lit(1)).as(s"${tag}_rc"))
      sales
        .join(rets, col("l_orderkey") === col(s"${tag}_rord") &&
          col("l_partkey") === col(s"${tag}_rpart"), "left_outer")
        .filter(col(s"${tag}_rord").isNull)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("l_shipdate")).as(s"${tag}_yr"),
          col("l_partkey").as(s"${tag}_part"),
          col("o_orderpriority").as(s"${tag}_prio"))
        .agg(moneySum(col("l_quantity")).as(s"${tag}_qty"),
          moneySum(col("l_extendedprice")).as(s"${tag}_wc"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as(s"${tag}_sp"))
    }
    val ss = channel(0, "ss")
    val ws = channel(1, "ws")
    val cs = channel(2, "cs")
    ss.join(ws,
        col("ss_yr") === col("ws_yr") && col("ss_part") === col("ws_part") &&
          col("ss_prio") === col("ws_prio"), "left_outer")
      .join(cs,
        col("ss_yr") === col("cs_yr") && col("ss_part") === col("cs_part") &&
          col("ss_prio") === col("cs_prio"), "left_outer")
      .filter(col("ss_yr") === 1995 &&
        coalesce(col("ws_qty"), lit(0.0)) > 0 &&
        coalesce(col("cs_qty"), lit(0.0)) > 0)
      .select(
        (col("ss_qty") / (col("ws_qty") + col("cs_qty"))).as("ratio"),
        col("ss_qty").as("store_qty"), col("ss_wc").as("store_wc"),
        col("ss_sp").as("store_sp"),
        (col("ws_qty") + col("cs_qty")).as("other_qty"),
        (col("ws_wc") + col("cs_wc")).as("other_wc"),
        (col("ws_sp") + col("cs_sp")).as("other_sp"),
        col("ss_part").as("partkey"), col("ss_prio").as("prio"))
      .orderBy(col("ratio"), col("store_qty").desc, col("store_wc").desc,
        col("store_sp").desc, col("other_qty"), col("other_wc"),
        col("other_sp"), col("partkey"), col("prio"))
      .limit(100)
  }

  private def qds78ChannelSql(m: Int): String =
    s"""SELECT CAST(strftime(l_shipdate, '%Y') AS INT) AS yr,
       |    l_partkey AS part, o_orderpriority AS prio,
       |    ${sqlMoneySum("l_quantity")} AS qty,
       |    ${sqlMoneySum("l_extendedprice")} AS wc,
       |    ${sqlMoneySum("l_extendedprice * (1 - l_discount)")} AS sp
       |  FROM lineitem
       |    LEFT OUTER JOIN (
       |      SELECT l_orderkey AS rord, l_partkey AS rpart FROM lineitem
       |      WHERE l_linenumber % 3 = $m AND l_returnflag = 'R'
       |      GROUP BY 1, 2) r
       |      ON l_orderkey = rord AND l_partkey = rpart
       |    JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_linenumber % 3 = $m AND rord IS NULL
       |  GROUP BY 1, 2, 3""".stripMargin

  val qds78Sql: String =
    s"""WITH ss AS (
       |  ${qds78ChannelSql(0)}),
       |ws AS (
       |  ${qds78ChannelSql(1)}),
       |cs AS (
       |  ${qds78ChannelSql(2)})
       |SELECT ss.qty / (ws.qty + cs.qty) AS ratio,
       |  ss.qty AS store_qty, ss.wc AS store_wc, ss.sp AS store_sp,
       |  ws.qty + cs.qty AS other_qty, ws.wc + cs.wc AS other_wc,
       |  ws.sp + cs.sp AS other_sp,
       |  ss.part AS partkey, ss.prio AS prio
       |FROM ss
       |  LEFT JOIN ws ON ws.yr = ss.yr AND ws.part = ss.part
       |    AND ws.prio = ss.prio
       |  LEFT JOIN cs ON cs.yr = ss.yr AND cs.part = ss.part
       |    AND cs.prio = ss.prio
       |WHERE ss.yr = 1995 AND COALESCE(ws.qty, 0) > 0
       |  AND COALESCE(cs.qty, 0) > 0
       |ORDER BY ratio, store_qty DESC, store_wc DESC, store_sp DESC,
       |  other_qty, other_wc, other_sp, partkey, prio
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q39 shape (reference tpcds/queries/q39.sql): per (warehouse,
   * item, month) inventory mean and coefficient of variation, keep the
   * volatile groups (cov above a threshold), self-join consecutive
   * months. Mapped: warehouse → l_suppkey, month from l_shipdate
   * (1995-03 vs 1995-04), quantity moments from l_quantity. Both
   * engines compute cov from EXACT decimal moment sums
   * (n, Σq, Σq²) with the identical double expression
   * `sqrt(greatest(sq2 - sq*sq/n, 0)/(n-1)) / (sq/n)` — same operand
   * order, so IEEE rounding is bit-identical and the hash compare is
   * safe on a derived double (the greatest() guards the
   * variance-zero case where `sq*sq/n` rounds above sq2).
   *
   * Scale shape: the moment aggregate groups on (suppkey, month) and
   * the month-to-month self-join keys on suppkey alone — with the
   * suppkey-bucketed index both sides satisfy their distributions
   * straight off the scan (subset clustering), so the whole query —
   * two aggregates, the self-join, the top-k — plans with ZERO
   * exchanges. The unbucketed twin of this shape is what
   * [[graft.execution.AlignAggExchange]]'s join branch exists for.
   */
  def qds39InventoryCov(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liSuppQty)
    val li = Tables.load(spark, sfDir, "lineitem")
    val yr = year(col("l_shipdate")); val moy = month(col("l_shipdate"))
    val qd = col("l_quantity").cast(DecimalType(14, 3))
    val inv = li.filter(yr === 1995 && (moy === 3 || moy === 4))
      .groupBy(col("l_suppkey").as("sk"), moy.as("moy"))
      .agg(count(lit(1)).cast(DoubleType).as("n"),
        sum(qd).cast(DoubleType).as("sq"),
        sum(qd * qd).cast(DoubleType).as("sq2"))
      .filter(col("n") >= 2)
      .select(col("sk"), col("moy"), (col("sq") / col("n")).as("mean"),
        (sqrt(greatest(col("sq2") - col("sq") * col("sq") / col("n"),
          lit(0.0)) / (col("n") - 1)) / (col("sq") / col("n"))).as("cov"))
      .filter(col("cov") > 0.57)
    val m1 = inv.filter(col("moy") === 3)
      .select(col("sk").as("sk1"), col("mean").as("mean1"),
        col("cov").as("cov1"))
    val m2 = inv.filter(col("moy") === 4)
      .select(col("sk").as("sk2"), col("mean").as("mean2"),
        col("cov").as("cov2"))
    m1.join(m2, col("sk1") === col("sk2"))
      .select(col("sk1").as("suppkey"), col("mean1"), col("cov1"),
        col("mean2"), col("cov2"))
      .orderBy(col("suppkey"))
      .limit(100)
  }

  val qds39Sql: String =
    s"""WITH inv AS (
       |  SELECT l_suppkey AS sk,
       |    CAST(strftime(l_shipdate, '%m') AS INT) AS moy,
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(CAST(l_quantity AS DECIMAL(14,3))) AS DOUBLE) AS sq,
       |    CAST(SUM(CAST(l_quantity AS DECIMAL(14,3))
       |      * CAST(l_quantity AS DECIMAL(14,3))) AS DOUBLE) AS sq2
       |  FROM lineitem
       |  WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
       |    AND CAST(strftime(l_shipdate, '%m') AS INT) IN (3, 4)
       |  GROUP BY 1, 2),
       |c AS (
       |  SELECT sk, moy, sq / n AS mean,
       |    sqrt(greatest(sq2 - sq * sq / n, 0.0) / (n - 1)) / (sq / n)
       |      AS cov
       |  FROM inv WHERE n >= 2)
       |SELECT m1.sk AS suppkey, m1.mean AS mean1, m1.cov AS cov1,
       |  m2.mean AS mean2, m2.cov AS cov2
       |FROM c m1 JOIN c m2 ON m1.sk = m2.sk
       |WHERE m1.moy = 3 AND m2.moy = 4
       |  AND m1.cov > 0.57 AND m2.cov > 0.57
       |ORDER BY suppkey
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q75 shape (reference tpcds/queries/q75.sql): per channel,
   * sales net of returns (LEFT JOIN the channel's returns on the
   * composite key, COALESCE the miss to zero), UNION ALL the channels,
   * aggregate to (year, brand, type), then self-join current year
   * against the prior year and keep the brands whose net quantity fell
   * below 90%. The oracle keeps that literal two-level-aggregate +
   * self-join form; the engine form collapses it to a SINGLE
   * aggregation — union the three row-level channel streams and pivot
   * the two years into conditional sums, so the whole query runs with
   * ONE exchange and never materializes or re-joins the year slices.
   * The hash match proves pivot ≡ (re-aggregate + self-join). Mapped:
   * channels are l_linenumber mod 3 classes (as qds78), returns are
   * the channel's 'R' rows collapsed to unique (orderkey, partkey),
   * years 1995 → 1996, grain (p_brand, p_type).
   *
   * Scale: each channel's returns pre-aggregate and composite-key
   * no-return join ride the orderkey-bucketed pair zero-shuffle; the
   * part dim broadcasts; partial aggregation runs map-side ABOVE the
   * union, so the one exchange carries only (brand, type) partials.
   * A year-pivot instead of a self-join halves the fact passes at
   * 100 TB — the two-level form reads every channel twice (once per
   * year side) unless the planner dedups the CTE, which Spark's
   * physical planning does not.
   */
  def qds75YoyDecline(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(28, 6))
    def channel(m: Int, tag: String): DataFrame = {
      val chan = pmod(col("l_linenumber"), lit(3)) === m
      val rets = li.filter(chan && col("l_returnflag") === "R")
        .groupBy(col("l_orderkey").as(s"${tag}_rord"),
          col("l_partkey").as(s"${tag}_rpart"))
        .agg(sum(dec(col("l_quantity"))).as(s"${tag}_rq"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as(s"${tag}_ramt"))
      li.filter(chan &&
          (year(col("l_shipdate")) === 1995 ||
            year(col("l_shipdate")) === 1996))
        .join(rets, col("l_orderkey") === col(s"${tag}_rord") &&
          col("l_partkey") === col(s"${tag}_rpart"), "left_outer")
        .join(part, col("l_partkey") === col("p_partkey"))
        .select(year(col("l_shipdate")).as("yr"), col("p_brand").as("brand"),
          col("p_type").as("ptype"),
          (dec(col("l_quantity")) -
            coalesce(col(s"${tag}_rq"), dec(lit(0)))).as("cnt_d"),
          (dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) -
            coalesce(col(s"${tag}_ramt"), dec(lit(0)))).as("amt_d"))
    }
    channel(0, "ss").unionAll(channel(1, "ws")).unionAll(channel(2, "cs"))
      .groupBy(col("brand"), col("ptype"))
      .agg(
        sum(when(col("yr") === 1995, col("cnt_d"))).cast(DoubleType)
          .as("prev_cnt"),
        sum(when(col("yr") === 1996, col("cnt_d"))).cast(DoubleType)
          .as("curr_cnt"),
        sum(when(col("yr") === 1995, col("amt_d"))).cast(DoubleType)
          .as("prev_amt"),
        sum(when(col("yr") === 1996, col("amt_d"))).cast(DoubleType)
          .as("curr_amt"))
      .filter(col("prev_cnt") > 0 && col("curr_cnt") / col("prev_cnt") < 0.9)
      .select(col("brand"), col("ptype"), col("prev_cnt"), col("curr_cnt"),
        (col("curr_cnt") - col("prev_cnt")).as("cnt_diff"),
        (col("curr_amt") - col("prev_amt")).as("amt_diff"))
      .orderBy(col("cnt_diff"), col("brand"), col("ptype"))
      .limit(100)
  }

  private def qds75ChannelSql(m: Int): String =
    s"""SELECT CAST(strftime(l_shipdate, '%Y') AS INT) AS yr,
       |    p_brand AS brand, p_type AS ptype,
       |    SUM(CAST(l_quantity AS DECIMAL(28,6))
       |      - COALESCE(rq, 0)) AS cnt,
       |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
       |      - COALESCE(ramt, 0)) AS amt
       |  FROM lineitem
       |    LEFT JOIN (
       |      SELECT l_orderkey AS rord, l_partkey AS rpart,
       |        SUM(CAST(l_quantity AS DECIMAL(28,6))) AS rq,
       |        SUM(CAST(l_extendedprice * (1 - l_discount)
       |          AS DECIMAL(28,6))) AS ramt
       |      FROM lineitem
       |      WHERE l_linenumber % 3 = $m AND l_returnflag = 'R'
       |      GROUP BY 1, 2) r
       |      ON l_orderkey = rord AND l_partkey = rpart
       |    JOIN part ON l_partkey = p_partkey
       |  WHERE l_linenumber % 3 = $m
       |    AND CAST(strftime(l_shipdate, '%Y') AS INT) IN (1995, 1996)
       |  GROUP BY 1, 2, 3""".stripMargin

  val qds75Sql: String =
    s"""WITH allc AS (
       |  ${qds75ChannelSql(0)}
       |UNION ALL
       |  ${qds75ChannelSql(1)}
       |UNION ALL
       |  ${qds75ChannelSql(2)}),
       |tot AS (
       |  SELECT yr, brand, ptype,
       |    CAST(SUM(cnt) AS DOUBLE) AS cnt, CAST(SUM(amt) AS DOUBLE) AS amt
       |  FROM allc GROUP BY 1, 2, 3)
       |SELECT c.brand, c.ptype,
       |  p.cnt AS prev_cnt, c.cnt AS curr_cnt,
       |  c.cnt - p.cnt AS cnt_diff, c.amt - p.amt AS amt_diff
       |FROM tot c JOIN tot p
       |  ON c.brand = p.brand AND c.ptype = p.ptype
       |WHERE c.yr = 1996 AND p.yr = 1995
       |  AND p.cnt > 0 AND c.cnt / p.cnt < 0.9
       |ORDER BY cnt_diff, c.brand, c.ptype
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q34/q73 shape (reference tpcds/queries/q34.sql, q73.sql):
   * orders with an unusual number of lines — GROUP BY order, HAVING the
   * count in a band, then join back to the order and its customer for
   * display columns. The count aggregate groups on the fact's own
   * bucket key, so it runs with NO exchange straight off the
   * orderkey-bucketed index; the orders join rides the same buckets;
   * only the customer join re-keys (one exchange), and the customer
   * side serves bucketed. ONE exchange end to end.
   */
  def qds34CountGate(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liJoin)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow)
    ensureIndex(spark, sfDir, AccelIndexes.custDim)
    val li = Tables.load(spark, sfDir, "lineitem")
    val cnt = li.groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).cast(LongType).as("cnt"))
      .filter(col("cnt") >= 8 && col("cnt") <= 11)
    cnt.join(Tables.load(spark, sfDir, "orders"),
        col("k") === col("o_orderkey"))
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey").as("orderkey"), col("cnt"))
      .orderBy(col("c_name"), col("orderkey"))
      .limit(200)
  }

  val qds34Sql: String =
    s"""WITH cnts AS (
       |  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM lineitem GROUP BY 1 HAVING COUNT(*) BETWEEN 8 AND 11)
       |SELECT c_name, o_orderkey AS orderkey, cnt
       |FROM cnts
       |  JOIN orders ON k = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |ORDER BY c_name, orderkey
       |LIMIT 200""".stripMargin

  /**
   * TPC-DS q17 shape (reference tpcds/queries/q17.sql): items bought,
   * returned, and bought AGAIN by the same customer later — a
   * triple-fact chain (sales ⋈ returns on the sale's key, then the
   * repurchase by (customer, item) with a later date), with quantity
   * statistics per brand. Mapped: returns are 'R' lines with the
   * customer from orders; repurchases are any same-(custkey, partkey)
   * line on a later order date.
   *
   * Scale design: both fact legs ride the orderkey-bucketed pair
   * (lineitem ⋈ orders zero-shuffle), re-key ONCE to the
   * (custkey, partkey) pair grain, and — the load-bearing choice — the
   * part dim joins AFTER pre-aggregation to partkey grain, so the dim
   * join processes |parts| rows, not |pairs| (at 100 TB the dim is not
   * broadcastable and joining it against the raw pair stream would
   * shuffle the fact an extra time). Brand totals re-aggregate exact
   * decimal partial sums, so the two-level aggregation is
   * hash-identical to the oracle's direct GROUP BY brand.
   */
  def qds17RepurchaseStats(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liQty)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val ord = Tables.load(spark, sfDir, "orders")
    def salesLines(tag: String): DataFrame =
      Tables.load(spark, sfDir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as(s"${tag}_ck"),
          col("l_partkey").as(s"${tag}_pk"),
          col("l_quantity").as(s"${tag}_q"),
          col("o_orderdate").as(s"${tag}_d"),
          col("l_returnflag").as(s"${tag}_rf"))
    val rets = salesLines("r").filter(col("r_rf") === "R")
    val repur = salesLines("s")
    val pairs = repur.join(rets,
      col("s_ck") === col("r_ck") && col("s_pk") === col("r_pk") &&
        col("s_d") > col("r_d"))
    val perPart = pairs.groupBy(col("s_pk"))
      .agg(count(lit(1)).as("n"),
        sum(col("s_q").cast(DecimalType(28, 6))).as("sq"),
        sum(col("r_q").cast(DecimalType(28, 6))).as("rq"))
    perPart
      .join(Tables.load(spark, sfDir, "part"),
        col("s_pk") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(col("n")).cast(LongType).as("pairs"),
        (sum(col("sq")).cast(DoubleType) /
          sum(col("n")).cast(DoubleType)).as("avg_repurchase_qty"),
        (sum(col("rq")).cast(DoubleType) /
          sum(col("n")).cast(DoubleType)).as("avg_return_qty"))
      .orderBy(col("brand"))
      .limit(100)
  }

  val qds17Sql: String =
    s"""WITH sales AS (
       |  SELECT o_custkey AS ck, l_partkey AS pk, l_quantity AS q,
       |    o_orderdate AS d, l_returnflag AS rf
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
       |SELECT p_brand AS brand,
       |  CAST(COUNT(*) AS BIGINT) AS pairs,
       |  CAST(SUM(CAST(s.q AS DECIMAL(28,6))) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS avg_repurchase_qty,
       |  CAST(SUM(CAST(r.q AS DECIMAL(28,6))) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS avg_return_qty
       |FROM sales s
       |  JOIN sales r ON s.ck = r.ck AND s.pk = r.pk AND s.d > r.d
       |  JOIN part ON s.pk = p_partkey
       |WHERE r.rf = 'R'
       |GROUP BY 1
       |ORDER BY brand
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q2 shape (reference tpcds/queries/q2.sql): weekly revenue
   * pivoted to day-of-week columns, this year's week ratioed against
   * the SAME week next year — TPC-DS spells it as a self-join of the
   * weekly CTE on `week_seq = week_seq2 - 53`, a COMPUTED join key no
   * bucket layout can serve (the oracle keeps that literal form, and
   * the week_seq mapping `(yr-1995)*53 + wk` makes the +53 offset
   * exactly "same ISO week, next year"). The engine form pivots the
   * year axis too: ONE aggregate over one scan computes all 14
   * conditional sums (7 days × 2 years), so the whole query is one
   * exchange and the offset join disappears — the hash match proves
   * pivot ≡ offset-self-join. Day-of-week is Spark `dayofweek`
   * (1=Sunday); the oracle uses DuckDB `dayofweek()+1` to match.
   */
  def qds2WeekPivot(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    val li = Tables.load(spark, sfDir, "lineitem")
    val yr = year(col("l_shipdate"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    def daySum(y: Int, d: Int) =
      sum(when(yr === y && dayofweek(col("l_shipdate")) === d,
        rev.cast(DecimalType(28, 6)))).cast(DoubleType)
    val days = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
    val aggs = days.zipWithIndex.flatMap { case (nm, i) =>
      Seq(daySum(1995, i + 1).as(s"${nm}1"), daySum(1996, i + 1).as(s"${nm}2"))
    } ++ Seq(
      // presence guards: the literal form's INNER self-join drops weeks
      // entirely absent in either year — the pivot must too
      count(when(yr === 1995, lit(1))).as("n1"),
      count(when(yr === 1996, lit(1))).as("n2"))
    li.filter(yr === 1995 || yr === 1996)
      .groupBy(weekofyear(col("l_shipdate")).as("wk"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("wk") +:
        days.map(nm => (col(s"${nm}2") / col(s"${nm}1")).as(s"${nm}_ratio")): _*)
      .orderBy(col("wk"))
      .limit(100)
  }

  val qds2Sql: String = {
    val days = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
    val daySums = days.zipWithIndex.map { case (nm, i) =>
      s"""SUM(CASE WHEN dayofweek(l_shipdate) + 1 = ${i + 1}
         |      THEN CAST(l_extendedprice * (1 - l_discount)
         |        AS DECIMAL(28,6)) END) AS $nm""".stripMargin
    }.mkString(",\n    ")
    val ratios = days
      .map(nm => s"CAST(y2.$nm AS DOUBLE) / CAST(y1.$nm AS DOUBLE) AS ${nm}_ratio")
      .mkString(",\n  ")
    s"""WITH wk AS (
       |  SELECT (CAST(strftime(l_shipdate, '%Y') AS INT) - 1995) * 53
       |      + weekofyear(l_shipdate) AS week_seq,
       |    $daySums
       |  FROM lineitem
       |  WHERE CAST(strftime(l_shipdate, '%Y') AS INT) IN (1995, 1996)
       |  GROUP BY 1)
       |SELECT y1.week_seq AS wk,
       |  $ratios
       |FROM wk y1 JOIN wk y2 ON y1.week_seq = y2.week_seq - 53
       |ORDER BY wk
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q38 shape (reference tpcds/queries/q38.sql): customers
   * active in ALL THREE channels in one year — a triple INTERSECT of
   * distinct customer sets, counted. The literal form (kept by the
   * oracle) is a scale hazard twice over: Catalyst plans INTERSECT as
   * null-safe left-semi joins over distincts, and
   * PushDownLeftSemiAntiJoin then pushes one channel's semi join BELOW
   * another channel's orders join — un-bucketing that leg and
   * shuffling orders on the semi key and back (the qds64 double-shuffle
   * hazard, now via a set operation). The engine form eliminates the
   * set ops entirely: ONE pass over the joined fact pivots per-customer
   * channel PRESENCE into three conditional flags, filters all-present,
   * and counts — one fact read instead of three, two exchanges (the
   * custkey aggregate and the single-row count), no semi joins to
   * push anywhere. The hash match proves presence-pivot ≡ INTERSECT.
   */
  def qds38IntersectChannels(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val chan = pmod(col("l_linenumber"), lit(3))
    li.filter(year(col("l_shipdate")) === 1995)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(max(when(chan === 0, lit(1))).as("c0"),
        max(when(chan === 1, lit(1))).as("c1"),
        max(when(chan === 2, lit(1))).as("c2"))
      .filter(col("c0") === 1 && col("c1") === 1 && col("c2") === 1)
      .agg(count(lit(1)).cast(LongType).as("cnt"))
  }

  val qds38Sql: String = {
    def chan(m: Int) =
      s"""SELECT o_custkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_linenumber % 3 = $m
         |    AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995""".stripMargin
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |  ${chan(0)}
       |INTERSECT
       |  ${chan(1)}
       |INTERSECT
       |  ${chan(2)})""".stripMargin
  }

  /**
   * TPC-DS q58 shape (reference tpcds/queries/q58.sql): items whose
   * revenue is BALANCED across all three channels — each channel's
   * revenue within ±30% of the three-channel average. TPC-DS (and the
   * oracle here) spells it as three per-channel aggregate CTEs joined
   * pairwise on the item with band predicates — three scans and a
   * three-way join. The engine form is ONE aggregate: three conditional
   * channel sums in a single pass over the partkey-bucketed index, so
   * the whole query — aggregation, presence gate, band filter, top-k —
   * plans with ZERO exchanges. Band math runs in IEEE doubles cast from
   * exact decimal sums, identically ordered on both sides.
   */
  def qds58ChannelBand(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    val li = Tables.load(spark, sfDir, "lineitem")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(28, 6))
    def chanSum(m: Int) =
      sum(when(pmod(col("l_linenumber"), lit(3)) === m, rev))
    val banded = li.filter(year(col("l_shipdate")) === 1995)
      .groupBy(col("l_partkey").as("partkey"))
      .agg(chanSum(0).as("r0"), chanSum(1).as("r1"), chanSum(2).as("r2"))
      .filter(col("r0").isNotNull && col("r1").isNotNull &&
        col("r2").isNotNull)
      .select(col("partkey"),
        col("r0").cast(DoubleType).as("store_rev"),
        col("r1").cast(DoubleType).as("web_rev"),
        col("r2").cast(DoubleType).as("catalog_rev"))
      .withColumn("average",
        (col("store_rev") + col("web_rev") + col("catalog_rev")) / 3)
    Seq("store_rev", "web_rev", "catalog_rev")
      .foldLeft(banded)((df, c) =>
        df.filter(col(c) >= lit(0.7) * col("average") &&
          col(c) <= lit(1.3) * col("average")))
      .orderBy(col("partkey"))
      .limit(200)
  }

  val qds58Sql: String = {
    def chanCte(m: Int, nm: String) =
      s"""$nm AS (
         |  SELECT l_partkey AS pk,
         |    SUM(CAST(l_extendedprice * (1 - l_discount)
         |      AS DECIMAL(28,6))) AS rev
         |  FROM lineitem
         |  WHERE l_linenumber % 3 = $m
         |    AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
         |  GROUP BY 1)""".stripMargin
    s"""WITH ${chanCte(0, "ss")},
       |${chanCte(1, "ws")},
       |${chanCte(2, "cs")},
       |j AS (
       |  SELECT ss.pk AS partkey,
       |    CAST(ss.rev AS DOUBLE) AS store_rev,
       |    CAST(ws.rev AS DOUBLE) AS web_rev,
       |    CAST(cs.rev AS DOUBLE) AS catalog_rev
       |  FROM ss JOIN ws ON ss.pk = ws.pk JOIN cs ON ss.pk = cs.pk),
       |b AS (
       |  SELECT *, (store_rev + web_rev + catalog_rev) / 3 AS average
       |  FROM j)
       |SELECT partkey, store_rev, web_rev, catalog_rev, average
       |FROM b
       |WHERE store_rev >= 0.7 * average AND store_rev <= 1.3 * average
       |  AND web_rev >= 0.7 * average AND web_rev <= 1.3 * average
       |  AND catalog_rev >= 0.7 * average AND catalog_rev <= 1.3 * average
       |ORDER BY partkey
       |LIMIT 200""".stripMargin
  }

  /**
   * TPC-DS q94 shape (reference tpcds/queries/q94.sql): urgent orders
   * shipped in a year where some OTHER line shipped from a different
   * supplier (EXISTS self-probe) and NO line was returned (NOT EXISTS
   * self-probe) — COUNT(DISTINCT order) + total price. Runs through
   * spark.sql because EXISTS/NOT EXISTS have no DataFrame form; the
   * probes are FACT-side self-probes on the fact's own key, the shape
   * ExistsIndexRule accelerates as the LeftSemi/LeftAnti joins Catalyst
   * forms after the pre-CBO batch (qds35 covered the dim-outer case;
   * this is the fact-outer one, plus a distinct aggregate on top).
   */
  def qds94ShippedNotReturned(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liShip)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3Prio)
    Tables.load(spark, sfDir, "lineitem")
      .createOrReplaceTempView("qds94_lineitem")
    Tables.load(spark, sfDir, "orders")
      .createOrReplaceTempView("qds94_orders")
    spark.sql(
      s"""SELECT CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS n_orders,
         |  ${sqlMoneySum("l1.l_extendedprice")} AS total_price
         |FROM qds94_lineitem l1 JOIN qds94_orders ON l1.l_orderkey = o_orderkey
         |WHERE CAST(year(l1.l_shipdate) AS INT) = 1995
         |  AND o_orderpriority = '1-URGENT'
         |  AND EXISTS (SELECT 1 FROM qds94_lineitem l2
         |    WHERE l2.l_orderkey = l1.l_orderkey
         |      AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM qds94_lineitem l3
         |    WHERE l3.l_orderkey = l1.l_orderkey
         |      AND l3.l_returnflag = 'R')""".stripMargin)
  }

  val qds94Sql: String =
    s"""SELECT CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS n_orders,
       |  ${sqlMoneySum("l1.l_extendedprice")} AS total_price
       |FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
       |WHERE CAST(strftime(l1.l_shipdate, '%Y') AS INT) = 1995
       |  AND o_orderpriority = '1-URGENT'
       |  AND EXISTS (SELECT 1 FROM lineitem l2
       |    WHERE l2.l_orderkey = l1.l_orderkey
       |      AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
       |    WHERE l3.l_orderkey = l1.l_orderkey
       |      AND l3.l_returnflag = 'R')""".stripMargin

  /**
   * TPC-DS q49 shape (reference tpcds/queries/q49.sql): per channel,
   * the worst return ratios — items ranked by quantity-return ratio AND
   * by amount-return ratio, keeping rank ≤ 10 on either metric, union
   * across channels. The literal form (kept by the oracle) is three
   * channel subqueries, each scanning the fact and ranking GLOBALLY;
   * the engine form is ONE conditional aggregate over the
   * partkey-bucketed index (zero-exchange, as qds58) with the two rank
   * windows PARTITIONED BY the channel tag — channels are disjoint, so
   * per-channel partitioned ranks ≡ each subquery's global rank, and
   * the single window exchange carries only the per-(channel, item)
   * aggregate, never the fact. Rank ties are load-bearing here: every
   * fully-returned item ties at ratio 1.0, so RANK (not row_number)
   * semantics must match the oracle exactly.
   */
  def qds49WorstReturnRatios(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    val li = Tables.load(spark, sfDir, "lineitem")
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(28, 6))
    val isR = col("l_returnflag") === "R"
    val agg = li.filter(year(col("l_shipdate")) === 1995)
      .groupBy(pmod(col("l_linenumber"), lit(3)).as("chan"),
        col("l_partkey").as("pk"))
      .agg(
        coalesce(sum(when(isR, dec(col("l_quantity")))).cast(DoubleType),
          lit(0.0)).as("rq"),
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sq"),
        coalesce(sum(when(isR, dec(col("l_extendedprice"))))
          .cast(DoubleType), lit(0.0)).as("ramt"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("samt"))
      .select(col("chan"), col("pk"),
        (col("rq") / col("sq")).as("qty_ratio"),
        (col("ramt") / col("samt")).as("amt_ratio"))
    val byChan = Window.partitionBy(col("chan"))
    agg
      .withColumn("qty_rank",
        rank().over(byChan.orderBy(col("qty_ratio").desc)))
      .withColumn("amt_rank",
        rank().over(byChan.orderBy(col("amt_ratio").desc)))
      .filter(col("qty_rank") <= 10 || col("amt_rank") <= 10)
      .select(col("chan"), col("pk").as("partkey"),
        col("qty_ratio"), col("amt_ratio"),
        col("qty_rank").cast(LongType).as("qty_rank"),
        col("amt_rank").cast(LongType).as("amt_rank"))
      .orderBy(col("chan"), col("qty_rank"), col("amt_rank"), col("partkey"))
      .limit(100)
  }

  private def qds49ChannelSql(m: Int): String =
    s"""SELECT $m AS chan, pk AS partkey, qty_ratio, amt_ratio,
       |    CAST(RANK() OVER (ORDER BY qty_ratio DESC) AS BIGINT)
       |      AS qty_rank,
       |    CAST(RANK() OVER (ORDER BY amt_ratio DESC) AS BIGINT)
       |      AS amt_rank
       |  FROM (
       |    SELECT l_partkey AS pk,
       |      COALESCE(CAST(SUM(CASE WHEN l_returnflag = 'R'
       |        THEN CAST(l_quantity AS DECIMAL(28,6)) END) AS DOUBLE), 0.0)
       |        / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
       |        AS qty_ratio,
       |      COALESCE(CAST(SUM(CASE WHEN l_returnflag = 'R'
       |        THEN CAST(l_extendedprice AS DECIMAL(28,6)) END)
       |        AS DOUBLE), 0.0)
       |        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
       |          AS DOUBLE) AS amt_ratio
       |    FROM lineitem
       |    WHERE l_linenumber % 3 = $m
       |      AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
       |    GROUP BY 1)""".stripMargin

  val qds49Sql: String =
    s"""SELECT * FROM (
       |  SELECT * FROM (
       |${qds49ChannelSql(0)}) c0
       |  WHERE qty_rank <= 10 OR amt_rank <= 10
       |UNION ALL
       |  SELECT * FROM (
       |${qds49ChannelSql(1)}) c1
       |  WHERE qty_rank <= 10 OR amt_rank <= 10
       |UNION ALL
       |  SELECT * FROM (
       |${qds49ChannelSql(2)}) c2
       |  WHERE qty_rank <= 10 OR amt_rank <= 10)
       |ORDER BY chan, qty_rank, amt_rank, partkey
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q31 shape (reference tpcds/queries/q31.sql): per-county
   * store/web quarterly sales, self-joined six ways across quarters to
   * keep counties whose web growth outpaced store growth in BOTH q1→q2
   * and q2→q3. Mapped: county → supplier, the two channels are
   * l_linenumber parity classes. The oracle keeps TPC-DS's literal
   * six-CTE-leg join; the engine form pivots the CHANNEL axis into
   * conditional sums — one (supplier, quarter) grain aggregate instead
   * of two — which halves the fact passes, while the QUARTER axis
   * deliberately stays a self-join: an aggregate self-joined on a
   * SUBSET of its grouping keys is the q31 stress itself. Indexed, each
   * quarter leg aggregates shuffle-free on the suppkey buckets
   * (grouping ⊇ bucket key, computed qoy admitted) and the two joins
   * ride subset-key co-partitioning — ZERO exchanges end-to-end.
   * Un-indexed, the same shape is AlignAggExchange's SortMergeJoin
   * branch at TPC-DS scale: the rule re-keys each leg's aggregate
   * exchange onto suppkey and the join's consumer exchanges vanish
   * (pinned in AlignAggExchangeSpec).
   */
  def qds31QuarterGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liSuppChan)
    val li = Tables.load(spark, sfDir, "lineitem")
    val yr = year(col("l_shipdate"))
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(28, 6))
    val chan = pmod(col("l_linenumber"), lit(2))
    val base = li
      .filter(yr === 1995 && quarter(col("l_shipdate")) <= 3)
      .groupBy(col("l_suppkey").as("sk"),
        quarter(col("l_shipdate")).as("qoy"))
      .agg(sum(when(chan === 0, rev)).cast(DoubleType).as("ss"),
        sum(when(chan === 1, rev)).cast(DoubleType).as("ws"))
    def leg(q: Int) = base.filter(col("qoy") === q)
      .select(col("sk").as(s"sk$q"), col("ss").as(s"ss$q"),
        col("ws").as(s"ws$q"))
    leg(1)
      .join(leg(2), col("sk1") === col("sk2"))
      .join(leg(3), col("sk1") === col("sk3"))
      .filter(
        (when(col("ws1") > 0, col("ws2") / col("ws1"))
          > when(col("ss1") > 0, col("ss2") / col("ss1"))) &&
        (when(col("ws2") > 0, col("ws3") / col("ws2"))
          > when(col("ss2") > 0, col("ss3") / col("ss2"))))
      .select(col("sk1").as("suppkey"),
        (col("ws2") / col("ws1")).as("web_q1_q2"),
        (col("ss2") / col("ss1")).as("store_q1_q2"),
        (col("ws3") / col("ws2")).as("web_q2_q3"),
        (col("ss3") / col("ss2")).as("store_q2_q3"))
      .orderBy(col("suppkey"))
      .limit(100)
  }

  val qds31Sql: String = {
    def chanCte(m: Int, alias: String) =
      s"""SELECT l_suppkey AS sk, quarter(l_shipdate) AS qoy,
         |    ${sqlMoneySum("l_extendedprice * (1 - l_discount)")} AS $alias
         |  FROM lineitem
         |  WHERE l_linenumber % 2 = $m
         |    AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
         |    AND quarter(l_shipdate) <= 3
         |  GROUP BY 1, 2""".stripMargin
    s"""WITH ss AS (
       |  ${chanCte(0, "store_sales")}),
       |ws AS (
       |  ${chanCte(1, "web_sales")})
       |SELECT ss1.sk AS suppkey,
       |  ws2.web_sales / ws1.web_sales AS web_q1_q2,
       |  ss2.store_sales / ss1.store_sales AS store_q1_q2,
       |  ws3.web_sales / ws2.web_sales AS web_q2_q3,
       |  ss3.store_sales / ss2.store_sales AS store_q2_q3
       |FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
       |WHERE ss1.qoy = 1 AND ss2.qoy = 2 AND ss3.qoy = 3
       |  AND ws1.qoy = 1 AND ws2.qoy = 2 AND ws3.qoy = 3
       |  AND ss1.sk = ss2.sk AND ss2.sk = ss3.sk
       |  AND ss1.sk = ws1.sk AND ws1.sk = ws2.sk AND ws1.sk = ws3.sk
       |  AND (CASE WHEN ws1.web_sales > 0
       |       THEN ws2.web_sales / ws1.web_sales END)
       |    > (CASE WHEN ss1.store_sales > 0
       |       THEN ss2.store_sales / ss1.store_sales END)
       |  AND (CASE WHEN ws2.web_sales > 0
       |       THEN ws3.web_sales / ws2.web_sales END)
       |    > (CASE WHEN ss2.store_sales > 0
       |       THEN ss3.store_sales / ss2.store_sales END)
       |ORDER BY suppkey
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q59 shape (reference tpcds/queries/q59.sql): the q2 weekly
   * pivot WIDENED by the store dimension — per-(store, week) day-of-week
   * sums, this year's week ratioed against the same week last year, the
   * store name attached. Mapped: store → supplier (s_name), sales price
   * → l_extendedprice. The oracle keeps the literal form — the wss CTE
   * materialized once and self-joined on (store, week_seq − 53) through
   * two store⋈date subqueries. The engine form pivots the year axis into
   * per-day conditional sums with presence guards (the qds2 machinery
   * under a second, wider shape): grouping (suppkey, week) rides the
   * suppkey buckets shuffle-free — grouping ⊇ bucket key, the computed
   * week admitted — the supplier dim broadcasts, and the whole query
   * plans with ZERO exchanges where the literal form shuffles the fact
   * twice and the week pair once.
   */
  def qds59WeekStorePivot(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liSuppChan)
    val li = Tables.load(spark, sfDir, "lineitem")
    val yr = year(col("l_shipdate"))
    val price = col("l_extendedprice").cast(DecimalType(28, 6))
    def daySum(y: Int, d: Int) =
      sum(when(yr === y && dayofweek(col("l_shipdate")) === d, price))
        .cast(DoubleType)
    val days = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
    val aggs = days.zipWithIndex.flatMap { case (nm, i) =>
      Seq(daySum(1995, i + 1).as(s"${nm}1"), daySum(1996, i + 1).as(s"${nm}2"))
    } ++ Seq(
      // presence guards: the literal INNER self-join keeps only weeks a
      // store traded in BOTH years — the pivot must too
      count(when(yr === 1995, lit(1))).as("n1"),
      count(when(yr === 1996, lit(1))).as("n2"))
    val wss = li.filter(yr === 1995 || yr === 1996)
      .groupBy(col("l_suppkey").as("sk"),
        weekofyear(col("l_shipdate")).as("wk"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n1") > 0 && col("n2") > 0)
    wss
      .join(Tables.load(spark, sfDir, "supplier"),
        col("sk") === col("s_suppkey"))
      .select(col("s_name").as("sname") +: col("sk").as("suppkey") +:
        col("wk") +: days.map(nm =>
          (col(s"${nm}2") / col(s"${nm}1")).as(s"${nm}_ratio")): _*)
      .orderBy(col("sname"), col("suppkey"), col("wk"))
      .limit(100)
  }

  val qds59Sql: String = {
    val days = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
    val daySums = days.zipWithIndex.map { case (nm, i) =>
      s"""CAST(SUM(CASE WHEN dayofweek(l_shipdate) + 1 = ${i + 1}
         |      THEN CAST(l_extendedprice AS DECIMAL(28,6)) END)
         |      AS DOUBLE) AS ${nm}_sales""".stripMargin
    }.mkString(",\n    ")
    val ratios = days
      .map(nm => s"x.${nm}_sales / y.${nm}_sales AS ${nm}_ratio")
      .mkString(",\n  ")
    s"""WITH wss AS (
       |  SELECT l_suppkey AS sk,
       |    (CAST(strftime(l_shipdate, '%Y') AS INT) - 1995) * 53
       |      + weekofyear(l_shipdate) AS week_seq,
       |    $daySums
       |  FROM lineitem
       |  WHERE CAST(strftime(l_shipdate, '%Y') AS INT) IN (1995, 1996)
       |  GROUP BY 1, 2)
       |SELECT s.s_name AS sname, y.sk AS suppkey, y.week_seq AS wk,
       |  $ratios
       |FROM wss y
       |  JOIN wss x ON y.sk = x.sk AND y.week_seq = x.week_seq - 53
       |  JOIN supplier s ON y.sk = s.s_suppkey
       |ORDER BY sname, suppkey, wk
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q86 shape (reference tpcds/queries/q86.sql): ROLLUP over the
   * category hierarchy feeding a rank-within-parent window, ordered by
   * hierarchy level. Mapped: (i_category, i_class) → (p_brand, p_type),
   * rank within brand — each brand's partition holds its detail rows
   * AND its own subtotal (which ranks first), the NULL partition holds
   * the grand total. The deliberate contrast with qds67: the window
   * partitions on the PLAIN rollup output column, BEFORE any coalesce —
   * so AlignAggExchange's alignment is value-correct and fires (the
   * rollup exchange is re-keyed onto p_brand and the window's own
   * exchange vanishes: ONE exchange end-to-end), where qds67's
   * coalesce-over-rollup key is pinned to NEVER align. The sentinel
   * coalesce happens only in the final projection, after the window.
   */
  def qds86RollupParentRank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val agg = li.filter(year(col("l_shipdate")) === 1995)
      .join(Tables.load(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .rollup(col("p_brand"), col("p_type"))
      .agg(moneySum(rev).as("total_sum"),
        (grouping(col("p_brand")) + grouping(col("p_type")))
          .cast("int").as("lochierarchy"))
    agg
      .withColumn("rank_within_parent", rank().over(
        Window.partitionBy(col("p_brand")).orderBy(col("total_sum").desc)))
      .select(col("total_sum"),
        coalesce(col("p_brand"), lit("ALL")).as("brand"),
        coalesce(col("p_type"), lit("ALL")).as("ptype"),
        col("lochierarchy"), col("rank_within_parent"))
      .orderBy(col("lochierarchy").desc, col("brand"), col("ptype"))
      .limit(100)
  }

  val qds86Sql: String =
    s"""WITH agg AS (
       |  SELECT p_brand, p_type,
       |    CAST(GROUPING(p_brand) + GROUPING(p_type) AS INT)
       |      AS lochierarchy,
       |    ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")}
       |      AS total_sum
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
       |  GROUP BY ROLLUP(p_brand, p_type))
       |SELECT total_sum,
       |  COALESCE(p_brand, 'ALL') AS brand,
       |  COALESCE(p_type, 'ALL') AS ptype,
       |  lochierarchy,
       |  RANK() OVER (PARTITION BY p_brand ORDER BY total_sum DESC)
       |    AS rank_within_parent
       |FROM agg
       |ORDER BY lochierarchy DESC, brand, ptype
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q44 shape (reference tpcds/queries/q44.sql): best and worst
   * performing items at one store — per-item average profit above a
   * 0.9× scalar-subquery floor, ranked ascending AND descending, the
   * two top-10 lists joined positionally, item names attached. The
   * literal form (kept by the oracle) computes each rank with a GLOBAL
   * `rank() OVER (ORDER BY …)` — a single-partition window that funnels
   * the ENTIRE aggregate through one task, twice, at any scale. The
   * engine form replaces both with TakeOrderedAndProject top-10s (the
   * rank is recovered as a row_number over ten rows): the per-item
   * aggregate rides the partkey buckets shuffle-free, each direction is
   * an O(10)-result cluster-wide top-k, and no full-width window ever
   * exists. Ranks are tie-broken by item id on both sides, so
   * rank ≡ position and the hash match proves top-k ≡ windowed rank.
   */
  def qds44RankEnds(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensureIndex(spark, sfDir, AccelIndexes.liInv)
    ensureIndex(spark, sfDir, AccelIndexes.partDim)
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    val priceDec = col("l_extendedprice").cast(DecimalType(28, 6))
    val sub = li.filter(col("l_suppkey") === 7L && col("l_quantity") < 10)
      .groupBy(col("l_suppkey"))
      .agg((sum(priceDec).cast(DoubleType) / count(lit(1))).as("sub_avg"))
      .select(col("sub_avg"))
    val base = li.filter(col("l_suppkey") === 7L)
      .groupBy(col("l_partkey").as("item_sk"))
      .agg((sum(priceDec).cast(DoubleType) / count(lit(1))).as("rank_col"))
      .crossJoin(broadcast(sub))
      .filter(col("rank_col") > lit(0.9) * col("sub_avg"))
      .select(col("item_sk"), col("rank_col"))
    def ends(asc: Boolean): DataFrame = {
      val keys =
        if (asc) Seq(col("rank_col").asc, col("item_sk").asc)
        else Seq(col("rank_col").desc, col("item_sk").desc)
      base.orderBy(keys: _*).limit(10)
        .withColumn("rnk", row_number().over(Window.orderBy(keys: _*)))
    }
    val a = ends(asc = true)
      .select(col("rnk"), col("item_sk").as("best_sk"))
    val d = ends(asc = false)
      .select(col("rnk").as("rnk2"), col("item_sk").as("worst_sk"))
    a.join(d, col("rnk") === col("rnk2"))
      .join(part.select(col("p_partkey").as("bpk"),
        col("p_name").as("best_performing")), col("best_sk") === col("bpk"))
      .join(part.select(col("p_partkey").as("wpk"),
        col("p_name").as("worst_performing")), col("worst_sk") === col("wpk"))
      .select(col("rnk"), col("best_performing"), col("worst_performing"))
      .orderBy(col("rnk"))
      .limit(100)
  }

  val qds44Sql: String = {
    val avgExpr =
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)"
    s"""WITH base AS (
       |  SELECT l_partkey AS item_sk, $avgExpr AS rank_col
       |  FROM lineitem WHERE l_suppkey = 7
       |  GROUP BY 1
       |  HAVING $avgExpr > 0.9 * (
       |    SELECT $avgExpr FROM lineitem
       |    WHERE l_suppkey = 7 AND l_quantity < 10
       |    GROUP BY l_suppkey)),
       |a AS (SELECT item_sk, rnk FROM (
       |  SELECT item_sk,
       |    RANK() OVER (ORDER BY rank_col ASC, item_sk ASC) AS rnk
       |  FROM base) WHERE rnk < 11),
       |d AS (SELECT item_sk, rnk FROM (
       |  SELECT item_sk,
       |    RANK() OVER (ORDER BY rank_col DESC, item_sk DESC) AS rnk
       |  FROM base) WHERE rnk < 11)
       |SELECT a.rnk AS rnk, i1.p_name AS best_performing,
       |  i2.p_name AS worst_performing
       |FROM a JOIN d ON a.rnk = d.rnk
       |  JOIN part i1 ON i1.p_partkey = a.item_sk
       |  JOIN part i2 ON i2.p_partkey = d.item_sk
       |ORDER BY rnk
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q70 shape (reference tpcds/queries/q70.sql): profit rollup
   * over the (state, county) hierarchy with rank-within-parent, GATED
   * to the top-5 states by a ranked subquery. Mapped: (state, county) →
   * (nation, supplier). Two deliberate deltas from the literal text:
   * TPC-DS's gating subquery partitions its rank BY s_state over
   * per-state rows — every partition is a singleton, ranking ≡ 1, the
   * gate passes everything (a known quirk of the published query); the
   * shape here implements the INTENT (global top-5 by revenue) so the
   * semi join is load-bearing. And like qds44, the engine computes that
   * top-5 as a TakeOrderedAndProject, not the literal's global rank
   * window — the oracle keeps a LIMIT-over-ORDER form with the same
   * tie-break. Downstream is the qds86 machinery under a gate: the
   * rank-within-parent window partitions on the PLAIN n_name rollup
   * output, so AlignAggExchange re-keys the rollup exchange and the
   * window adds none — exactly ONE window in the whole plan where the
   * literal form has two.
   */
  def qds70GatedRollupRank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensureIndex(spark, sfDir, AccelIndexes.liSuppChan)
    ensureIndex(spark, sfDir, AccelIndexes.suppNat)
    ensureIndex(spark, sfDir, AccelIndexes.nationDim)
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    def joined = Tables.load(spark, sfDir, "lineitem")
      .filter(year(col("l_shipdate")) === 1995)
      .join(Tables.load(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.load(spark, sfDir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
    val top5 = joined.groupBy(col("n_name").as("tn"))
      .agg(moneySum(rev).as("ts"))
      .orderBy(col("ts").desc, col("tn")).limit(5)
      .select(col("tn"))
    val agg = joined
      .join(top5, col("n_name") === col("tn"), "left_semi")
      .rollup(col("n_name"), col("s_name"))
      .agg(moneySum(rev).as("total_sum"),
        (grouping(col("n_name")) + grouping(col("s_name")))
          .cast("int").as("lochierarchy"))
    agg
      .withColumn("rank_within_parent", rank().over(
        Window.partitionBy(col("n_name")).orderBy(col("total_sum").desc)))
      .select(col("total_sum"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("s_name"), lit("ALL")).as("supplier"),
        col("lochierarchy"), col("rank_within_parent"))
      .orderBy(col("lochierarchy").desc, col("nation"), col("supplier"))
      .limit(100)
  }

  val qds70Sql: String = {
    val joinFrom =
      """FROM lineitem
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |  WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995""".stripMargin
    s"""WITH top5 AS (
       |  SELECT n_name FROM (
       |    SELECT n_name,
       |      ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS ts
       |  $joinFrom
       |    GROUP BY 1 ORDER BY ts DESC, n_name LIMIT 5)),
       |agg AS (
       |  SELECT n_name, s_name,
       |    CAST(GROUPING(n_name) + GROUPING(s_name) AS INT)
       |      AS lochierarchy,
       |    ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")}
       |      AS total_sum
       |  $joinFrom
       |    AND n_name IN (SELECT n_name FROM top5)
       |  GROUP BY ROLLUP(n_name, s_name))
       |SELECT total_sum, COALESCE(n_name, 'ALL') AS nation,
       |  COALESCE(s_name, 'ALL') AS supplier, lochierarchy,
       |  RANK() OVER (PARTITION BY n_name ORDER BY total_sum DESC)
       |    AS rank_within_parent
       |FROM agg
       |ORDER BY lochierarchy DESC, nation, supplier
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q33 shape (reference tpcds/queries/q33.sql): per-manufacturer
   * revenue across three channels, restricted to manufacturers that make
   * items of one category (an IN subquery over the item dim), the three
   * channel aggregates unioned and re-aggregated. Mapped: manufacturer →
   * p_brand, category gate → brands with any 'PROMO%'-typed part,
   * channels → l_linenumber mod 3. The oracle keeps the literal form —
   * three fact scans, UNION ALL, outer re-aggregate; the engine form is
   * the presence-pivot family (qds38/qds58): ONE pass over the
   * partkey-bucketed fact⋈part pair pivots the channel axis into three
   * conditional sums plus the total. One fact read instead of three;
   * the hash match proves pivot ≡ union + re-aggregate.
   *
   * The brand gate is DELIBERATELY NOT a semi join against the fact:
   * PushDownLeftSemiAntiJoin pushes a dim-keyed LeftSemi below the
   * fact⋈part join onto the part side, turning the dim leg into a join
   * subtree — no longer a scan pair, so NO index serves and the fact
   * re-shuffles at row grain (the qds38 INTERSECT finding in dim-gate
   * form; pinned by this port's audit). Instead the gate is an
   * aggregate at BRAND grain (`max(p_type LIKE …)` per brand) inner-
   * joined ABOVE the pivot — an inner join cannot be pushed through
   * the aggregate, the scan pair stays clean, and the gate costs a
   * 25-row join instead of un-bucketing a 100 TB fact. (Since r16 the
   * hand restructuring is no longer REQUIRED for this plan shape: the
   * natural LeftSemi spelling reaches the same brand-grain gating via
   * HoistSemiGate's grain-aware placement — qds56 proves it — but this
   * port keeps the explicit form as the template's documented twin.)
   */
  def qds33BrandChannels(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(28, 6))
    val chan = pmod(col("l_linenumber"), lit(3))
    val gate = part
      .groupBy(col("p_brand").as("gb"))
      .agg(max(when(col("p_type").startsWith("PROMO"), 1)).as("has_promo"))
      .filter(col("has_promo") === 1)
      .select(col("gb"))
    def chanSum(m: Int) =
      sum(when(chan === m, rev)).cast(DoubleType).as(s"chan${m}_sales")
    li.filter(year(col("l_shipdate")) === 1995)
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(chanSum(0), chanSum(1), chanSum(2),
        sum(rev).cast(DoubleType).as("total_sales"))
      .join(gate, col("brand") === col("gb"))
      .select(col("brand"), col("chan0_sales"), col("chan1_sales"),
        col("chan2_sales"), col("total_sales"))
      .orderBy(col("brand"))
      .limit(100)
  }

  val qds33Sql: String = {
    def chanCte(m: Int) =
      s"""SELECT p_brand, $m AS chan,
         |    SUM(CAST(l_extendedprice * (1.0 - l_discount)
         |      AS DECIMAL(28,6))) AS s
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_linenumber % 3 = $m
         |    AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
         |    AND p_brand IN (SELECT DISTINCT p_brand FROM part
         |                    WHERE p_type LIKE 'PROMO%')
         |  GROUP BY 1, 2""".stripMargin
    s"""SELECT p_brand AS brand,
       |  CAST(SUM(CASE WHEN chan = 0 THEN s END) AS DOUBLE)
       |    AS chan0_sales,
       |  CAST(SUM(CASE WHEN chan = 1 THEN s END) AS DOUBLE)
       |    AS chan1_sales,
       |  CAST(SUM(CASE WHEN chan = 2 THEN s END) AS DOUBLE)
       |    AS chan2_sales,
       |  CAST(SUM(s) AS DOUBLE) AS total_sales
       |FROM (
       |  ${chanCte(0)}
       |UNION ALL
       |  ${chanCte(1)}
       |UNION ALL
       |  ${chanCte(2)})
       |GROUP BY 1
       |ORDER BY brand
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q54 shape (reference tpcds/queries/q54.sql): a customer-
   * journey funnel — customers who bought category items through the
   * catalog/web channels in one quarter (a DISTINCT over a channel
   * union), their TOTAL spend in the following two quarters, counted
   * into fixed-width revenue segments. Mapped: channels → l_linenumber
   * mod 3 ∈ {0,1}, category gate → p_type LIKE 'PROMO%', spend →
   * o_totalprice, segment width 50k (TPC-DS's month_seq scalar
   * subqueries become literal date bounds — the fixture has no date
   * dim). Scale shape: step 1 dedups customers through the
   * orderkey-bucketed pair (lineitem⋈orders zero-shuffle, then one
   * custkey exchange for the DISTINCT); step 2 re-joins those custkeys
   * against the custkey-bucketed orders index — the DISTINCT's output
   * partitioning co-locates with the index buckets, so the second fact
   * pass adds NO exchange; the histogram is a tiny final aggregate.
   */
  def qds54SegmentFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    // step 1 needs the fact on TWO different keys (partkey for the item
    // gate, orderkey for the customer), so ONE fact re-key is intrinsic
    // — the item gate joins FIRST on the partkey buckets so the re-key
    // carries only the GATED slice, not the whole quarter
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow)
    ensureIndex(spark, sfDir, AccelIndexes.ordByCust)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val part = Tables.load(spark, sfDir, "part")
    val myCustomers = li
      .filter(pmod(col("l_linenumber"), lit(3)).isin(0, 1) &&
        col("l_shipdate") >= lit("1995-04-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-07-01").cast("timestamp"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .filter(col("p_type").startsWith("PROMO"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck")).distinct()
    val myRevenue = myCustomers
      .join(Tables.load(spark, sfDir, "orders"),
        col("ck") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1995-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .groupBy(col("ck"))
      .agg(sum(col("o_totalprice").cast(DecimalType(28, 6))).as("revenue"))
    myRevenue
      .select(floor(col("revenue").cast(DoubleType) / 50000)
        .cast("int").as("segment"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).cast(LongType).as("num_customers"))
      .select(col("segment"), col("num_customers"),
        (col("segment") * 50000).as("segment_base"))
      .orderBy(col("segment"))
      .limit(100)
  }

  val qds54Sql: String =
    s"""WITH my_customers AS (
       |  SELECT DISTINCT o_custkey AS ck
       |  FROM lineitem
       |    JOIN orders ON l_orderkey = o_orderkey
       |    JOIN part ON l_partkey = p_partkey
       |  WHERE l_linenumber % 3 IN (0, 1)
       |    AND p_type LIKE 'PROMO%'
       |    AND l_shipdate >= TIMESTAMP '1995-04-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1995-07-01 00:00:00'),
       |my_revenue AS (
       |  SELECT ck, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS revenue
       |  FROM my_customers JOIN orders ON ck = o_custkey
       |  WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       |  GROUP BY 1)
       |SELECT CAST(FLOOR(CAST(revenue AS DOUBLE) / 50000) AS INT)
       |    AS segment,
       |  CAST(COUNT(*) AS BIGINT) AS num_customers,
       |  CAST(FLOOR(CAST(revenue AS DOUBLE) / 50000) AS INT) * 50000
       |    AS segment_base
       |FROM my_revenue
       |GROUP BY 1
       |ORDER BY segment
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q80 shape (reference tpcds/queries/q80.sql): per channel,
   * sales and returns totals with a promo gate, GROUP BY
   * ROLLUP(channel, id) for channel subtotals and a grand total. The
   * literal form (kept by the oracle) pre-aggregates each channel in
   * its own CTE — three fact passes — then rollups over the UNION of
   * aggregates. The engine form unions the ROW-LEVEL channel streams
   * (each with its composite-key no-return gate riding the
   * orderkey-bucketed pair, the qds78 machinery) and runs ONE rollup
   * aggregate over the union: sums are associative, so rollup-over-
   * rows ≡ rollup-over-channel-aggregates — proved by the hash match.
   * Channels are l_linenumber mod 3; returns are the channel's 'R'
   * rows collapsed to unique (orderkey, partkey); the promo gate keeps
   * non-'PROMO%' part types (q80 keeps p_channel_tv = 'N').
   *
   * Scale layout: everything below the rollup rides ONE partkey-bucketed
   * pair — the (orderkey, partkey) return gate co-partitions on the
   * partkey SUBSET key, and the part dim joins BELOW the union (a union
   * claims no output partitioning, so a single dim join above it would
   * re-shuffle the whole row-level union at fact grain; three bucketed
   * dim joins below it cost nothing). The rollup's one exchange is the
   * only shuffle in the plan.
   */
  def qds80ChannelRollup(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val chan = pmod(col("l_linenumber"), lit(3))
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(28, 6))
    def channelRows(m: Int): DataFrame = {
      val sales = li.filter(chan === m && col("l_returnflag") =!= "R" &&
        year(col("l_shipdate")) === 1995)
      val returns = li.filter(chan === m && col("l_returnflag") === "R" &&
          year(col("l_shipdate")) === 1995)
        .groupBy(col("l_orderkey").as("r_ok"), col("l_partkey").as("r_pk"))
        .agg(sum(rev).as("ret_amt"))
      sales.join(returns,
          col("l_orderkey") === col("r_ok") &&
            col("l_partkey") === col("r_pk"), "left_outer")
        .join(Tables.load(spark, sfDir, "part"),
          col("l_partkey") === col("p_partkey"))
        .filter(!col("p_type").startsWith("PROMO"))
        .select(lit(m).as("chan"), col("p_brand"),
          rev.as("sales_amt"),
          coalesce(col("ret_amt"), lit(BigDecimal(0)).cast(
            DecimalType(28, 6))).as("returns_amt"))
    }
    channelRows(0).unionByName(channelRows(1)).unionByName(channelRows(2))
      .rollup(col("chan"), col("p_brand"))
      .agg(sum(col("sales_amt")).cast(DoubleType).as("sales"),
        sum(col("returns_amt")).cast(DoubleType).as("returns"),
        (grouping(col("chan")) + grouping(col("p_brand")))
          .cast("int").as("lochierarchy"))
      .select(coalesce(col("chan").cast("string"), lit("ALL")).as("channel"),
        coalesce(col("p_brand"), lit("ALL")).as("brand"),
        col("sales"), col("returns"), col("lochierarchy"))
      .orderBy(col("lochierarchy").desc, col("channel"), col("brand"))
      .limit(100)
  }

  val qds80Sql: String = {
    def chanCte(m: Int) =
      s"""SELECT $m AS chan, s.l_partkey,
         |    CAST(s.l_extendedprice * (1.0 - s.l_discount)
         |      AS DECIMAL(28,6)) AS sales_amt,
         |    COALESCE(r.ret_amt, CAST(0 AS DECIMAL(28,6))) AS returns_amt
         |  FROM lineitem s LEFT JOIN (
         |    SELECT l_orderkey, l_partkey,
         |      SUM(CAST(l_extendedprice * (1.0 - l_discount)
         |        AS DECIMAL(28,6))) AS ret_amt
         |    FROM lineitem
         |    WHERE l_linenumber % 3 = $m AND l_returnflag = 'R'
         |      AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
         |    GROUP BY 1, 2) r
         |    ON s.l_orderkey = r.l_orderkey AND s.l_partkey = r.l_partkey
         |  WHERE s.l_linenumber % 3 = $m AND s.l_returnflag <> 'R'
         |    AND CAST(strftime(s.l_shipdate, '%Y') AS INT) = 1995"""
        .stripMargin
    s"""WITH u AS (
       |  ${chanCte(0)}
       |UNION ALL
       |  ${chanCte(1)}
       |UNION ALL
       |  ${chanCte(2)}),
       |agg AS (
       |  SELECT chan, p_brand,
       |    CAST(SUM(sales_amt) AS DOUBLE) AS sales,
       |    CAST(SUM(returns_amt) AS DOUBLE) AS returns,
       |    CAST(GROUPING(chan) + GROUPING(p_brand) AS INT)
       |      AS lochierarchy
       |  FROM u JOIN part ON u.l_partkey = p_partkey
       |  WHERE p_type NOT LIKE 'PROMO%'
       |  GROUP BY ROLLUP(chan, p_brand))
       |SELECT COALESCE(CAST(chan AS VARCHAR), 'ALL') AS channel,
       |  COALESCE(p_brand, 'ALL') AS brand, sales, returns, lochierarchy
       |FROM agg
       |ORDER BY lochierarchy DESC, channel, brand
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q62 shape (reference tpcds/queries/q62.sql): order-to-ship
   * day-lag BANDS (≤30, 31–60, 61–90, 91–120, >120) counted per
   * (priority, ship month) — TPC-DS spells each band as a conditional
   * sum over the fact⋈date join. Mapped: lag = datediff(l_shipdate,
   * o_orderdate), dimensions (o_orderpriority, month). The
   * fact⋈orders join rides the orderkey-bucketed pair zero-shuffle;
   * the five bands are conditional counts in ONE aggregate pass — one
   * exchange carrying (priority, month) partials.
   */
  def qds62ShipLagBands(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.ordLag)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val lag = datediff(col("l_shipdate"), col("o_orderdate"))
    def band(name: String, cond: org.apache.spark.sql.Column) =
      count(when(cond, 1)).cast(LongType).as(name)
    li.filter(year(col("l_shipdate")) === 1995)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"),
        month(col("l_shipdate")).as("moy"))
      .agg(band("d30", lag <= 30),
        band("d60", lag > 30 && lag <= 60),
        band("d90", lag > 60 && lag <= 90),
        band("d120", lag > 90 && lag <= 120),
        band("dover", lag > 120))
      .orderBy(col("priority"), col("moy"))
      .limit(100)
  }

  val qds62Sql: String = {
    val lag = "datediff('day', o_orderdate, l_shipdate)"
    s"""SELECT o_orderpriority AS priority,
       |  CAST(strftime(l_shipdate, '%m') AS INT) AS moy,
       |  CAST(COUNT(CASE WHEN $lag <= 30 THEN 1 END) AS BIGINT) AS d30,
       |  CAST(COUNT(CASE WHEN $lag > 30 AND $lag <= 60 THEN 1 END)
       |    AS BIGINT) AS d60,
       |  CAST(COUNT(CASE WHEN $lag > 60 AND $lag <= 90 THEN 1 END)
       |    AS BIGINT) AS d90,
       |  CAST(COUNT(CASE WHEN $lag > 90 AND $lag <= 120 THEN 1 END)
       |    AS BIGINT) AS d120,
       |  CAST(COUNT(CASE WHEN $lag > 120 THEN 1 END) AS BIGINT) AS dover
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
       |GROUP BY 1, 2
       |ORDER BY priority, moy
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q92 shape (reference tpcds/queries/q92.sql): "excess
   * discount" — revenue of fact rows whose discount exceeds 1.3× the
   * per-item average discount over a window, spelled as a CORRELATED
   * scalar subquery. The oracle keeps the correlated form; the engine
   * decorrelates it the way Catalyst would — a per-item aggregate
   * joined back on the item — but placed so the whole query is
   * exchange-free except the single-row gather: the per-partkey
   * average aggregates shuffle-free on the partkey buckets (grouping =
   * bucket key) and the fact⋈aggregate join co-partitions on the SAME
   * buckets, so a correlated-subquery query plans with ONE one-row
   * exchange end-to-end. Averages go through exact decimal sums ÷
   * count on both engines (a distributed double-average would flip
   * near-threshold rows).
   */
  def qds92ExcessDiscount(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    val li = Tables.load(spark, sfDir, "lineitem")
    val discDec = col("l_discount").cast(DecimalType(28, 6))
    val perItem = li.filter(year(col("l_shipdate")) === 1995)
      .groupBy(col("l_partkey").as("pk"))
      .agg((sum(discDec).cast(DoubleType) / count(lit(1))).as("avg_disc"))
    li.filter(year(col("l_shipdate")) === 1995)
      .join(perItem, col("l_partkey") === col("pk"))
      .filter(col("l_discount") > lit(1.3) * col("avg_disc"))
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        moneySum(col("l_extendedprice")).as("excess_revenue"))
  }

  val qds92Sql: String =
    s"""WITH pa AS (
       |  SELECT l_partkey AS pk,
       |    CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)
       |      / COUNT(*) AS avg_disc
       |  FROM lineitem
       |  WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
       |  GROUP BY 1)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  ${sqlMoneySum("l_extendedprice")} AS excess_revenue
       |FROM lineitem JOIN pa ON l_partkey = pk
       |WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
       |  AND l_discount > 1.3 * avg_disc""".stripMargin

  /**
   * TPC-DS q50 shape (reference tpcds/queries/q50.sql): sale-to-return
   * day-lag bands per store — the sales fact joined to the returns
   * fact and the lag between the two dates counted into bands. Mapped:
   * a 1995 non-returned line paired with a RETURNED line of the same
   * order (the fixture has no receipt date; the R-line's ship date
   * plays the return date, and the lag can be negative — an extra
   * "early" band catches it), store → supplier of the SALE line.
   * Both fact roles ride ONE orderkey-bucketed index: the self-join
   * is zero-shuffle off the bucket pair, and the five band counts are
   * conditional aggregates in the single (supplier) exchange.
   */
  def qds50ReturnLagBands(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    val li = Tables.load(spark, sfDir, "lineitem")
    val sales = li.filter(col("l_returnflag") =!= "R" &&
        year(col("l_shipdate")) === 1995)
      .select(col("l_orderkey").as("s_ok"), col("l_suppkey").as("s_sk"),
        col("l_shipdate").as("s_date"))
    val returns = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("r_ok"), col("l_shipdate").as("r_date"))
    val lag = datediff(col("r_date"), col("s_date"))
    def band(name: String, cond: org.apache.spark.sql.Column) =
      count(when(cond, 1)).cast(LongType).as(name)
    sales.join(returns, col("s_ok") === col("r_ok"))
      .groupBy(col("s_sk").as("suppkey"))
      .agg(band("early", lag < 0),
        band("d30", lag >= 0 && lag <= 30),
        band("d60", lag > 30 && lag <= 60),
        band("d90", lag > 60 && lag <= 90),
        band("dover", lag > 90))
      .orderBy(col("suppkey"))
      .limit(100)
  }

  val qds50Sql: String = {
    val lag = "datediff('day', s.l_shipdate, r.l_shipdate)"
    s"""SELECT s.l_suppkey AS suppkey,
       |  CAST(COUNT(CASE WHEN $lag < 0 THEN 1 END) AS BIGINT) AS early,
       |  CAST(COUNT(CASE WHEN $lag >= 0 AND $lag <= 30 THEN 1 END)
       |    AS BIGINT) AS d30,
       |  CAST(COUNT(CASE WHEN $lag > 30 AND $lag <= 60 THEN 1 END)
       |    AS BIGINT) AS d60,
       |  CAST(COUNT(CASE WHEN $lag > 60 AND $lag <= 90 THEN 1 END)
       |    AS BIGINT) AS d90,
       |  CAST(COUNT(CASE WHEN $lag > 90 THEN 1 END) AS BIGINT) AS dover
       |FROM lineitem s JOIN lineitem r ON s.l_orderkey = r.l_orderkey
       |WHERE s.l_returnflag <> 'R' AND r.l_returnflag = 'R'
       |  AND CAST(strftime(s.l_shipdate, '%Y') AS INT) = 1995
       |GROUP BY 1
       |ORDER BY suppkey
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q5 shape (reference tpcds/queries/q5.sql): profit-and-loss
   * per channel — sales rows and RETURN rows unioned as separate
   * streams (returns carry the amounts in the loss column), rolled up
   * by (channel, dimension) with channel subtotals and a grand total.
   * Mapped: channels → l_linenumber mod 3, dimension →
   * o_orderpriority, return stream → 'R' rows. The oracle keeps the
   * literal per-(channel, priority) pre-aggregates of each stream
   * re-aggregated under the rollup; the engine unions the ROW-LEVEL
   * streams and runs ONE rollup (the qds80 lesson: the orders dim
   * joins BELOW the union on the orderkey buckets, zero-shuffle, so
   * the rollup's exchange is the plan's only shuffle).
   */
  def qds5ChannelPnl(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3Prio)
    val li = Tables.load(spark, sfDir, "lineitem")
    val chan = pmod(col("l_linenumber"), lit(3))
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(28, 6))
    val zero = lit(BigDecimal(0)).cast(DecimalType(28, 6))
    def stream(isReturn: Boolean): DataFrame = {
      val rows = li.filter(
        (if (isReturn) col("l_returnflag") === "R"
         else col("l_returnflag") =!= "R") &&
          year(col("l_shipdate")) === 1995)
        .join(Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
      if (isReturn)
        rows.select(chan.as("chan"), col("o_orderpriority"),
          zero.as("sales_amt"), rev.as("loss_amt"))
      else
        rows.select(chan.as("chan"), col("o_orderpriority"),
          rev.as("sales_amt"), zero.as("loss_amt"))
    }
    stream(isReturn = false).unionByName(stream(isReturn = true))
      .rollup(col("chan"), col("o_orderpriority"))
      .agg(sum(col("sales_amt")).cast(DoubleType).as("sales"),
        sum(col("loss_amt")).cast(DoubleType).as("losses"),
        (sum(col("sales_amt")) - sum(col("loss_amt")))
          .cast(DoubleType).as("profit"),
        (grouping(col("chan")) + grouping(col("o_orderpriority")))
          .cast("int").as("lochierarchy"))
      .select(coalesce(col("chan").cast("string"), lit("ALL")).as("channel"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("sales"), col("losses"), col("profit"), col("lochierarchy"))
      .orderBy(col("lochierarchy").desc, col("channel"), col("priority"))
      .limit(100)
  }

  val qds5Sql: String = {
    def streamCte(ret: Boolean) = {
      val flag = if (ret) "=" else "<>"
      val (s, l) =
        if (ret) ("CAST(0 AS DECIMAL(28,6))",
          "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))")
        else ("CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))",
          "CAST(0 AS DECIMAL(28,6))")
      s"""SELECT l_linenumber % 3 AS chan, o_orderpriority,
         |    SUM($s) AS sales_amt, SUM($l) AS loss_amt
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_returnflag $flag 'R'
         |    AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
         |  GROUP BY 1, 2""".stripMargin
    }
    s"""WITH u AS (
       |  ${streamCte(false)}
       |UNION ALL
       |  ${streamCte(true)}),
       |agg AS (
       |  SELECT chan, o_orderpriority,
       |    CAST(SUM(sales_amt) AS DOUBLE) AS sales,
       |    CAST(SUM(loss_amt) AS DOUBLE) AS losses,
       |    CAST(SUM(sales_amt) - SUM(loss_amt) AS DOUBLE) AS profit,
       |    CAST(GROUPING(chan) + GROUPING(o_orderpriority) AS INT)
       |      AS lochierarchy
       |  FROM u
       |  GROUP BY ROLLUP(chan, o_orderpriority))
       |SELECT COALESCE(CAST(chan AS VARCHAR), 'ALL') AS channel,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  sales, losses, profit, lochierarchy
       |FROM agg
       |ORDER BY lochierarchy DESC, channel, priority
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q56 shape (reference tpcds/queries/q56.sql — the q33
   * template with an item-attribute gate): per-brand quantity across
   * three channels, restricted by an IN-subquery over the part dim
   * (brands that make any size-1 part). UNLIKE qds33 — which
   * restructured the gate by hand after finding #10 — this port keeps
   * the NATURAL LeftSemi spelling on purpose: [[HoistSemiGate]] must
   * un-push the gate from the part leg and re-enable the bucketed
   * fact⋈part pair, so this oracle row is the end-to-end proof the
   * mechanism serves real queries (the audit pins the semi ABOVE a
   * zero-shuffle pair). Since r16 the rule's GRAIN-AWARE second stage
   * also places the hoisted gate above the brand aggregate (the gate
   * key is a grouping pass-through, so the semi drops whole groups and
   * commutes) — the one exchange carries brand-grain PARTIAL rows, and
   * the natural spelling plans exactly like qds33's hand-tuned form.
   * The oracle keeps the literal three-scan union + re-aggregate.
   */
  def qds56NaturalGate(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    val qty = col("l_quantity").cast(DecimalType(28, 6))
    val chan = pmod(col("l_linenumber"), lit(3))
    val brands = part.filter(col("p_size") === 1)
      .select(col("p_brand").as("gb")).distinct()
    def chanSum(m: Int) =
      sum(when(chan === m, qty)).cast(DoubleType).as(s"chan${m}_qty")
    li.filter(year(col("l_shipdate")) === 1995)
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(brands, col("p_brand") === col("gb"), "left_semi")
      .groupBy(col("p_brand").as("brand"))
      .agg(chanSum(0), chanSum(1), chanSum(2),
        sum(qty).cast(DoubleType).as("total_qty"))
      .orderBy(col("brand"))
      .limit(100)
  }

  val qds56Sql: String = {
    def chanCte(m: Int) =
      s"""SELECT p_brand, $m AS chan,
         |    SUM(CAST(l_quantity AS DECIMAL(28,6))) AS s
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_linenumber % 3 = $m
         |    AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
         |    AND p_brand IN (SELECT DISTINCT p_brand FROM part
         |                    WHERE p_size = 1)
         |  GROUP BY 1, 2""".stripMargin
    s"""SELECT p_brand AS brand,
       |  CAST(SUM(CASE WHEN chan = 0 THEN s END) AS DOUBLE) AS chan0_qty,
       |  CAST(SUM(CASE WHEN chan = 1 THEN s END) AS DOUBLE) AS chan1_qty,
       |  CAST(SUM(CASE WHEN chan = 2 THEN s END) AS DOUBLE) AS chan2_qty,
       |  CAST(SUM(s) AS DOUBLE) AS total_qty
       |FROM (
       |  ${chanCte(0)}
       |UNION ALL
       |  ${chanCte(1)}
       |UNION ALL
       |  ${chanCte(2)})
       |GROUP BY 1
       |ORDER BY brand
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q66 shape (reference tpcds/queries/q66.sql): the WIDEST
   * pivot in the corpus — per warehouse, twelve months × two metrics,
   * the two ship carriers computed as separate UNION ALL legs and
   * re-aggregated. Mapped: warehouse → supplier, carriers → return
   * flags 'N' / 'A', metrics → extended price (carrier N) and
   * discounted revenue (carrier A). The oracle keeps the literal
   * two-leg union + re-aggregate; the engine computes all 24
   * conditional sums in ONE pass over the suppkey buckets — grouping =
   * bucket key, so the whole 24-column pivot plans with ZERO
   * exchanges (the qds2/qds59 machinery at maximum width: the point is
   * that conditional-sum fusion keeps paying as the pivot widens —
   * the literal form's cost grows a fact pass per leg, the fused
   * form's only grows the aggregate row).
   */
  def qds66WideMetricPivot(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liSuppChan)
    val li = Tables.load(spark, sfDir, "lineitem")
    val moy = month(col("l_shipdate"))
    val price = col("l_extendedprice").cast(DecimalType(28, 6))
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(28, 6))
    val aggs = (1 to 12).flatMap { m =>
      Seq(
        sum(when(col("l_returnflag") === "N" && moy === m, price))
          .cast(DoubleType).as(f"m$m%02d_price"),
        sum(when(col("l_returnflag") === "A" && moy === m, rev))
          .cast(DoubleType).as(f"m$m%02d_rev"))
    }
    li.filter(year(col("l_shipdate")) === 1995 &&
        col("l_returnflag").isin("N", "A"))
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("suppkey"))
      .limit(100)
  }

  val qds66Sql: String = {
    def mn(m: Int) = f"m$m%02d"
    def legCte(flag: String, metric: String, suffix: String) = {
      val monthExpr = "CAST(strftime(l_shipdate, '%m') AS INT)"
      // UNION ALL matches by POSITION: both legs must interleave the 24
      // columns identically, with the off-metric slots NULL
      val cols = (1 to 12).flatMap { m =>
        val sumExpr =
          s"""SUM(CASE WHEN $monthExpr = $m
             |      THEN CAST($metric AS DECIMAL(28,6)) END)""".stripMargin
        val nul = "CAST(NULL AS DECIMAL(28,6))"
        if (suffix == "price")
          Seq(s"$sumExpr AS ${mn(m)}_price", s"$nul AS ${mn(m)}_rev")
        else
          Seq(s"$nul AS ${mn(m)}_price", s"$sumExpr AS ${mn(m)}_rev")
      }.mkString(",\n    ")
      s"""SELECT l_suppkey AS suppkey,
         |    $cols
         |  FROM lineitem
         |  WHERE l_returnflag = '$flag'
         |    AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
         |  GROUP BY 1""".stripMargin
    }
    val outer = (1 to 12).flatMap(m => Seq(
      s"CAST(SUM(${mn(m)}_price) AS DOUBLE) AS ${mn(m)}_price",
      s"CAST(SUM(${mn(m)}_rev) AS DOUBLE) AS ${mn(m)}_rev"))
      .mkString(",\n  ")
    s"""SELECT suppkey,
       |  $outer
       |FROM (
       |  ${legCte("N", "l_extendedprice", "price")}
       |UNION ALL
       |  ${legCte("A", "l_extendedprice * (1.0 - l_discount)", "rev")})
       |GROUP BY 1
       |ORDER BY suppkey
       |LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q40 shape (reference tpcds/queries/q40.sql): net sales
   * (each sales row minus its matching return amount, COALESCE the
   * miss to zero) split BEFORE/AFTER a pivot date, per (warehouse,
   * item). Mapped: warehouse → supplier, item grain → brand, returns →
   * the 'R' rows collapsed to unique (orderkey, partkey) — a sales row
   * nets against its (order, part) return total, identically on both
   * engines. The PAIR-COHERENT ranker (finding #12b, closed r16) puts
   * BOTH fact roles on the orderkey buckets: the returns leg is covered
   * by two differently-bucketed layouts, and the coherence vote from
   * the gate join — whose sales side can only ride orderkey — overrides
   * the partkey layout's higher raw demand, so the collapsed returns
   * co-locate with the sales side and the composite-key gate adds NO
   * exchange at all. The (suppkey, brand) grain then needs the part dim
   * at fact grain, so one partkey re-key of the netted stream is
   * intrinsic (the suppkey axis is orthogonal to every bucket key that
   * covers the gate — finding #12a pins why the partkey layout must NOT
   * grow a suppkey column to absorb it).
   */
  def qds40NetSplit(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(28, 6))
    val pivot = lit("1995-07-01").cast("timestamp")
    val returns = li.filter(col("l_returnflag") === "R" &&
        year(col("l_shipdate")) === 1995)
      .groupBy(col("l_orderkey").as("r_ok"), col("l_partkey").as("r_pk"))
      .agg(sum(rev).as("ret"))
    val net = (rev - coalesce(col("ret"),
      lit(BigDecimal(0)).cast(DecimalType(28, 6))))
    li.filter(col("l_returnflag") =!= "R" &&
        year(col("l_shipdate")) === 1995)
      .join(returns, col("l_orderkey") === col("r_ok") &&
        col("l_partkey") === col("r_pk"), "left_outer")
      .join(Tables.load(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey").as("suppkey"), col("p_brand").as("brand"))
      .agg(
        sum(when(col("l_shipdate") < pivot, net)).cast(DoubleType)
          .as("sales_before"),
        sum(when(col("l_shipdate") >= pivot, net)).cast(DoubleType)
          .as("sales_after"))
      .orderBy(col("suppkey"), col("brand"))
      .limit(100)
  }

  val qds40Sql: String =
    s"""WITH r AS (
       |  SELECT l_orderkey AS r_ok, l_partkey AS r_pk,
       |    SUM(CAST(l_extendedprice * (1.0 - l_discount)
       |      AS DECIMAL(28,6))) AS ret
       |  FROM lineitem
       |  WHERE l_returnflag = 'R'
       |    AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
       |  GROUP BY 1, 2)
       |SELECT s.l_suppkey AS suppkey, p.p_brand AS brand,
       |  CAST(SUM(CASE WHEN s.l_shipdate < TIMESTAMP '1995-07-01 00:00:00'
       |    THEN CAST(s.l_extendedprice * (1.0 - s.l_discount)
       |           AS DECIMAL(28,6))
       |         - COALESCE(r.ret, CAST(0 AS DECIMAL(28,6))) END)
       |    AS DOUBLE) AS sales_before,
       |  CAST(SUM(CASE WHEN s.l_shipdate >= TIMESTAMP '1995-07-01 00:00:00'
       |    THEN CAST(s.l_extendedprice * (1.0 - s.l_discount)
       |           AS DECIMAL(28,6))
       |         - COALESCE(r.ret, CAST(0 AS DECIMAL(28,6))) END)
       |    AS DOUBLE) AS sales_after
       |FROM lineitem s
       |  LEFT JOIN r ON s.l_orderkey = r.r_ok AND s.l_partkey = r.r_pk
       |  JOIN part p ON s.l_partkey = p.p_partkey
       |WHERE s.l_returnflag <> 'R'
       |  AND CAST(strftime(s.l_shipdate, '%Y') AS INT) = 1995
       |GROUP BY 1, 2
       |ORDER BY suppkey, brand
       |LIMIT 100""".stripMargin

  /**
   * TPC-DS q61 shape (reference tpcds/queries/q61.sql): promotional
   * revenue as a percentage of total revenue — the literal form runs
   * TWO full fact⋈dims pipelines (one promo-gated, one not) and cross
   * joins the two scalar rows. Mapped: promo gate → p_type LIKE
   * 'PROMO%', window → 1995. The engine form reads the fact ONCE: the
   * promo side is a conditional sum over the same partkey-bucketed
   * join, so the plan is one zero-shuffle pair + the single-row
   * gather. The hash match proves conditional-sum ≡ gated-pipeline —
   * the qds88/qds58 lesson applied to the scalar-ratio family.
   */
  def qds61PromoRatio(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(28, 6))
    li.filter(year(col("l_shipdate")) === 1995)
      .join(Tables.load(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), rev))
          .cast(DoubleType).as("promotions"),
        sum(rev).cast(DoubleType).as("total"))
      .select(col("promotions"), col("total"),
        (col("promotions") / col("total") * 100).as("promo_pct"))
  }

  val qds61Sql: String = {
    val rev = "l_extendedprice * (1.0 - l_discount)"
    s"""WITH promo AS (
       |  SELECT ${sqlMoneySum(rev)} AS promotions
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
       |    AND p_type LIKE 'PROMO%'),
       |tot AS (
       |  SELECT ${sqlMoneySum(rev)} AS total
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995)
       |SELECT promotions, total, promotions / total * 100 AS promo_pct
       |FROM promo, tot""".stripMargin
  }

  /**
   * TPC-DS q37/q82 shape (reference tpcds/queries/q37.sql, q82.sql —
   * the same template over the catalog/store channel): items in a
   * filtered attribute band whose INVENTORY sits in a date window and
   * quantity band, gated to items that actually SOLD in the channel —
   * an IN-subquery over the sales fact keyed on the ITEM. Mapped:
   * item → part (brand IN-list), inventory → lineitem slices in a
   * 1995 ship window with a quantity band, sold gate → the 'N'
   * returnflag slice. The template the r15 HoistSemiGate did NOT
   * author: here the pushed-down semi's key (p_partkey) IS the dim
   * leg's bucket key, so the rule must KEEP it in place (the
   * kept-in-place decision) and the gate itself serves as a
   * zero-shuffle bucketed semi via subset-key co-partitioning — the
   * whole probe runs on partkey buckets with ONE exchange (the final
   * brand/type aggregate). At 100 TB: no fact-grain re-key anywhere.
   */
  def qds37InventoryProbe(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liInv)
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    val inv = li.filter(
      col("l_shipdate") >= lit("1995-02-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-06-01").cast("timestamp") &&
        col("l_quantity").between(10, 45))
    val sold = li.filter(col("l_returnflag") === "N")
      .select(col("l_partkey").as("sold_pk"))
    inv.join(part.filter(col("p_brand").isin(
        "Brand#11", "Brand#22", "Brand#33", "Brand#44")),
        col("l_partkey") === col("p_partkey"))
      .join(sold, col("p_partkey") === col("sold_pk"), "left_semi")
      .groupBy(col("p_brand").as("brand"), col("p_type").as("ptype"))
      .agg(count(lit(1)).cast(LongType).as("n_slices"),
        moneySum(col("l_quantity")).as("onhand"))
      .orderBy(col("brand"), col("ptype"))
      .limit(100)
  }

  val qds37Sql: String =
    s"""SELECT p_brand AS brand, p_type AS ptype,
       |  CAST(COUNT(*) AS BIGINT) AS n_slices,
       |  ${sqlMoneySum("l_quantity")} AS onhand
       |FROM lineitem inv JOIN part ON inv.l_partkey = p_partkey
       |WHERE inv.l_shipdate >= TIMESTAMP '1995-02-01 00:00:00'
       |  AND inv.l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
       |  AND inv.l_quantity BETWEEN 10 AND 45
       |  AND p_brand IN ('Brand#11','Brand#22','Brand#33','Brand#44')
       |  AND p_partkey IN (SELECT l_partkey FROM lineitem
       |                    WHERE l_returnflag = 'N')
       |GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 100""".stripMargin

  /**
   * TPC-DS q45 shape (reference tpcds/queries/q45.sql): per-geography
   * sales where the row qualifies through EITHER a plain attribute
   * IN-list OR an IN-subquery over the item dim — the OR-of-gates
   * disjunction no other shape covers (a lone IN-subquery lowers to a
   * LeftSemi; under OR it must become an EXISTENCE join + disjunctive
   * filter instead). Mapped: zip list → c_mktsegment IN-list, the
   * item_id gate → brands of a literal partkey list (kept as a
   * subquery, like q45 does, so it cannot constant-fold), geography
   * grain → (c_nationkey, c_mktsegment). The engine form is spelled in
   * SQL deliberately: the DataFrame API cannot express an IN-subquery,
   * and the point of this port is the LOWERING — Catalyst rewrites the
   * disjunctive IN into an ExistenceJoin + `seg IN (...) OR exists#n`
   * filter, a shape ExistsIndexRule must pass through gracefully (the
   * outer is a 4-table join, not a scan; the probe keys on a column
   * nothing is bucketed on). At 100 TB the existence gate is a ~25-row
   * broadcast at runtime; under the audit's no-broadcast SMJ the
   * stream pays one gate exchange — the fact⋈orders leg still rides
   * its orderkey pair zero-shuffle, and the two dim re-keys are the
   * intrinsic cost of a three-key snowflake.
   */
  def qds45GeoOrItemGate(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liWide)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.custSeg)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("qds45_li")
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("qds45_ord")
    Tables.load(spark, sfDir, "customer").createOrReplaceTempView("qds45_cust")
    Tables.load(spark, sfDir, "part").createOrReplaceTempView("qds45_part")
    spark.sql(
      s"""SELECT c_nationkey AS nation, c_mktsegment AS segment,
         |  ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS sales
         |FROM qds45_li
         |  JOIN qds45_ord ON l_orderkey = o_orderkey
         |  JOIN qds45_cust ON o_custkey = c_custkey
         |  JOIN qds45_part ON l_partkey = p_partkey
         |WHERE (c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
         |       OR p_brand IN (SELECT p_brand FROM qds45_part
         |                      WHERE p_partkey IN (2,3,5,7,11,13,17,19,23,29)))
         |  AND o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
         |GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 100""".stripMargin)
  }

  val qds45Sql: String =
    s"""WITH gate AS (
       |  SELECT DISTINCT p_brand FROM part
       |  WHERE p_partkey IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29))
       |SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |  ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS sales
       |FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN part ON l_partkey = p_partkey
       |WHERE (c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
       |       OR p_brand IN (SELECT p_brand FROM gate))
       |  AND o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
       |GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 100""".stripMargin

  /**
   * TPC-DS q11 shape (reference tpcds/queries/q11.sql — the q4/q74
   * family at two channels): a per-(customer, year) totals CTE over a
   * CHANNEL UNION, self-joined four ways (2 channels × 2 years), the
   * web growth ratio compared against the store growth ratio, output
   * at the second-year customer's flag attribute. Mapped: channels →
   * returnflag N ('s') / R ('w'), years 1995/1996, preferred-flag →
   * c_mktsegment (+ c_name for a total order). UNLIKE qds4 — whose
   * legs are pre-filtered single-grain aggregates — each leg here
   * filters the SHARED (cust, year, channel)-grain aggregate, so every
   * leg's exchange keys on the full 3-column grouping while the
   * self-joins demand only `cust`: AlignAggExchange's SMJ branch must
   * re-key all four aggregate exchanges onto the customer subset
   * (customer-grain partial rows), and the whole 4-way self-join plus
   * the custkey-bucketed name lookup then ride those exchanges with no
   * further shuffle. The oracle keeps q11's literal two-leg UNION ALL.
   */
  def qds11YoyChannelUnion(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.custFull)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    def yearTotal: DataFrame =
      li.filter(col("l_returnflag").isin("N", "R"))
        .join(ord.filter(
          col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("dyear",
          when(col("o_orderdate") < lit("1996-01-01").cast("timestamp"),
            lit(1995)).otherwise(lit(1996)))
        .groupBy(col("o_custkey").as("cust"), col("dyear"),
          col("l_returnflag").as("chan"))
        .agg(moneySum(rev).as("total"))
    def leg(tag: String, year: Int, chan: String): DataFrame =
      yearTotal.filter(col("chan") === chan && col("dyear") === year)
        .select(col("cust").as(s"${tag}_cust"),
          col("total").as(s"${tag}_total"))
    val sf = leg("sf", 1995, "N"); val ss = leg("ss", 1996, "N")
    val wf = leg("wf", 1995, "R"); val ws = leg("ws", 1996, "R")
    ss.join(sf, col("ss_cust") === col("sf_cust"))
      .join(wf, col("sf_cust") === col("wf_cust"))
      .join(ws, col("sf_cust") === col("ws_cust"))
      .filter(col("sf_total") > 0 && col("wf_total") > 0)
      .filter(col("ws_total") / col("wf_total") >
        col("ss_total") / col("sf_total"))
      .join(Tables.load(spark, sfDir, "customer"),
        col("ss_cust") === col("c_custkey"))
      .select(col("c_mktsegment").as("flag"), col("c_name").as("name"))
      .orderBy(col("flag"), col("name"))
      .limit(100)
  }

  val qds11Sql: String = {
    def legCte(flag: String, tag: String) =
      s"""SELECT o_custkey AS cust,
         |    CAST(strftime(o_orderdate, '%Y') AS INT) AS dyear,
         |    '$tag' AS sale_type,
         |    SUM(CAST(l_extendedprice * (1.0 - l_discount)
         |      AS DECIMAL(28,6))) AS total
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_returnflag = '$flag'
         |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  GROUP BY 1, 2""".stripMargin
    s"""WITH year_total AS (
       |  ${legCte("N", "s")}
       |UNION ALL
       |  ${legCte("R", "w")})
       |SELECT c_mktsegment AS flag, c_name AS name
       |FROM year_total sf, year_total ssy, year_total wf, year_total wsy,
       |     customer
       |WHERE ssy.cust = sf.cust AND sf.cust = wf.cust AND sf.cust = wsy.cust
       |  AND sf.sale_type = 's' AND ssy.sale_type = 's'
       |  AND wf.sale_type = 'w' AND wsy.sale_type = 'w'
       |  AND sf.dyear = 1995 AND ssy.dyear = 1996
       |  AND wf.dyear = 1995 AND wsy.dyear = 1996
       |  AND sf.total > 0 AND wf.total > 0
       |  AND wsy.total / wf.total > ssy.total / sf.total
       |  AND c_custkey = ssy.cust
       |ORDER BY flag, name LIMIT 100""".stripMargin
  }

  /**
   * TPC-DS q29/q25 shape (reference tpcds/queries/q29.sql, q25.sql —
   * the same template with different aggregates): THREE fact roles in
   * one query — items sold in a month, returned in the following
   * quarter, and re-sold through the catalog within two years — joined
   * through the sale→return ticket link and the item key, then rolled
   * up per item attribute. Mapped: ticket → l_orderkey (returns
   * collapse to order grain first, the qds93 netting convention),
   * item → l_partkey, the catalog re-sales → the 'A' returnflag slice,
   * item attribute → p_brand. Scale shape: the returns collapse and
   * the sales probe ride the ORDERKEY buckets zero-shuffle; the
   * re-sales collapse rides the PARTKEY buckets zero-shuffle
   * (AggIndexRule on the partchan layout); the collapsed sales stream
   * re-keys ONCE to part grain and meets BOTH the re-sales aggregate
   * and the part dim in place — a three-fact-role query with TWO
   * exchanges, both carrying aggregated rows.
   */
  def qds29RepeatChannelQty(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val qty = col("l_quantity").cast(DecimalType(28, 6))
    val rOrd = li.filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .groupBy(col("l_orderkey").as("r_ok"))
      .agg(sum(qty).as("ret_qty"))
    val sr = li.filter(col("l_returnflag") === "N" &&
        col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
      .join(rOrd, col("l_orderkey") === col("r_ok"))
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(qty).as("sold_qty"), sum(col("ret_qty")).as("ret_qty"))
    val cs = li.filter(col("l_returnflag") === "A" &&
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_partkey").as("cpk"))
      .agg(sum(qty).as("re_qty"))
    sr.join(cs, col("pk") === col("cpk"))
      .join(Tables.load(spark, sfDir, "part"),
        col("pk") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(moneySum(col("sold_qty")).as("store_sales_qty"),
        moneySum(col("ret_qty")).as("store_returns_qty"),
        moneySum(col("re_qty")).as("catalog_sales_qty"))
      .orderBy(col("brand"))
      .limit(100)
  }

  val qds29Sql: String =
    s"""WITH r_ord AS (
       |  SELECT l_orderkey AS r_ok,
       |    SUM(CAST(l_quantity AS DECIMAL(28,6))) AS ret_qty
       |  FROM lineitem
       |  WHERE l_returnflag = 'R'
       |    AND l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
       |  GROUP BY 1),
       |sr AS (
       |  SELECT s.l_partkey AS pk,
       |    SUM(CAST(s.l_quantity AS DECIMAL(28,6))) AS sold_qty,
       |    SUM(ret_qty) AS ret_qty
       |  FROM lineitem s JOIN r_ord ON s.l_orderkey = r_ok
       |  WHERE s.l_returnflag = 'N'
       |    AND s.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
       |    AND s.l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
       |  GROUP BY 1),
       |cs AS (
       |  SELECT l_partkey AS cpk,
       |    SUM(CAST(l_quantity AS DECIMAL(28,6))) AS re_qty
       |  FROM lineitem
       |  WHERE l_returnflag = 'A'
       |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY 1)
       |SELECT p_brand AS brand,
       |  ${sqlMoneySum("sold_qty")} AS store_sales_qty,
       |  ${sqlMoneySum("ret_qty")} AS store_returns_qty,
       |  ${sqlMoneySum("re_qty")} AS catalog_sales_qty
       |FROM sr JOIN cs ON pk = cpk JOIN part ON pk = p_partkey
       |GROUP BY 1 ORDER BY 1 LIMIT 100""".stripMargin

  /**
   * TPC-DS q97 shape (reference tpcds/queries/q97.sql): channel
   * overlap — the DISTINCT (customer, item) pairs of two channels in a
   * year, FULL-OUTER-joined on the pair, counted into store-only /
   * catalog-only / both buckets. Mapped: pair → (l_partkey,
   * l_suppkey), channels → quantity bands (≤25 / >25 — the fixture's
   * one fact table models both channels). Scale shape: BOTH distinct
   * collapses run shuffle-free on the partkey buckets (bucket key ⊆
   * the pair), and the FULL OUTER join co-partitions on the SAME
   * subset claim — at 100 TB the overlap of two billion-pair channels
   * computes with ZERO pair-grain exchanges; the only exchange is the
   * single-row final count gather.
   */
  def qds97ChannelOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liInv)
    val li = Tables.load(spark, sfDir, "lineitem")
    def pairs(band: org.apache.spark.sql.Column, pkName: String,
        skName: String): DataFrame =
      li.filter(band &&
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("l_partkey").as(pkName), col("l_suppkey").as(skName))
        .distinct()
    val store = pairs(col("l_quantity") <= 25, "s_pk", "s_sk")
    val cat = pairs(col("l_quantity") > 25, "c_pk", "c_sk")
    store.join(cat,
        col("s_pk") === col("c_pk") && col("s_sk") === col("c_sk"),
        "full_outer")
      .agg(
        sum(when(col("s_pk").isNotNull && col("c_pk").isNull, 1)
          .otherwise(0)).cast(LongType).as("store_only"),
        sum(when(col("s_pk").isNull && col("c_pk").isNotNull, 1)
          .otherwise(0)).cast(LongType).as("catalog_only"),
        sum(when(col("s_pk").isNotNull && col("c_pk").isNotNull, 1)
          .otherwise(0)).cast(LongType).as("store_and_catalog"))
  }

  val qds97Sql: String =
    s"""WITH store AS (
       |  SELECT l_partkey AS pk, l_suppkey AS sk FROM lineitem
       |  WHERE l_quantity <= 25
       |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
       |  GROUP BY 1, 2),
       |cat AS (
       |  SELECT l_partkey AS pk, l_suppkey AS sk FROM lineitem
       |  WHERE l_quantity > 25
       |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT
       |  CAST(SUM(CASE WHEN store.pk IS NOT NULL AND cat.pk IS NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
       |  CAST(SUM(CASE WHEN store.pk IS NULL AND cat.pk IS NOT NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
       |  CAST(SUM(CASE WHEN store.pk IS NOT NULL AND cat.pk IS NOT NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
       |FROM store FULL OUTER JOIN cat
       |  ON store.pk = cat.pk AND store.sk = cat.sk""".stripMargin

  /**
   * TPC-DS q48/q85 shape (reference tpcds/queries/q48.sql, q85.sql):
   * a single fact aggregate gated by an OR of AND-clusters, each
   * cluster banding columns from BOTH join sides (demographic × price
   * bands in the original). Mapped: priority × quantity × total-price
   * bands over lineitem⋈orders. The machinery stressed: the
   * disjunction references both sides, so Catalyst folds it into the
   * JOIN CONDITION — the rewrite must treat it as a RESIDUAL (bucket
   * co-location needs only the equi conjunct) and still serve the
   * zero-shuffle orderkey pair with the OR evaluated on the joined
   * stream. One single-row gather exchange end-to-end; at 100 TB the
   * bands never cost a shuffle.
   */
  def qds48BandOr(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.ordLag)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    def cluster(prio: String, qLo: Int, qHi: Int, tLo: Int, tHi: Int) =
      col("o_orderpriority") === prio &&
        col("l_quantity").between(qLo, qHi) &&
        col("o_totalprice").between(tLo, tHi)
    li.filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(cluster("1-URGENT", 1, 15, 50000, 150000) ||
        cluster("2-HIGH", 16, 35, 100000, 250000) ||
        cluster("3-MEDIUM", 36, 50, 150000, 400000))
      .agg(moneySum(col("l_quantity")).as("qty_sum"),
        count(lit(1)).cast(LongType).as("n_rows"))
  }

  val qds48Sql: String =
    s"""SELECT ${sqlMoneySum("l_quantity")} AS qty_sum,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE ((o_orderpriority = '1-URGENT'
       |        AND l_quantity BETWEEN 1 AND 15
       |        AND o_totalprice BETWEEN 50000 AND 150000)
       |    OR (o_orderpriority = '2-HIGH'
       |        AND l_quantity BETWEEN 16 AND 35
       |        AND o_totalprice BETWEEN 100000 AND 250000)
       |    OR (o_orderpriority = '3-MEDIUM'
       |        AND l_quantity BETWEEN 36 AND 50
       |        AND o_totalprice BETWEEN 150000 AND 400000))
       |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'""".stripMargin

  /**
   * TPC-DS q46/q68 shape (reference tpcds/queries/q46.sql, q68.sql —
   * the same template at two filters): ORDER-grain output rows —
   * customer name, order id, per-order totals — for orders whose
   * line-level geography differs from the customer's (the bought-city
   * ≠ home-city inequality ACROSS two dims). Mapped: cities →
   * nationkeys (supplier's vs customer's). The join-order lesson at
   * 100 TB: orders meets customer FIRST on the CUSTKEY-bucketed pair
   * (ordByCust ⋈ custDim zero-shuffle), then the ORDERS-grain stream
   * re-keys to orderkey to meet the lineitem fact in place — the
   * cheap side moves, never the fact. The supplier axis costs the one
   * fact-grain re-key (intrinsic under this corpus: no suppkey layout
   * carries l_quantity, deliberately — finding #12a forbids widening
   * across bucket keys), and the supplier's own side serves bucketed
   * in place. Four exchanges total, only one at fact grain.
   */
  def qds46CrossNationOrders(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.ordByCust)
    ensureIndex(spark, sfDir, AccelIndexes.custDim)
    ensureIndex(spark, sfDir, AccelIndexes.suppNat)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(year(col("o_orderdate")) === 1995)
    val cust = Tables.load(spark, sfDir, "customer")
    val supp = Tables.load(spark, sfDir, "supplier")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .groupBy(col("c_name").as("cust_name"),
        col("o_orderkey").as("order_id"))
      .agg(moneySum(col("l_quantity")).as("qty"),
        moneySum(rev).as("spend"))
      .orderBy(col("cust_name"), col("order_id"))
      .limit(100)
  }

  val qds46Sql: String =
    s"""SELECT c_name AS cust_name, o_orderkey AS order_id,
       |  ${sqlMoneySum("l_quantity")} AS qty,
       |  ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS spend
       |FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |WHERE s_nationkey <> c_nationkey
       |  AND CAST(strftime(o_orderdate, '%Y') AS INT) = 1995
       |GROUP BY 1, 2
       |ORDER BY cust_name, order_id LIMIT 100""".stripMargin

  /**
   * TPC-DS q16 shape (reference tpcds/queries/q16.sql): order-grain
   * COUNT DISTINCT + money totals for ship-window orders passing a
   * dim-attribute chain (address state + call-center county in the
   * original), an EXISTS (same order shipped from another warehouse)
   * and a NOT EXISTS (never returned). Mapped: warehouses → suppliers,
   * the dim chain → customer segment + nation region through orders.
   * The q94 skeleton with the aggregate CONSUMER reached through two
   * more dims: every fact leg — the probe, both exists legs — and the
   * orders join ride ONE orderkey bucket layout (the exists legs are
   * served by ExistsIndexRule on the same buckets), so the
   * COUNT(DISTINCT l_orderkey) collapses shuffle-free; only the
   * already-gated order-grain stream ever re-keys (to meet customer).
   */
  def qds16OrderGateDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.liShip)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow)
    ensureIndex(spark, sfDir, AccelIndexes.custSeg)
    ensureIndex(spark, sfDir, AccelIndexes.nationDim)
    Tables.load(spark, sfDir, "lineitem")
      .createOrReplaceTempView("qds16_lineitem")
    Tables.load(spark, sfDir, "orders")
      .createOrReplaceTempView("qds16_orders")
    Tables.load(spark, sfDir, "customer")
      .createOrReplaceTempView("qds16_customer")
    Tables.load(spark, sfDir, "nation")
      .createOrReplaceTempView("qds16_nation")
    spark.sql(
      s"""SELECT CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS n_orders,
         |  ${sqlMoneySum("l1.l_extendedprice")} AS total_price,
         |  ${sqlMoneySum("l1.l_extendedprice * (1 - l1.l_discount)")} AS total_net
         |FROM qds16_lineitem l1
         |JOIN qds16_orders ON l1.l_orderkey = o_orderkey
         |JOIN qds16_customer ON o_custkey = c_custkey
         |JOIN qds16_nation ON c_nationkey = n_nationkey
         |WHERE l1.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
         |  AND l1.l_shipdate < TIMESTAMP '1996-05-01 00:00:00'
         |  AND n_regionkey = 1
         |  AND c_mktsegment IN ('BUILDING', 'MACHINERY')
         |  AND EXISTS (SELECT 1 FROM qds16_lineitem l2
         |    WHERE l2.l_orderkey = l1.l_orderkey
         |      AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM qds16_lineitem l3
         |    WHERE l3.l_orderkey = l1.l_orderkey
         |      AND l3.l_returnflag = 'R')""".stripMargin)
  }

  val qds16Sql: String =
    s"""SELECT CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS n_orders,
       |  ${sqlMoneySum("l1.l_extendedprice")} AS total_price,
       |  ${sqlMoneySum("l1.l_extendedprice * (1 - l1.l_discount)")} AS total_net
       |FROM lineitem l1
       |JOIN orders ON l1.l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l1.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
       |  AND l1.l_shipdate < TIMESTAMP '1996-05-01 00:00:00'
       |  AND n_regionkey = 1
       |  AND c_mktsegment IN ('BUILDING', 'MACHINERY')
       |  AND EXISTS (SELECT 1 FROM lineitem l2
       |    WHERE l2.l_orderkey = l1.l_orderkey
       |      AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
       |    WHERE l3.l_orderkey = l1.l_orderkey
       |      AND l3.l_returnflag = 'R')""".stripMargin

  /**
   * TPC-DS q6 shape (reference tpcds/queries/q6.sql): count, per
   * customer state, the month's purchases of items priced above 1.2×
   * their CATEGORY's average — a correlated per-group scalar average
   * over the ITEM DIM. Mapped: states → nations, categories → p_type,
   * current price → p_retailprice (uniform fixture prices: the bite
   * point is 1.005×, chosen to select at sf0.001 too). The oracle keeps the literal correlated subquery;
   * the engine decorrelates it into a WINDOW over the dim — the
   * per-category average is a second pass over the 200-row part
   * stream, never a join, and the qualifying partkeys then gate the
   * fact. Join order at 100 TB: the quarter-filtered orders meet the
   * fact ON THE ORDERKEY BUCKETS (zero-shuffle), and the collapsed
   * order-grain stream re-keys to meet customer — the cheap side
   * moves; the nation rollup is the only aggregate exchange.
   */
  def qds6PriceyPartsByNation(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liByPart)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    ensureIndex(spark, sfDir, AccelIndexes.custSeg)
    ensureIndex(spark, sfDir, AccelIndexes.nationDim)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_type"))
    val pricey = Tables.load(spark, sfDir, "part")
      // exact decimal sum, then DOUBLE division — the oracle's
      // CAST(SUM(...) AS DOUBLE) / COUNT(*) divides in double too
      .withColumn("type_avg",
        sum(col("p_retailprice").cast(DecimalType(28, 6))).over(w)
          .cast(DoubleType) / count(lit(1)).over(w))
      .filter(col("p_retailprice") > col("type_avg") * lit(1.005))
      .select(col("p_partkey"))
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(pricey, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("cust_nation"))
      .agg(count(lit(1)).cast(LongType).as("cnt"))
      .filter(col("cnt") >= 2)
      .orderBy(col("cnt"), col("cust_nation"))
      .limit(100)
  }

  val qds6Sql: String =
    s"""SELECT n_name AS cust_nation, CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN part ON l_partkey = p_partkey
       |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
       |  AND p_retailprice > 1.005 * (
       |    SELECT CAST(SUM(CAST(j.p_retailprice AS DECIMAL(28,6))) AS DOUBLE)
       |      / COUNT(*)
       |    FROM part j WHERE j.p_type = part.p_type)
       |GROUP BY 1 HAVING COUNT(*) >= 2
       |ORDER BY cnt, cust_nation LIMIT 100""".stripMargin

  /**
   * TPC-DS q30 shape (reference tpcds/queries/q30.sql): per-customer
   * RETURN totals, keep customers above 1.2× their state's average,
   * output the customer's own attributes — the q1 template at CUSTOMER
   * grain with a wide dim payload. Mapped: web returns → 'R'-flagged
   * 1997 lineitem through orders; states → nations. The engine
   * decorrelates the threshold (per-nation average joined back on the
   * correlation key) and attaches c_nationkey AFTER the customer-grain
   * collapse (custkey determines it), so the whole ctr CTE costs ONE
   * exchange carrying custkey partial aggregates: the R-filtered fact
   * meets orders on the ORDERKEY buckets zero-shuffle, and the
   * customer join rides the aggregate's own custkey partitioning
   * against the custkey-bucketed dim.
   */
  def qds30ReturnShareCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liChan)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow)
    ensureIndex(spark, sfDir, AccelIndexes.custFull)
    ensureIndex(spark, sfDir, AccelIndexes.custSeg)
    ensureIndex(spark, sfDir, AccelIndexes.nationDim)
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        year(col("l_shipdate")) === 1997)
    val ord = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val ctr = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("ctr_cust"))
      .agg(moneySum(rev).as("ctr_total"))
      .join(cust, col("ctr_cust") === col("c_custkey"))
    val thr = ctr
      .groupBy(col("c_nationkey").as("thr_nation"))
      .agg((moneySum(col("ctr_total")) / count(lit(1)) * lit(1.2)).as("thr"))
    ctr.join(thr, col("c_nationkey") === col("thr_nation"))
      .filter(col("ctr_total") > col("thr"))
      .join(Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_regionkey") === 2)
      .select(col("c_name"), col("c_mktsegment"), col("c_acctbal"),
        col("ctr_total"))
      .orderBy(col("c_name"), col("ctr_total"))
      .limit(100)
  }

  val qds30Sql: String =
    s"""WITH ctr AS (
       |  SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_nation,
       |    ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS ctr_total
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |    JOIN customer ON o_custkey = c_custkey
       |  WHERE l_returnflag = 'R'
       |    AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1997
       |  GROUP BY 1, 2)
       |SELECT c_name, c_mktsegment, c_acctbal, ctr_total
       |FROM ctr ctr1 JOIN customer ON ctr_cust = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE n_regionkey = 2
       |  AND ctr1.ctr_total > (
       |    SELECT ${sqlMoneySum("ctr2.ctr_total")} / COUNT(*) * 1.2
       |    FROM ctr ctr2 WHERE ctr2.ctr_nation = ctr1.ctr_nation)
       |ORDER BY c_name, ctr_total LIMIT 100""".stripMargin

  /**
   * TPC-DS q24 shape (reference tpcds/queries/q24a.sql): net paid on
   * RETURNED sales through a five-dim chain, re-aggregated per
   * (customer, store) for one item class, gated by a HAVING over a
   * scalar average of the whole CTE. Mapped: store_sales⋈store_returns
   * on the composite (ticket, item) → lineitem ⋈ its own 'R' rows
   * collapsed per (order, part) — the qds78 gate; stores → suppliers;
   * item color → p_type. The 100 TB discipline: the fact collapses to
   * (custkey, suppkey, partkey) grain BEFORE any dim join — the
   * composite-key returns gate and the orders join ride the orderkey
   * buckets zero-shuffle, the pre-aggregation is the only exchange
   * that ever carries fact-derived rows (as map-side partials), and
   * every dim meets the collapsed stream. The scalar HAVING threshold
   * is a single-row gather over the (tiny) ssales CTE, exact-decimal
   * on both engines.
   */
  def qds24ReturnedNetpaid(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liWide)
    ensureIndex(spark, sfDir, AccelIndexes.liQty)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow)
    ensureIndex(spark, sfDir, AccelIndexes.custDim)
    ensureIndex(spark, sfDir, AccelIndexes.suppDim)
    ensureIndex(spark, sfDir, AccelIndexes.partAttr)
    val li = Tables.load(spark, sfDir, "lineitem")
    val rets = li.filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey").as("r_ord"), col("l_partkey").as("r_part"))
      .agg(count(lit(1)).as("r_c"))
      .select(col("r_ord"), col("r_part"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    // fact-grain collapse FIRST: (cust, supp, part) partials, one
    // exchange — kept in EXACT DECIMAL so the two-level sum is
    // bit-identical to the oracle's one-level sum (a per-partial double
    // rounding at this finer grain would drift the low bits)
    val collapsed = li
      .join(rets, col("l_orderkey") === col("r_ord") &&
        col("l_partkey") === col("r_part"), "left_semi")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"), col("l_partkey"))
      .agg(sum(rev.cast(DecimalType(28, 6))).as("net_part"))
    // ssales at its real (customer, supplier, type) grain, dims attached
    // to the collapsed stream
    val ssales = collapsed
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.load(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("c_name"), col("s_name"), col("p_type"))
      .agg(sum(col("net_part")).cast(DoubleType).as("netpaid"))
    val thr = ssales
      .agg((moneySum(col("netpaid")) / count(lit(1)) * lit(0.05)).as("thr"))
    ssales.filter(col("p_type") === "PROMO")
      .groupBy(col("c_name"), col("s_name"))
      .agg(moneySum(col("netpaid")).as("paid"))
      .join(thr)
      .filter(col("paid") > col("thr"))
      .select(col("c_name"), col("s_name"), col("paid"))
      .orderBy(col("c_name"), col("s_name"))
      .limit(100)
  }

  val qds24Sql: String =
    s"""WITH ssales AS (
       |  SELECT c_name, s_name, p_type,
       |    ${sqlMoneySum("l.l_extendedprice * (1.0 - l.l_discount)")} AS netpaid
       |  FROM lineitem l
       |  JOIN (SELECT l_orderkey AS r_ord, l_partkey AS r_part FROM lineitem
       |        WHERE l_returnflag = 'R' GROUP BY 1, 2) r
       |    ON l.l_orderkey = r_ord AND l.l_partkey = r_part
       |  JOIN orders ON l.l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l.l_suppkey = s_suppkey
       |  JOIN part ON l.l_partkey = p_partkey
       |  GROUP BY 1, 2, 3)
       |SELECT c_name, s_name, ${sqlMoneySum("netpaid")} AS paid
       |FROM ssales WHERE p_type = 'PROMO'
       |GROUP BY 1, 2
       |HAVING ${sqlMoneySum("netpaid")} > (
       |  SELECT ${sqlMoneySum("netpaid")} / COUNT(*) * 0.05 FROM ssales)
       |ORDER BY c_name, s_name LIMIT 100""".stripMargin

  /**
   * TPC-DS q42/q52/q55 family (reference tpcds/queries/q42.sql,
   * q52.sql, q55.sql): the one-month star aggregate over the item dim,
   * re-skinned three ways (category grain, brand grain, brand grain at
   * a different month/filter). Ported in bulk as cheap oracle rows —
   * the plan class (partkey-bucketed fact scan, dim side moves,
   * brand/type-grain rollup) is the audited qds3/qds58 shape; the
   * value here is oracle breadth, not new mechanism. A total ORDER BY
   * (rev DESC, then the text key) keeps the LIMIT boundary
   * deterministic across engines.
   */
  private def starMonthAgg(spark: SparkSession, sfDir: String,
      month: String, sizeMax: Int, brandGrain: Boolean,
      withYear: Boolean): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liPartChan)
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(date_format(col("l_shipdate"), "yyyy-MM") === month)
    val part = Tables.load(spark, sfDir, "part")
      .filter(if (sizeMax > 0) col("p_size") < sizeMax
              else col("p_size") === 1)
    val joined = li.join(part, col("l_partkey") === col("p_partkey"))
    val keyCol = if (brandGrain) col("p_brand") else col("p_type")
    val keyName = if (brandGrain) "p_brand" else "p_type"
    val grouped =
      if (withYear)
        joined.groupBy(year(col("l_shipdate")).as("yr"), keyCol)
      else joined.groupBy(keyCol)
    grouped.agg(moneySum(col("l_extendedprice")).as("rev"))
      .orderBy(col("rev").desc, col(keyName))
      .limit(100)
  }

  def qds42MonthlyCategory(spark: SparkSession, sfDir: String): DataFrame =
    starMonthAgg(spark, sfDir, "1996-03", 10, brandGrain = false,
      withYear = true)
  def qds52BrandMonthly(spark: SparkSession, sfDir: String): DataFrame =
    starMonthAgg(spark, sfDir, "1996-03", 10, brandGrain = true,
      withYear = true)
  def qds55BrandRevenue(spark: SparkSession, sfDir: String): DataFrame =
    starMonthAgg(spark, sfDir, "1997-11", 0, brandGrain = true,
      withYear = false)

  private def starMonthSql(month: String, sizePred: String, key: String,
      withYear: Boolean): String = {
    val yrCol = if (withYear)
      "CAST(strftime(l_shipdate,'%Y') AS INT) AS yr, " else ""
    val grp = if (withYear) "1, 2" else "1"
    s"""SELECT $yrCol$key,
       |  ${sqlMoneySum("l_extendedprice")} AS rev
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE strftime(l_shipdate,'%Y-%m') = '$month' AND $sizePred
       |GROUP BY $grp ORDER BY rev DESC, $key LIMIT 100""".stripMargin
  }
  val qds42Sql: String =
    starMonthSql("1996-03", "p_size < 10", "p_type", withYear = true)
  val qds52Sql: String =
    starMonthSql("1996-03", "p_size < 10", "p_brand", withYear = true)
  val qds55Sql: String =
    starMonthSql("1997-11", "p_size = 1", "p_brand", withYear = false)

  /**
   * TPC-DS q23a FULL form (reference tpcds/queries/q23a.sql): the two
   * filtering CTEs — frequent items and best customers — applied to a
   * UNION ALL of TWO channel facts, summed to one row. qds23 covers
   * the CTE mechanics on a single fact; this port adds the cross-
   * channel reuse: both union legs must independently keep their
   * bucketed gates (the partkey semi and the custkey semi ride each
   * leg's co-partitioning), and the CTEs are recomputed per leg (the
   * oracle's CTE is named once — a hash match proves the recompute
   * equivalent). Channels are l_linenumber mod 2 classes, as in qds78.
   */
  def qds23TwoChannelTotal(spark: SparkSession, sfDir: String): DataFrame = {
    ensureIndex(spark, sfDir, AccelIndexes.liByPart)
    ensureIndex(spark, sfDir, AccelIndexes.ordByCust)
    ensureIndex(spark, sfDir, AccelIndexes.ordSnow3)
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val frequent = li
      .groupBy(col("l_partkey").as("fi_part"))
      .agg(countDistinct(col("l_orderkey")).as("n_ord"))
      .filter(col("n_ord") > 4)
      .select(col("fi_part"))
    val spend = ord
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("o_custkey").as("bc_cust"))
      .agg(moneySum(col("o_totalprice")).as("spend"))
    val maxSpend = spend.agg(max(col("spend")).as("max_spend"))
    val best = spend
      .join(broadcast(maxSpend))
      .filter(col("spend") > col("max_spend") * lit(0.5))
      .select(col("bc_cust"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    def channel(m: Int): DataFrame =
      li.filter(pmod(col("l_linenumber"), lit(2)) === m)
        .join(ord.filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(frequent, col("l_partkey") === col("fi_part"), "left_semi")
        .join(best, col("o_custkey") === col("bc_cust"), "left_semi")
        .select(rev.as("sales"))
    channel(0).unionAll(channel(1))
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        moneySum(col("sales")).as("total_sales"))
  }

  val qds23bSql: String =
    s"""WITH frequent AS (
       |  SELECT l_partkey FROM lineitem
       |  GROUP BY 1 HAVING COUNT(DISTINCT l_orderkey) > 4),
       |spend AS (
       |  SELECT o_custkey, ${sqlMoneySum("o_totalprice")} AS spend
       |  FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY 1),
       |best AS (
       |  SELECT o_custkey FROM spend
       |  WHERE spend > (SELECT MAX(spend) FROM spend) * 0.5)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  ${sqlMoneySum("sales")} AS total_sales
       |FROM (
       |  SELECT l_extendedprice * (1.0 - l_discount) AS sales
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_linenumber % 2 = 0
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_partkey IN (SELECT l_partkey FROM frequent)
       |    AND o_custkey IN (SELECT o_custkey FROM best)
       |  UNION ALL
       |  SELECT l_extendedprice * (1.0 - l_discount) AS sales
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_linenumber % 2 = 1
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_partkey IN (SELECT l_partkey FROM frequent)
       |    AND o_custkey IN (SELECT o_custkey FROM best)) y""".stripMargin

  val entries: Map[String, Registry.Entry] = Map(
    "qds23b_two_channel_total" -> (qds23TwoChannelTotal _, qds23bSql),
    "qds42_monthly_category" -> (qds42MonthlyCategory _, qds42Sql),
    "qds52_brand_monthly" -> (qds52BrandMonthly _, qds52Sql),
    "qds55_brand_revenue" -> (qds55BrandRevenue _, qds55Sql),
    "qds16_order_gate_distinct" -> (qds16OrderGateDistinct _, qds16Sql),
    "qds6_pricey_parts_by_nation" -> (qds6PriceyPartsByNation _, qds6Sql),
    "qds30_return_share_customers" -> (qds30ReturnShareCustomers _, qds30Sql),
    "qds24_returned_netpaid" -> (qds24ReturnedNetpaid _, qds24Sql),
    "qds46_cross_nation_orders" -> (qds46CrossNationOrders _, qds46Sql),
    "qds48_band_or" -> (qds48BandOr _, qds48Sql),
    "qds29_repeat_channel_qty" -> (qds29RepeatChannelQty _, qds29Sql),
    "qds97_channel_overlap" -> (qds97ChannelOverlap _, qds97Sql),
    "qds37_inventory_probe" -> (qds37InventoryProbe _, qds37Sql),
    "qds45_geo_or_item_gate" -> (qds45GeoOrItemGate _, qds45Sql),
    "qds11_yoy_channel_union" -> (qds11YoyChannelUnion _, qds11Sql),
    "qds61_promo_ratio" -> (qds61PromoRatio _, qds61Sql),
    "qds40_net_split" -> (qds40NetSplit _, qds40Sql),
    "qds66_wide_metric_pivot" -> (qds66WideMetricPivot _, qds66Sql),
    "qds56_natural_gate" -> (qds56NaturalGate _, qds56Sql),
    "qds92_excess_discount" -> (qds92ExcessDiscount _, qds92Sql),
    "qds50_return_lag_bands" -> (qds50ReturnLagBands _, qds50Sql),
    "qds5_channel_pnl" -> (qds5ChannelPnl _, qds5Sql),
    "qds54_segment_funnel" -> (qds54SegmentFunnel _, qds54Sql),
    "qds80_channel_rollup" -> (qds80ChannelRollup _, qds80Sql),
    "qds62_ship_lag_bands" -> (qds62ShipLagBands _, qds62Sql),
    "qds44_rank_ends" -> (qds44RankEnds _, qds44Sql),
    "qds70_gated_rollup_rank" -> (qds70GatedRollupRank _, qds70Sql),
    "qds33_brand_channels" -> (qds33BrandChannels _, qds33Sql),
    "qds31_quarter_growth" -> (qds31QuarterGrowth _, qds31Sql),
    "qds59_week_store_pivot" -> (qds59WeekStorePivot _, qds59Sql),
    "qds86_rollup_parent_rank" -> (qds86RollupParentRank _, qds86Sql),
    "qds49_worst_return_ratios" -> (qds49WorstReturnRatios _, qds49Sql),
    "qds94_shipped_not_returned" -> (qds94ShippedNotReturned _, qds94Sql),
    "qds38_intersect_channels" -> (qds38IntersectChannels _, qds38Sql),
    "qds58_channel_band" -> (qds58ChannelBand _, qds58Sql),
    "qds34_count_gate" -> (qds34CountGate _, qds34Sql),
    "qds17_repurchase_stats" -> (qds17RepurchaseStats _, qds17Sql),
    "qds2_week_pivot" -> (qds2WeekPivot _, qds2Sql),
    "qds39_inventory_cov" -> (qds39InventoryCov _, qds39Sql),
    "qds75_yoy_decline" -> (qds75YoyDecline _, qds75Sql),
    "qds28_band_distinct" -> (qds28BandStats _, qds28Sql),
    "qds47_monthly_deviation" -> (qds47MonthlyDeviation _, qds47Sql),
    "qds78_noreturn_ratio" -> (qds78NoReturnRatio _, qds78Sql),
    "qds67_rollup_rank" -> (qds67RollupRank _, qds67Sql),
    "qds72_inventory_gate" -> (qds72InventoryGate _, qds72Sql),
    "qds93_returns_adjusted" -> (qds93ReturnsAdjusted _, qds93Sql),
    "qds88_band_counts" -> (qds88BandCounts _, qds88Sql),
    "qds4_yoy_channel_growth" -> (qds4YoyChannelGrowth _, qds4Sql),
    "qds64_wide_multi_join" -> (qds64WideMultiJoin _, qds64Sql),
    "qds35_or_exists_demo" -> (qds35OrExistsDemo _, qds35Sql),
    "qds1_returns_above_avg" -> (qds1ReturnsAboveAvg _, qds1Sql),
    "qds65_underperf_parts" -> (qds65UnderperfParts _, qds65Sql),
    "qds_deep_snowflake_4idx" -> (qdsDeepSnowflake _, qdsDeepSql),
    "qds95_multi_supplier_ship" -> (qds95MultiSupplierShip _, qds95Sql),
    "qds14_cross_channel" -> (qds14CrossChannel _, qds14Sql),
    "qds27_rollup_agg" -> (qds27RollupAgg _, qds27Sql),
    "qds87_except_channels" -> (qds87ExceptChannels _, qds87Sql),
    "qds23_frequent_buyers" -> (qds23FrequentBuyers _, qds23Sql),
    "qds77_channel_profit" -> (qds77ChannelProfit _, qds77Sql),
    "qds51_cumulative_channels" -> (qds51CumulativeChannels _, qds51Sql))
}
