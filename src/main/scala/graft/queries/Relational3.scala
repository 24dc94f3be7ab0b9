package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables

/**
 * Third tranche of TPC-H-shaped queries, adapted to the trimmed test schema
 * (no partsupp table, no commit/receipt dates — see TESTDATA.md):
 * max-per-group with join-back (Q2), two-role dimension joins (Q7/Q8/Q9),
 * scalar-threshold HAVING (Q11), argmax via window (Q15), correlated
 * per-group average (Q17), nested semi-join chains (Q20), and
 * EXISTS + NOT EXISTS over a self-join (Q21).
 *
 * Scale notes: only relations of FIXED cardinality (nation 25 rows,
 * region 5, single-row scalar aggregates) carry explicit `broadcast`
 * hints. Sf-proportional relations (part/customer/supplier and per-key
 * aggregates derived from the fact table) are left to AQE's size-based
 * planning: at small SFs AQE broadcasts them anyway, and at 100× scale
 * they exceed the broadcast hard limit — a forced hint there fails the
 * job outright instead of degrading to a shuffle join. Remaining
 * shuffles aggregate partially map-side. Window
 * functions partition by bounded keys (p_partkey, s_suppkey) — no global
 * sort, no skew beyond the data's own key distribution.
 *
 * Same determinism contract as [[Relational]]: money sums through
 * DECIMAL(28,6) then cast to DOUBLE, counts cast to BIGINT, explicit
 * total orders before any LIMIT.
 */
object Relational3 {

  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)
  private def sqlMoneySum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"

  // ------------------------------------------------------------------ q2
  /** TPC-H Q2 shape: per-part argmax over qualifying suppliers.
    * Adapted: "supplier of choice" for each EUROPE-shipped LARGE part of
    * size 15 is the one with max account balance among suppliers that
    * actually shipped it (distinct pairs from lineitem stand in for
    * partsupp). */
  def q2TopSupplierPerPart(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
    val pairs = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val supp = Tables.load(spark, sfDir, "supplier")
    val nat = Tables.load(spark, sfDir, "nation")
    val reg = Tables.load(spark, sfDir, "region")
      .filter(col("r_name") === "EUROPE")
    val cand = pairs
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
    val w = Window.partitionBy(col("p_partkey"))
    cand.withColumn("max_bal", max(col("s_acctbal")).over(w))
      .filter(col("s_acctbal") === col("max_bal"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |cand AS (
      |  SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      |  FROM pairs, part, supplier, nation, region
      |  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      |    AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |    AND p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, cand.p_partkey, p_name
      |FROM cand
      |JOIN (SELECT p_partkey, MAX(s_acctbal) AS max_bal
      |      FROM cand GROUP BY p_partkey) m
      |  ON cand.p_partkey = m.p_partkey AND cand.s_acctbal = m.max_bal
      |ORDER BY s_acctbal DESC, n_name, s_name, cand.p_partkey
      |LIMIT 100""".stripMargin

  // ------------------------------------------------------------------ q7
  /** TPC-H Q7 shape: bilateral trade volume between two nation GROUPS by
    * year (groups rather than single nations so the result is non-empty
    * at every scale factor). The nation dimension is joined twice in
    * different roles (supplier nation and customer nation). */
  def q7VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val ord = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer")
    val supp = Tables.load(spark, sfDir, "supplier")
    val n1 = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter(
        (col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3") &&
          col("cust_nation").isin("NATION_4", "NATION_5", "NATION_6")) ||
        (col("supp_nation").isin("NATION_4", "NATION_5", "NATION_6") &&
          col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3")))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       | CAST(year(l_shipdate) AS BIGINT) AS l_year,
       | ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem, orders, customer, supplier, nation n1, nation n2
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       | AND l_suppkey = s_suppkey AND s_nationkey = n1.n_nationkey
       | AND c_nationkey = n2.n_nationkey
       | AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       | AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       | AND ((n1.n_name IN ('NATION_1','NATION_2','NATION_3')
       |        AND n2.n_name IN ('NATION_4','NATION_5','NATION_6'))
       |   OR (n1.n_name IN ('NATION_4','NATION_5','NATION_6')
       |        AND n2.n_name IN ('NATION_1','NATION_2','NATION_3')))
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------------ q8
  /** TPC-H Q8 shape: a nation's market share inside a region, by year —
    * conditional share of a two-role nation join. */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_type") === "ECONOMY")
    val ord = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer")
    val supp = Tables.load(spark, sfDir, "supplier")
    val n1 = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val n2 = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val reg = Tables.load(spark, sfDir, "region")
      .filter(col("r_name") === "ASIA")
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg((moneySum(when(col("supp_nation") === "NATION_8", vol)
          .otherwise(lit(0.0))) / moneySum(vol)).as("mkt_share"),
        count(lit(1)).cast(LongType).as("n_rows"))
      .orderBy(col("o_year"))
  }

  val q8Sql: String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       | ${sqlMoneySum("CASE WHEN n2.n_name = 'NATION_8' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       |   / ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS mkt_share,
       | CAST(COUNT(*) AS BIGINT) AS n_rows
       |FROM lineitem, part, orders, customer, supplier, nation n1, nation n2, region
       |WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
       | AND o_custkey = c_custkey AND l_suppkey = s_suppkey
       | AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
       | AND s_nationkey = n2.n_nationkey
       | AND p_type = 'ECONOMY' AND r_name = 'ASIA'
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ q9
  /** TPC-H Q9 shape: profit by supplier nation and year for a part-name
    * family. Without ps_supplycost, profit = discounted revenue minus tax. */
  def q9ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_name").contains("widget"))
    val supp = Tables.load(spark, sfDir, "supplier")
    val nat = Tables.load(spark, sfDir, "nation")
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      col("l_extendedprice") * col("l_tax")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast(LongType).as("o_year"))
      .agg(moneySum(amount).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       | ${sqlMoneySum("l_extendedprice * (1.0 - l_discount) - l_extendedprice * l_tax")} AS sum_profit
       |FROM lineitem, part, supplier, nation
       |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
       | AND s_nationkey = n_nationkey AND p_name LIKE '%widget%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  // ----------------------------------------------------------------- q11
  /** TPC-H Q11 shape: per-part value HAVING > fraction of the grand total
    * (scalar-subquery threshold kept inside the plan as a broadcast
    * single-row cross join — no driver round trip). Value = discounted
    * revenue shipped by NATION_3 suppliers, standing in for
    * ps_supplycost * ps_availqty. */
  def q11ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val supp = Tables.load(spark, sfDir, "supplier")
    val nat = Tables.load(spark, sfDir, "nation")
      .filter(col("n_name") === "NATION_3")
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val base = li
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
    val perPart = base.groupBy(col("l_partkey"))
      .agg(moneySum(vol).as("part_value"))
    val total = base.agg(moneySum(vol).as("total_value"))
    perPart.crossJoin(broadcast(total))
      .filter(col("part_value") > col("total_value") * 0.001)
      .select(col("l_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val q11Sql: String =
    s"""WITH base AS (
       |  SELECT l_partkey, l_extendedprice * (1.0 - l_discount) AS vol
       |  FROM lineitem, supplier, nation
       |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |    AND n_name = 'NATION_3')
       |SELECT l_partkey, ${sqlMoneySum("vol")} AS part_value
       |FROM base
       |GROUP BY l_partkey
       |HAVING ${sqlMoneySum("vol")} >
       |  (SELECT ${sqlMoneySum("vol")} FROM base) * 0.001
       |ORDER BY part_value DESC, l_partkey""".stripMargin

  // ----------------------------------------------------------------- q15
  /** TPC-H Q15 shape: top supplier(s) by quarterly revenue — argmax via a
    * global-max window over the aggregated (small) supplier rollup. */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val rev = li.groupBy(col("l_suppkey"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
    val supp = Tables.load(spark, sfDir, "supplier")
    // argmax as a broadcast single-row cross join: avoids the
    // all-rows-to-one-partition window a global max().over() would plan
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_rev"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  // ----------------------------------------------------------------- q17
  /** TPC-H Q17 shape: correlated per-group average — revenue from
    * small-quantity lineitems of one brand, where "small" is relative to
    * that part's own average quantity. */
  def q17SmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_brand") === "Brand#11")
    // decimal-exact per-part mean so the boundary compare is reproducible
    val avgQty = li.groupBy(col("l_partkey").as("ap_key"))
      .agg((sum(col("l_quantity").cast(DecimalType(28, 6))).cast(DoubleType) /
        count(col("l_quantity")).cast(DoubleType)).as("avg_qty"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("ap_key"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg((moneySum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).cast(LongType).as("n_rows"))
  }

  val q17Sql: String =
    s"""WITH avg_qty AS (
       |  SELECT l_partkey AS ap_key,
       |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
       |      / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty
       |  FROM lineitem GROUP BY l_partkey)
       |SELECT ${sqlMoneySum("l_extendedprice")} / 7.0 AS avg_yearly,
       | CAST(COUNT(*) AS BIGINT) AS n_rows
       |FROM lineitem, part, avg_qty
       |WHERE l_partkey = p_partkey AND l_partkey = ap_key
       | AND p_brand = 'Brand#11' AND l_quantity < avg_qty * 0.5""".stripMargin

  // ----------------------------------------------------------------- q20
  /** TPC-H Q20 shape: nested semi-join chain — suppliers in one nation who
    * shipped a meaningful quantity of a part-name family in one year. */
  def q20PartPromotion(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_name").startsWith("small"))
      .select(col("p_partkey"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val shipped = li
      .join(part, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(moneySum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 50.0)
      .select(col("l_suppkey")).distinct()
    val supp = Tables.load(spark, sfDir, "supplier")
    val nat = Tables.load(spark, sfDir, "nation")
      .filter(col("n_name") === "NATION_5")
    supp
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val q20Sql: String =
    s"""SELECT s_name, s_acctbal
       |FROM supplier
       |WHERE s_nationkey IN (
       |    SELECT n_nationkey FROM nation WHERE n_name = 'NATION_5')
       |  AND s_suppkey IN (
       |    SELECT l_suppkey FROM lineitem
       |    WHERE l_partkey IN (
       |        SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
       |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |    GROUP BY l_suppkey, l_partkey
       |    HAVING ${sqlMoneySum("l_quantity")} > 50.0)
       |ORDER BY s_name""".stripMargin

  // ----------------------------------------------------------------- q21
  /** TPC-H Q21 shape: EXISTS + NOT EXISTS over a lineitem self-join.
    * Adapted (no receipt/commit dates): suppliers in NATION_0 who were the
    * ONLY supplier with a returned ('R') lineitem in a finalized
    * multi-supplier order. */
  def q21LoneReturner(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val l1 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o_key"), col("l_suppkey").as("s_key"))
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val supp = Tables.load(spark, sfDir, "supplier")
    val nat = Tables.load(spark, sfDir, "nation")
      .filter(col("n_name") === "NATION_0")
    val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
    l1.join(ord, col("o_key") === col("o_orderkey"), "left_semi")
      .join(l2, col("o_key") === col("k2") && col("s_key") =!= col("s2"),
        "left_semi")
      .join(l3, col("o_key") === col("k3") && col("s_key") =!= col("s3"),
        "left_anti")
      .join(supp, col("s_key") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"),
        "left_semi")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).cast(LongType).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM lineitem l1, orders, supplier, nation
      |WHERE l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
      | AND l1.l_returnflag = 'R'
      | AND l1.l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      | AND n_name = 'NATION_0'
      | AND EXISTS (SELECT 1 FROM lineitem l2
      |             WHERE l2.l_orderkey = l1.l_orderkey
      |               AND l2.l_suppkey <> l1.l_suppkey)
      | AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                 WHERE l3.l_orderkey = l1.l_orderkey
      |                   AND l3.l_suppkey <> l1.l_suppkey
      |                   AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  // ------------------------------------------------------ salted join
  /** Skew-mitigated equi join: the fact side gets a DETERMINISTIC salt
    * (`xxhash64(saltSource) mod salts` — replayable, unlike `rand()`),
    * the dim side is replicated once per salt value, and the join runs
    * on `(key, salt)`. A hot key's rows then spread over `salts`
    * reducers instead of one — the standard remedy when a shuffle join's
    * largest key exceeds one executor's share and the dim side is too
    * big to broadcast. Result set is EXACTLY the plain join's (the
    * oracle pins this); cost is dim × salts replication, so pick
    * `salts` ≈ the skew factor, not larger. AQE's skew-join splitting
    * handles moderate skew on its own — explicit salting is for the
    * extreme tail AQE can't split (a single key bigger than an
    * executor), and composes with any downstream agg. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, saltSource: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted fact-dim join, aggregated: events x customer on the user
    * key with 8 salts, revenue per market segment and event type. The
    * dim side carries a `shuffle_hash` hint so the test actually
    * exercises the salted SHUFFLE path (a broadcast join would make
    * salting a no-op — at real scale the dim that needs salting does
    * not fit a broadcast). Values identical to the unsalted join. */
  def qSaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      .hint("shuffle_hash")
    saltedJoin(events, cust, "user_id", salts = 8,
      saltSource = col("event_id"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).cast(LongType).as("n_events"),
        moneySum(col("value")).as("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** DuckDB twin: the PLAIN join — salting must be invisible in the
    * result. */
  val qSaltedJoinSql: String =
    """SELECT c_mktsegment, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment, event_type
      |ORDER BY c_mktsegment, event_type""".stripMargin

  /**
   * Month-over-month supplier quantity delta over RAW parquet — the
   * end-to-end oracle for [[graft.execution.AlignAggExchange]]'s JOIN
   * branch: per-(supplier, month) aggregates self-joined on supplier
   * alone (P ⊂ G), with a threshold filter and rename between the
   * aggregate and the join, exactly the chain the rule peels. With no
   * index in play the rule re-keys each side's aggregate exchange onto
   * l_suppkey and drops the join's re-shuffles: two exchanges total, and
   * this row proves result parity under the rewrite against DuckDB.
   */
  def qMonthDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    def month(m: Int, tag: String): DataFrame =
      li.filter(year(col("l_shipdate")) === 1995 &&
          org.apache.spark.sql.functions.month(col("l_shipdate")) === m)
        .groupBy(col("l_suppkey").as(s"${tag}_sk"))
        .agg(moneySum(col("l_quantity")).as(s"${tag}_q"),
          count(lit(1)).cast(LongType).as(s"${tag}_n"))
        .filter(col(s"${tag}_n") >= 2)
    month(3, "a").join(month(4, "b"), col("a_sk") === col("b_sk"))
      .select(col("a_sk").as("suppkey"), col("a_q"), col("b_q"),
        (col("b_q") - col("a_q")).as("delta"))
      .orderBy(col("suppkey"))
      .limit(200)
  }

  val qMonthDeltaSql: String =
    s"""WITH m AS (
       |  SELECT l_suppkey AS sk,
       |    CAST(strftime(l_shipdate, '%m') AS INT) AS moy,
       |    ${sqlMoneySum("l_quantity")} AS q,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM lineitem
       |  WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
       |    AND CAST(strftime(l_shipdate, '%m') AS INT) IN (3, 4)
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
       |SELECT a.sk AS suppkey, a.q AS a_q, b.q AS b_q, b.q - a.q AS delta
       |FROM m a JOIN m b ON a.sk = b.sk
       |WHERE a.moy = 3 AND b.moy = 4
       |ORDER BY suppkey
       |LIMIT 200""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_month_delta_align" -> (qMonthDelta _, qMonthDeltaSql),
    "q_salted_join" -> (qSaltedJoin _, qSaltedJoinSql),
    "q2_top_supplier_per_part" -> (q2TopSupplierPerPart _, q2Sql),
    "q7_volume_shipping" -> (q7VolumeShipping _, q7Sql),
    "q8_market_share" -> (q8MarketShare _, q8Sql),
    "q9_product_profit" -> (q9ProductProfit _, q9Sql),
    "q11_important_parts" -> (q11ImportantParts _, q11Sql),
    "q15_top_supplier" -> (q15TopSupplier _, q15Sql),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _, q17Sql),
    "q20_part_promotion" -> (q20PartPromotion _, q20Sql),
    "q21_lone_returner" -> (q21LoneReturner _, q21Sql))
}
