package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.queries.TextPrimitives._

/**
 * Sampling + order-statistics operators for training-data pipelines
 * (beyond the reference — SURVEY.md §2.6b).
 *
 * Scale design:
 *  - stratified sampling is HASH-deterministic, not RNG: membership is a
 *    pure function of the row key, so re-runs, retries, and incremental
 *    reprocessing select the SAME sample on any cluster layout — the
 *    property `rand()`-based sampling silently lacks. One map pass, one
 *    partial+final aggregate; no shuffle of the unsampled data.
 *  - discrete percentiles (`percentile_disc`) return an actual data value
 *    (no interpolation), so results are bit-exact across engines; Spark
 *    executes them as a single sort-based aggregate per group.
 */
object Sampling {

  /** Deterministic ~10% stratified sample of orders per priority class:
    * a row is in-sample iff md5-hash(o_orderkey) mod 100 < 10. Emits
    * per-stratum totals + an integral checksum over the sampled keys so
    * the oracle pins the exact membership, not just the rate. */
  def qSampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val keyed = o.select(
      col("o_orderpriority").as("stratum"),
      col("o_orderkey"),
      (tokenHash(col("o_orderkey").cast("string")) % 100L).as("h"))
    keyed.groupBy(col("stratum"))
      .agg(
        count(lit(1)).cast(LongType).as("n_total"),
        sum(when(col("h") < 10, 1L).otherwise(0L)).cast(LongType).as("n_sampled"),
        sum(when(col("h") < 10, col("o_orderkey")).otherwise(0L))
          .cast(LongType).as("sampled_keysum"))
      .orderBy(col("stratum"))
  }

  val qSampleStratifiedSql: String = {
    val h = sqlTokenHash("CAST(o_orderkey AS VARCHAR)")
    s"""SELECT o_orderpriority AS stratum,
       |  CAST(COUNT(*) AS BIGINT) AS n_total,
       |  CAST(SUM(CASE WHEN $h % 100 < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |  CAST(SUM(CASE WHEN $h % 100 < 10 THEN o_orderkey ELSE 0 END) AS BIGINT)
       |    AS sampled_keysum
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Exact discrete percentiles (p50/p90/p99) of extended price per
    * return flag — `percentile_disc` picks an actual data value, so the
    * doubles are bit-identical across engines (no interpolation math). */
  def qPercentilesDisc(spark: SparkSession, sfDir: String): DataFrame = {
    val view = "graft_pct_lineitem"
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView(view)
    spark.sql(
      s"""SELECT l_returnflag,
         |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
         |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90,
         |  percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM $view GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val qPercentilesDiscSql: String =
    """SELECT l_returnflag,
      |  quantile_disc(l_extendedprice, 0.5) AS p50,
      |  quantile_disc(l_extendedprice, 0.9) AS p90,
      |  quantile_disc(l_extendedprice, 0.99) AS p99,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "sample_stratified" -> (qSampleStratified _, qSampleStratifiedSql),
    "q_percentiles_disc" -> (qPercentilesDisc _, qPercentilesDiscSql))
}
