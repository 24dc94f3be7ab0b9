package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2 + the
  * training-pipeline extensions) to a runnable DataFrame job over the
  * parquet tables in the given scale-factor directory; `oracleSql` gives the
  * DuckDB-equivalent SQL for the driver's correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Registry.all("q1_pricing_summary")._1(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    _root_.graft.queries.Registry.all.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    _root_.graft.queries.Registry.all.collect {
      case (k, (_, sql)) if sql != null => k -> sql
    }
}
