package graft.sql

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Delegating SQL parser for the lakehouse MAINTENANCE statements Spark's
 * grammar doesn't have — `OPTIMIZE`, `VACUUM`, `DESCRIBE DETAIL`,
 * `DESCRIBE HISTORY` — the delta-spark `DeltaSqlParser` pattern: try the
 * small grammar first, delegate everything else untouched. DML
 * statements (`MERGE INTO` / `UPDATE` / `DELETE FROM`) parse through
 * Spark's OWN grammar and are routed by [[LakeDmlResolution]] instead,
 * so their full expression syntax comes for free.
 *
 * A lake table is addressed by path, qualified with the provider the
 * batch-reader syntax already uses:
 * {{{
 *   OPTIMIZE graft_delta.`/path/t` WHERE p = 3 ZORDER BY (a, b)
 *   VACUUM graft_iceberg.`/path/t` RETAIN 168 HOURS
 *   DESCRIBE DETAIL graft_lake.`/path/t`   -- format auto-detected
 * }}}
 */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val m = OptimizeRe.matcher(sqlText)
    if (m.matches()) {
      val zcols = Option(m.group("zorder")).toSeq
        .flatMap(_.split(",")).map(stripIdent).filter(_.nonEmpty)
      return GraftOptimizeCommand(target(m), zcols,
        Option(m.group("where")).map(_.trim).filter(_.nonEmpty))
    }
    val v = VacuumRe.matcher(sqlText)
    if (v.matches()) {
      return GraftVacuumCommand(target(v),
        Option(v.group("hours")).map(_.toDouble))
    }
    val d = DescribeRe.matcher(sqlText)
    if (d.matches()) {
      return d.group("what").toLowerCase match {
        case "detail" => GraftDescribeDetailCommand(target(d))
        case _ => GraftDescribeHistoryCommand(target(d))
      }
    }
    delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  /** Providers a statement may qualify a path with; `graft_lake`
    * auto-detects (LakeTable.formatOf does the probing either way). */
  val Providers: Set[String] = Set("graft_delta", "graft_iceberg", "graft_lake")

  // graft_delta.`/path`  |  graft_iceberg.`/path`  |  graft_lake.`/path`
  private val TargetSrc =
    """(?:graft_(?:delta|iceberg|lake))\s*\.\s*`(?<path>[^`]+)`"""

  private def re(src: String): Pattern =
    Pattern.compile("(?is)^\\s*" + src + "\\s*;?\\s*$")

  private val OptimizeRe = re(
    s"""OPTIMIZE\\s+$TargetSrc(?:\\s+WHERE\\s+(?<where>.+?))?""" +
      """(?:\s+ZORDER\s+BY\s*\(?(?<zorder>[^)]+?)\)?)?""")
  private val VacuumRe = re(
    s"""VACUUM\\s+$TargetSrc(?:\\s+RETAIN\\s+(?<hours>\\d+(?:\\.\\d+)?)\\s+HOURS?)?""")
  private val DescribeRe = re(
    s"""DESC(?:RIBE)?\\s+(?<what>DETAIL|HISTORY)\\s+$TargetSrc""")

  private def target(m: java.util.regex.Matcher): String = m.group("path")

  private def stripIdent(s: String): String =
    s.trim.stripPrefix("`").stripSuffix("`").trim
}
