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
    val ci = CreateIndexRe.matcher(sqlText)
    if (ci.matches()) {
      val cols = ci.group("cols").split(",").toSeq
        .map(stripIdent).filter(_.nonEmpty)
      val incl = Option(ci.group("incl")).toSeq
        .flatMap(_.split(",")).map(stripIdent).filter(_.nonEmpty)
      return GraftCreateIndexCommand(stripIdent(ci.group("name")),
        ci.group("src").toLowerCase, ci.group("path"), cols, incl,
        Option(ci.group("using")).map(_.toLowerCase).getOrElse("covering"),
        Option(ci.group("opts")).map(parseOptions).getOrElse(Map.empty))
    }
    val di = DropIndexRe.matcher(sqlText)
    if (di.matches())
      return GraftDropIndexCommand(stripIdent(di.group("name")))
    val ri = RefreshIndexRe.matcher(sqlText)
    if (ri.matches()) {
      return GraftRefreshIndexCommand(stripIdent(ri.group("name")),
        Option(ri.group("mode")).map(_.toLowerCase).getOrElse("full"))
    }
    val oi = OptimizeIndexRe.matcher(sqlText)
    if (oi.matches()) {
      return GraftOptimizeIndexCommand(stripIdent(oi.group("name")),
        Option(oi.group("mode")).map(_.toLowerCase).getOrElse("quick"))
    }
    val vi = VacuumIndexRe.matcher(sqlText)
    if (vi.matches())
      return GraftVacuumIndexCommand(stripIdent(vi.group("name")))
    val rsi = RestoreIndexRe.matcher(sqlText)
    if (rsi.matches())
      return GraftRestoreIndexCommand(stripIdent(rsi.group("name")))
    if (ShowIndexesRe.matcher(sqlText).matches())
      return GraftShowIndexesCommand()
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
    val r = RestoreRe.matcher(sqlText)
    if (r.matches()) {
      return Option(r.group("version")) match {
        case Some(v) => GraftRestoreCommand(target(r), Some(v.toLong), None)
        case None => GraftRestoreCommand(target(r), None,
          Some(parseTsMillis(r.group("ts"))))
      }
    }
    val c = ConvertRe.matcher(sqlText)
    if (c.matches()) {
      val parts = Option(c.group("partcols")).toSeq
        .flatMap(_.split(",")).map(stripIdent).filter(_.nonEmpty)
      return GraftConvertCommand(c.group("path"),
        c.group("fmt").toLowerCase, parts)
    }
    val a = AnalyzeRe.matcher(sqlText)
    if (a.matches()) return GraftAnalyzeCommand(target(a))
    val ac = AlterConstraintRe.matcher(sqlText)
    if (ac.matches()) {
      return Option(ac.group("addname")) match {
        case Some(n) =>
          GraftAddConstraintCommand(target(ac), stripIdent(n),
            ac.group("check").trim)
        case None =>
          GraftDropConstraintCommand(target(ac),
            stripIdent(ac.group("dropname")))
      }
    }
    val at = AlterColumnTypeRe.matcher(sqlText)
    if (at.matches()) {
      return GraftAlterColumnTypeCommand(target(at),
        stripIdent(at.group("col")),
        delegate.parseDataType(at.group("dtype")))
    }
    val si = SyncIdentityRe.matcher(sqlText)
    if (si.matches()) return GraftSyncIdentityCommand(target(si))
    val adc = AddColumnRe.matcher(sqlText)
    if (adc.matches()) {
      val defs = splitTopLevel(stripOuterParens(sanitizeBody(
        adc.group("body")))).map { item =>
        val m = ColDefRe.matcher(item)
        if (!m.matches())
          throw new IllegalArgumentException(
            s"ALTER TABLE ... ADD COLUMNS: cannot parse '$item' " +
              "(expected: name[.nested] TYPE [, ...])")
        (delegate.parseMultipartIdentifier(m.group(1)),
          delegate.parseDataType(m.group(2)))
      }
      if (defs.isEmpty)
        throw new IllegalArgumentException(
          "ALTER TABLE ... ADD COLUMNS: no column definitions given")
      return GraftAddColumnsCommand(target(adc), defs)
    }
    val rnc = RenameColumnRe.matcher(sqlText)
    if (rnc.matches()) {
      return GraftRenameColumnCommand(target(rnc),
        delegate.parseMultipartIdentifier(rnc.group("old")),
        stripIdent(rnc.group("new")))
    }
    val drc = DropColumnRe.matcher(sqlText)
    if (drc.matches()) {
      val cols = splitTopLevel(stripOuterParens(sanitizeBody(
        drc.group("body")))).map(delegate.parseMultipartIdentifier)
      if (cols.isEmpty)
        throw new IllegalArgumentException(
          "ALTER TABLE ... DROP COLUMNS: no columns given")
      return GraftDropColumnCommand(target(drc), cols)
    }
    val crf = CreateRefRe.matcher(sqlText)
    if (crf.matches()) {
      val dayMs = 24L * 3600 * 1000
      return GraftCreateRefCommand(target(crf), stripIdent(crf.group("name")),
        crf.group("rtype").toLowerCase,
        Option(crf.group("at")).map(_.toLong),
        orReplace = crf.group("orreplace") != null,
        maxRefAgeMs = Option(crf.group("retain")).map(_.toLong * dayMs),
        minSnapshotsToKeep = Option(crf.group("keepsnaps")).map(_.toInt),
        maxSnapshotAgeMs =
          Option(crf.group("snapage")).orElse(Option(crf.group("snapageonly")))
            .map(_.toLong * dayMs))
    }
    val drf = DropRefRe.matcher(sqlText)
    if (drf.matches()) {
      return GraftDropRefCommand(target(drf), stripIdent(drf.group("name")),
        drf.group("rtype").toLowerCase, drf.group("ifexists") != null)
    }
    val ff = FastForwardRe.matcher(sqlText)
    if (ff.matches()) {
      return GraftFastForwardCommand(target(ff), stripIdent(ff.group("name")))
    }
    val cb = ClusterByRe.matcher(sqlText)
    if (cb.matches()) {
      val cols = Option(cb.group("cols")).toSeq
        .flatMap(_.split(",")).map(stripIdent).filter(_.nonEmpty)
      return GraftClusterByCommand(target(cb), cols)
    }
    val sp = SetPropsRe.matcher(sqlText)
    if (sp.matches()) {
      return GraftSetPropertiesCommand(target(sp),
        parsePropList(sp.group("props"), "SET TBLPROPERTIES",
          withValues = true).toMap)
    }
    val shp = ShowPropsRe.matcher(sqlText)
    if (shp.matches()) return GraftShowPropertiesCommand(target(shp))
    val up = UnsetPropsRe.matcher(sqlText)
    if (up.matches()) {
      return GraftUnsetPropertiesCommand(target(up),
        parsePropList(up.group("keys"), "UNSET TBLPROPERTIES",
          withValues = false).map(_._1).toSet)
    }
    val ct = CreateRe.matcher(sqlText)
    if (ct.matches()) {
      val parts = Option(ct.group("partcols")).toSeq
        .flatMap(_.split(",")).map(stripIdent).filter(_.nonEmpty)
      // the SELECT body parses through Spark's OWN grammar — full
      // expression/join/CTE syntax for free, like the DML statements
      return GraftCreateTableCommand(ct.group("path"),
        ct.group("fmt").toLowerCase, parts,
        delegate.parseQuery(ct.group("query")))
    }
    val cts = CreateSchemaRe.matcher(sqlText)
    if (cts.matches()) {
      val parts = Option(cts.group("partcols")).toSeq
        .flatMap(_.split(",")).map(stripIdent).filter(_.nonEmpty)
      return GraftCreateEmptyTableCommand(cts.group("path"),
        cts.group("fmt").toLowerCase, parts,
        delegate.parseTableSchema(cts.group("schema")))
    }
    delegate.parsePlan(sqlText)
  }

  /** `'2026-01-02 03:04:05[.fff]'` / `'2026-01-02'` → epoch millis,
    * interpreted in the session time zone like Spark's own
    * TIMESTAMP AS OF literal. */
  private def parseTsMillis(raw: String): Long = {
    val s = stripQuotes(raw)
    val micros = org.apache.spark.sql.catalyst.util.DateTimeUtils
      .stringToTimestampAnsi(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        java.time.ZoneId.of(org.apache.spark.sql.internal.SQLConf.get
          .sessionLocalTimeZone))
    Math.floorDiv(micros, 1000L)
  }

  private def stripQuotes(s: String): String =
    s.trim.stripPrefix("'").stripSuffix("'")

  /** Trim a statement body the anchored regex may have captured with a
    * trailing semicolon. */
  private def sanitizeBody(s: String): String =
    s.trim.stripSuffix(";").trim

  /** Split on commas at zero `()`/`<>` depth, backtick-aware — so
    * `a decimal(10,2), b map<int, string>` yields two definitions. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var tick = false
    s.foreach {
      case '`' => tick = !tick; cur += '`'
      case c if tick => cur += c
      case c @ ('(' | '<') => depth += 1; cur += c
      case c @ (')' | '>') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Strip ONE outer paren pair iff it encloses the whole string —
    * `(a INT, b STRING)` unwraps, `decimal(10,2)` and unbalanced
    * bodies don't. */
  private def stripOuterParens(s0: String): String = {
    val s = s0.trim
    if (!s.startsWith("(") || !s.endsWith(")")) return s
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0 && i != s.length - 1) return s // closes early
        case _ =>
      }
      i += 1
    }
    if (depth == 0) s.substring(1, s.length - 1).trim else s
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

  // ---- index lifecycle DDL (the engine's core artifact, from SQL) ----
  // CREATE INDEX n ON parquet|graft_*.`/p` (cols) [INCLUDE (cols)]
  //   [USING COVERING|ZORDER|DATASKIPPING] [OPTIONS (k=v, ...)]
  private val CreateIndexRe = re(
    """CREATE\s+INDEX\s+(?<name>[\w`-]+)\s+ON\s+""" +
      """(?<src>parquet|graft_delta|graft_iceberg|graft_lake)""" +
      """\s*\.\s*`(?<path>[^`]+)`""" +
      """\s*\((?<cols>[^)]+)\)""" +
      """(?:\s+INCLUDE\s*\((?<incl>[^)]+)\))?""" +
      """(?:\s+USING\s+(?<using>COVERING|ZORDER|DATASKIPPING))?""" +
      // the group is QUOTE-AWARE: a quoted value may contain ')' (and
      // ','), so the span can't simply stop at the first close-paren;
      // SQL-style doubled-quote escapes ('' / "") stay inside the value.
      // Known limitation: an UNTERMINATED quote makes the whole
      // statement fail this regex, so it falls through to the delegate
      // parser's generic error rather than parseOptions' targeted one.
      """(?:\s+OPTIONS\s*\((?<opts>(?:[^)'"]|'[^']*(?:''[^']*)*'|"[^"]*(?:""[^"]*)*")*)\))?""")

  /** `k = v, k2 = 'v2'` → Map; keys lowercased, quotes stripped from
    * values. Tokenization is quote-aware — a `','` or `')'` INSIDE a
    * quoted value never splits a pair — and supports SQL-style
    * doubled-quote escapes: `'it''s'` → `it's`, `"a""b"` → `a"b`.
    * Malformed pairs refuse loudly — a typo'd option must never
    * silently build a default index. */
  private[sql] def parseOptions(raw: String): Map[String, String] = {
    // split on top-level commas only (commas inside '...' / "..." stay;
    // a doubled quote inside a quoted run is an escape, not a close)
    val pairs = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < raw.length) {
      val c = raw(i)
      if (quote != 0) {
        if (c == quote && i + 1 < raw.length && raw(i + 1) == quote) {
          cur += c; cur += c; i += 1 // escaped quote: stay in the run
        } else { cur += c; if (c == quote) quote = 0 }
      }
      else if (c == '\'' || c == '"') { quote = c; cur += c }
      else if (c == ',') { pairs += cur.toString; cur.clear() }
      else cur += c
      i += 1
    }
    if (quote != 0) throw new IllegalArgumentException(
      s"Malformed OPTIONS '$raw' — unterminated quote")
    pairs += cur.toString
    pairs.map(_.trim).filter(_.nonEmpty).map { pair =>
      pair.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty && v.trim.nonEmpty =>
          val value = v.trim
          val quoteChar =
            if (value.length >= 2 && (value.head == '\'' || value.head == '"') &&
                value.last == value.head) value.head else 0.toChar
          val unquoted =
            if (quoteChar != 0)
              value.substring(1, value.length - 1)
                .replace(s"$quoteChar$quoteChar", s"$quoteChar")
            else value
          k.trim.toLowerCase -> unquoted
        case _ => throw new IllegalArgumentException(
          s"Malformed OPTIONS entry '$pair' — expected key = value")
      }
    }.toMap
  }
  private val DropIndexRe = re("""DROP\s+INDEX\s+(?<name>[\w`-]+)""")
  private val RefreshIndexRe = re(
    """REFRESH\s+INDEX\s+(?<name>[\w`-]+)""" +
      """(?:\s+(?<mode>FULL|INCREMENTAL|QUICK))?""")
  private val OptimizeIndexRe = re(
    """OPTIMIZE\s+INDEX\s+(?<name>[\w`-]+)(?:\s+(?<mode>FULL|QUICK))?""")
  private val VacuumIndexRe = re("""VACUUM\s+INDEX\s+(?<name>[\w`-]+)""")
  private val RestoreIndexRe = re("""RESTORE\s+INDEX\s+(?<name>[\w`-]+)""")
  private val ShowIndexesRe = re("""SHOW\s+INDEXES""")

  private val OptimizeRe = re(
    s"""OPTIMIZE\\s+$TargetSrc(?:\\s+WHERE\\s+(?<where>.+?))?""" +
      """(?:\s+ZORDER\s+BY\s*\(?(?<zorder>[^)]+?)\)?)?""")
  private val VacuumRe = re(
    s"""VACUUM\\s+$TargetSrc(?:\\s+RETAIN\\s+(?<hours>\\d+(?:\\.\\d+)?)\\s+HOURS?)?""")
  private val DescribeRe = re(
    s"""DESC(?:RIBE)?\\s+(?<what>DETAIL|HISTORY)\\s+$TargetSrc""")
  // RESTORE [TABLE] <lake> TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts'
  private val RestoreRe = re(
    s"""RESTORE\\s+(?:TABLE\\s+)?$TargetSrc\\s+TO\\s+(?:""" +
      """VERSION\s+AS\s+OF\s+(?<version>\d+)|""" +
      """TIMESTAMP\s+AS\s+OF\s+(?<ts>'[^']+'))""")
  // CONVERT TO DELTA|ICEBERG parquet.`/p` [PARTITIONED BY (c, ...)]
  private val ConvertRe = re(
    """CONVERT\s+TO\s+(?<fmt>DELTA|ICEBERG)\s+parquet\s*\.\s*""" +
      """`(?<path>[^`]+)`""" +
      """(?:\s+PARTITIONED\s+BY\s*\((?<partcols>[^)]+)\))?""")
  // ANALYZE TABLE <lake> COMPUTE STATISTICS
  private val AnalyzeRe = re(
    s"""ANALYZE\\s+TABLE\\s+$TargetSrc\\s+COMPUTE\\s+STATISTICS""")
  // CREATE TABLE graft_<fmt>.`/p` [PARTITIONED BY (...)] AS <select>
  private val CreateRe = re(
    """CREATE\s+TABLE\s+graft_(?<fmt>delta|iceberg|lake)\s*\.\s*""" +
      """`(?<path>[^`]+)`""" +
      """(?:\s+PARTITIONED\s+BY\s*\((?<partcols>[^)]+)\))?""" +
      """\s+AS\s+(?<query>.+)""")
  // CREATE TABLE graft_<fmt>.`/p` (<schema>) [PARTITIONED BY (...)] —
  // explicit-schema empty table; the schema body parses through
  // Spark's own parseTableSchema so nested types/comments come free
  private val CreateSchemaRe = re(
    """CREATE\s+TABLE\s+graft_(?<fmt>delta|iceberg|lake)\s*\.\s*""" +
      """`(?<path>[^`]+)`""" +
      """\s*\((?<schema>.+?)\)""" +
      """(?:\s+PARTITIONED\s+BY\s*\((?<partcols>[^)]+)\))?""")

  // ALTER TABLE <lake> ADD CONSTRAINT n CHECK (expr) | DROP CONSTRAINT n
  private val AlterConstraintRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+(?:""" +
      """ADD\s+CONSTRAINT\s+(?<addname>[\w`]+)\s+CHECK\s*\((?<check>.+)\)|""" +
      """DROP\s+CONSTRAINT\s+(?<dropname>[\w`]+))""")
  // ALTER TABLE <lake> ALTER|CHANGE COLUMN c TYPE t
  private val AlterColumnTypeRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+""" +
      """(?<col>[\w`]+)\s+TYPE\s+(?<dtype>[\w()\s,]+)""")
  // ALTER TABLE <lake> SYNC IDENTITY
  private val SyncIdentityRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+SYNC\\s+IDENTITY""")
  // ALTER TABLE <lake> ADD COLUMN[S] c1 T1 [, c2 T2 …] | (c1 T1, …) —
  // the body is parsed by parseColumnDefs: nested targets (a.b.c),
  // nested types (array<int>, struct<…>), multi-column lists
  private val AddColumnRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+ADD\\s+COLUMNS?\\s+(?<body>.+)""")
  // ALTER TABLE <lake> RENAME COLUMN old[.nested] TO new
  private val RenameColumnRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+RENAME\\s+COLUMN\\s+""" +
      """(?<old>[\w`.]+)\s+TO\s+(?<new>[\w`]+)""")
  // ALTER TABLE <lake> DROP COLUMN[S] c[, …] | (c, …)
  private val DropColumnRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+DROP\\s+COLUMNS?\\s+(?<body>.+)""")
  // one column definition: dotted (optionally backticked) name + type
  private val ColDefRe = Pattern.compile(
    """(?s)^((?:`[^`]+`|\w+)(?:\.(?:`[^`]+`|\w+))*)\s+(.+)$""")
  // ALTER TABLE <lake> CREATE [OR REPLACE] BRANCH|TAG name
  //   [AS OF VERSION n] [RETAIN n DAYS]
  //   [WITH SNAPSHOT RETENTION k SNAPSHOTS [n DAYS] | n DAYS]
  private val CreateRefRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+CREATE\\s+""" +
      """(?:(?<orreplace>OR\s+REPLACE)\s+)?(?<rtype>BRANCH|TAG)\s+""" +
      """(?<name>[\w`-]+)""" +
      """(?:\s+AS\s+OF\s+VERSION\s+(?<at>\d+))?""" +
      """(?:\s+RETAIN\s+(?<retain>\d+)\s+DAYS?)?""" +
      """(?:\s+WITH\s+SNAPSHOT\s+RETENTION\s+(?:""" +
      """(?<keepsnaps>\d+)\s+SNAPSHOTS?(?:\s+(?<snapage>\d+)\s+DAYS?)?|""" +
      """(?<snapageonly>\d+)\s+DAYS?))?""")
  // ALTER TABLE <lake> DROP BRANCH|TAG [IF EXISTS] name
  private val DropRefRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+DROP\\s+(?<rtype>BRANCH|TAG)\\s+""" +
      """(?:(?<ifexists>IF\s+EXISTS)\s+)?(?<name>[\w`-]+)""")
  // ALTER TABLE <lake> FAST FORWARD branch — the WAP publish (the
  // statement form of Iceberg's fast_forward procedure)
  private val FastForwardRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+FAST\\s+FORWARD\\s+""" +
      """(?<name>[\w`-]+)""")
  // ALTER TABLE <lake> CLUSTER BY (c, ...) | CLUSTER BY NONE
  private val ClusterByRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+CLUSTER\\s+BY\\s+""" +
      """(?:NONE|\((?<cols>[^)]+)\))""")
  // ALTER TABLE <lake> SET TBLPROPERTIES ('k'='v', ...) — the body is
  // greedy-to-last-paren so a ')' INSIDE a quoted value still parses
  private val SetPropsRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+SET\\s+TBLPROPERTIES\\s*""" +
      """\((?<props>.+)\)\s*""")
  // ALTER TABLE <lake> UNSET TBLPROPERTIES ('k', ...)
  private val UnsetPropsRe = re(
    s"""ALTER\\s+TABLE\\s+$TargetSrc\\s+UNSET\\s+TBLPROPERTIES\\s*""" +
      """\((?<keys>.+)\)\s*""")
  /** One single-quoted literal starting at `from` (which must point at
    * the opening quote), honoring standard `''` escaping. Returns the
    * unescaped text and the index just past the closing quote; None if
    * `from` isn't a quote or the literal never terminates. */
  private def parseQuoted(s: String, from: Int): Option[(String, Int)] = {
    if (from >= s.length || s.charAt(from) != '\'') return None
    val sb = new StringBuilder
    var i = from + 1
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
          sb.append('\''); i += 2
        } else return Some((sb.toString, i + 1))
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    None
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }

  /** Tokenize `'k'='v', …` (SET) or `'k', …` (UNSET) with an EXPLICIT
    * comma-separated grammar: a missing comma, missing `=`, unquoted
    * token, trailing comma, or unterminated literal refuses loudly
    * with the offending position — a silently-dropped entry (an
    * ignored `delta.appendOnly` would be a silent enforcement gap) is
    * never possible. Values use standard `''` quote escaping. */
  private[sql] def parsePropList(raw: String, what: String,
      withValues: Boolean): Seq[(String, String)] = {
    def refuse(i: Int, expected: String): Nothing =
      throw new IllegalArgumentException(
        s"$what: expected $expected at position $i in ($raw) — entries " +
          "must be 'key'='value' (SET) or 'key' (UNSET), single-quoted " +
          "with '' escaping, comma-separated")
    val out = scala.collection.mutable.Buffer.empty[(String, String)]
    var i = skipWs(raw, 0)
    require(i < raw.length, s"$what: no entries in ($raw)")
    var more = true
    while (more) {
      val (k, afterK) = parseQuoted(raw, i)
        .getOrElse(refuse(i, "a quoted 'key'"))
      i = skipWs(raw, afterK)
      if (withValues) {
        if (i >= raw.length || raw.charAt(i) != '=') refuse(i, "'='")
        i = skipWs(raw, i + 1)
        val (v, afterV) = parseQuoted(raw, i)
          .getOrElse(refuse(i, "a quoted 'value'"))
        out += k -> v
        i = skipWs(raw, afterV)
      } else out += k -> ""
      if (i >= raw.length) more = false
      else if (raw.charAt(i) == ',') {
        i = skipWs(raw, i + 1)
        if (i >= raw.length) refuse(i, "an entry after ','")
      } else refuse(i, "',' between entries")
    }
    out.toSeq
  }
  // SHOW TBLPROPERTIES <lake>
  private val ShowPropsRe = re(
    s"""SHOW\\s+TBLPROPERTIES\\s+$TargetSrc""")

  private def target(m: java.util.regex.Matcher): String = m.group("path")

  private def stripIdent(s: String): String =
    s.trim.stripPrefix("`").stripSuffix("`").trim
}
