package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.GraftBridge

/**
 * Routes Spark-parsed DML statements targeting `graft_delta.` /
 * `graft_iceberg.` / `graft_lake.`-qualified paths onto the
 * [[graft.index.sources.LakeTable]] verbs, BEFORE the analyzer would
 * fail the unresolvable relation. Spark's own grammar does all the
 * expression parsing; this rule only pattern-matches the statement
 * shape and refuses — loudly, with the supported shape in the message —
 * anything [[graft.index.sources.LakeTable]]'s CDC-upsert merge can't
 * express (delta-spark's MERGE is general; ours is the Flink-upsert
 * subset both formats commit in one snapshot).
 */
class LakeDmlResolution extends Rule[LogicalPlan] {

  /** Unwraps `[alias.]graft_<fmt>.`path`` → (path, alias). */
  private def graftTarget(p: LogicalPlan): Option[(String, Option[String])] =
    p match {
      case SubqueryAlias(ident, child) =>
        graftTarget(child).map { case (path, _) => (path, Some(ident.name)) }
      case u: UnresolvedRelation => u.multipartIdentifier match {
        case Seq(ns, path)
            if GraftSqlParser.Providers.contains(ns.toLowerCase) =>
          Some((path, None))
        case _ => None
      }
      case _ => None
    }

  private def sourceAlias(p: LogicalPlan): Option[String] = p match {
    case SubqueryAlias(ident, _) => Some(ident.name)
    case _ => None
  }

  /** Drop `t.`/`s.` qualifiers the underlying verb resolves without. */
  private def stripQuals(e: Expression, aliases: Set[String]): Expression =
    e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length > 1 &&
          aliases.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(a.nameParts.tail)
    }

  private def asColumn(e: Expression, aliases: Set[String]): Column =
    GraftBridge.column(stripQuals(e, aliases))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft lake SQL: $msg. Supported MERGE shape: MERGE INTO <lake> t " +
        "USING <src> s ON t.k = s.k [AND ...] [WHEN MATCHED AND <cond> " +
        "THEN DELETE] WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED " +
        "THEN INSERT *")

  /** A SET key / ON operand must resolve to ONE top-level column:
    * strip a leading known-alias qualifier, then refuse anything still
    * multi-part — a wrong alias (`SET x.c = ...`) or a nested field
    * (`SET address.city = ...`) would otherwise silently resolve to the
    * last segment's top-level column and touch the wrong data. */
  private def plainColumn(a: UnresolvedAttribute,
      aliases: Set[String], what: String): String = {
    val parts = a.nameParts
    val stripped =
      if (parts.length > 1 && aliases.contains(parts.head.toLowerCase))
        parts.tail
      else parts
    if (stripped.length != 1)
      fail(s"$what must be a plain top-level column" +
        (if (aliases.nonEmpty)
          s", optionally qualified by ${aliases.toSeq.sorted.mkString("/")}"
        else "") + s"; got ${a.sql}")
    stripped.head
  }

  /** `ON t.k = s.k AND ...` → the merge key column names. Qualified
    * operands must name the two DIFFERENT sides — `t.k = t.k` would
    * vacuously match everything against the source. */
  private def mergeKeys(cond: Expression, targetAlias: Option[String],
      srcAlias: Option[String]): Seq[String] = {
    val known = (targetAlias.toSeq ++ srcAlias.toSeq).map(_.toLowerCase).toSet
    conjuncts(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        Seq(a, b).foreach(x => plainColumn(x, known, "each ON operand"))
        (a.nameParts, b.nameParts) match {
          case (qa :: _ :: Nil, qb :: _ :: Nil)
              if qa.equalsIgnoreCase(qb) =>
            fail(s"ON ${a.sql} = ${b.sql} qualifies both operands with " +
              "the same alias — one side must be the target, the other " +
              "the source")
          case _ => ()
        }
        a.nameParts.last
      case other => fail("the ON clause must be a conjunction of " +
        s"target.key = source.key equalities on same-named columns, got: " +
        other.sql)
    }
  }

  private def convertMerge(m: MergeIntoTable, path: String,
      targetAlias: Option[String]): LogicalPlan = {
    val srcAlias = sourceAlias(m.sourceTable)
    val aliases = (targetAlias.toSeq ++ srcAlias.toSeq).map(_.toLowerCase).toSet
    val keys = mergeKeys(m.mergeCondition, targetAlias, srcAlias)

    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
    val (deletes, updates) =
      m.matchedActions.partition(_.isInstanceOf[DeleteAction])
    updates match {
      case Seq(UpdateStarAction(None)) => ()
      case _ => fail("matched rows must be handled by exactly one " +
        "unconditional WHEN MATCHED THEN UPDATE SET *")
    }
    if (deletes.nonEmpty && !m.matchedActions.head.isInstanceOf[DeleteAction])
      fail("a WHEN MATCHED ... DELETE clause must precede the UPDATE " +
        "clause (SQL first-match-wins semantics)")
    val deleteCondition = deletes match {
      case Nil => None
      case Seq(DeleteAction(Some(c))) =>
        // evaluated over SOURCE rows by LakeTable.merge — a target-
        // qualified reference would silently resolve against the source
        targetAlias.filter(t => !srcAlias.exists(_.equalsIgnoreCase(t)))
          .foreach { t =>
            c.foreach {
              case a: UnresolvedAttribute
                  if a.nameParts.length > 1 &&
                    a.nameParts.head.equalsIgnoreCase(t) =>
                fail(s"the DELETE condition must reference source columns " +
                  s"only, got target-qualified ${a.sql}")
              case _ => ()
            }
          }
        Some(asColumn(c, aliases))
      case _ => fail("only WHEN MATCHED AND <condition> THEN DELETE is " +
        "supported (one conditional delete clause)")
    }
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case _ => fail("unmatched rows must be handled by exactly one " +
        "unconditional WHEN NOT MATCHED THEN INSERT *")
    }
    GraftMergeCommand(path, m.sourceTable, keys, deleteCondition)
  }

  /** SELECT-side resolution: a graft-qualified relation (optionally
    * time-traveled) becomes the analyzed plan of the corresponding
    * [[graft.index.sources.LakeTable]] read — `SELECT ... FROM
    * graft_delta.`/p` VERSION AS OF 3` is the same code path as
    * `DeltaTable.read(versionAsOf = 3)`. */
  private def readPlan(path: String, version: Option[String],
      ts: Option[Expression]): LogicalPlan = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.internal.SQLConf
    import org.apache.spark.sql.types.TimestampType
    import graft.index.sources.LakeTable
    val spark = SparkSession.active
    val df = (version, ts) match {
      case (Some(v), _) =>
        // parse OUTSIDE the read: a NumberFormatException raised inside
        // readAsOf's own log walk must not be misrouted to the ref path
        v.toLongOption match {
          case Some(id) => LakeTable.readAsOf(spark, path, id)
          case None =>
            // non-numeric version names an Iceberg BRANCH or TAG —
            // `VERSION AS OF 'audit'` reads the ref's pinned snapshot
            LakeTable.readRef(spark, path, v)
        }
      case (_, Some(e)) =>
        if (!e.resolved || !e.foldable)
          fail(s"TIMESTAMP AS OF on a lake path must be a literal, " +
            s"got ${e.sql}")
        Cast(e, TimestampType,
            Some(SQLConf.get.sessionLocalTimeZone)).eval(null) match {
          case micros: java.lang.Long =>
            LakeTable.readTimestampAsOf(spark, path,
              Math.floorDiv(micros, 1000L))
          case _ =>
            fail(s"TIMESTAMP AS OF did not evaluate to a timestamp: ${e.sql}")
        }
      case _ => LakeTable.read(spark, path)
    }
    df.queryExecution.analyzed
  }

  private def resolveReads(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case tt @ org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
          u: UnresolvedRelation, ts, version) if graftTarget(u).isDefined =>
        readPlan(graftTarget(u).get._1, version, ts)
      case u: UnresolvedRelation if graftTarget(u).isDefined =>
        readPlan(graftTarget(u).get._1, None, None)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable =>
      graftTarget(m.targetTable)
        .map { case (path, alias) => convertMerge(m, path, alias) }
        .getOrElse(plan)
    case u: UpdateTable =>
      graftTarget(u.table).map { case (path, alias) =>
        val aliases = alias.map(_.toLowerCase).toSet
        val set = u.assignments.map { a =>
          val name = a.key match {
            case k: UnresolvedAttribute => plainColumn(k, aliases, "SET")
            case other => fail(s"SET must assign plain columns, got ${other.sql}")
          }
          name -> asColumn(a.value, aliases)
        }
        GraftUpdateCommand(path, set, u.condition.map(asColumn(_, aliases)))
      }.getOrElse(plan)
    case d: DeleteFromTable =>
      graftTarget(d.table).map { case (path, alias) =>
        val aliases = alias.map(_.toLowerCase).toSet
        GraftDeleteCommand(path,
          Option(d.condition).map(asColumn(_, aliases)))
      }.getOrElse(plan)
    case i: InsertIntoStatement =>
      graftTarget(i.table).map { case (rawPath, _) =>
        if (i.partitionSpec.nonEmpty || i.userSpecifiedCols.nonEmpty ||
            i.ifPartitionNotExists)
          fail("INSERT into a lake path takes neither a PARTITION spec " +
            "nor a column list (appends write the table's own layout)")
        // `/path@branch` targets an Iceberg branch (WAP audit write).
        // The split applies ONLY when the prefix is itself a recognized
        // lake table and the full raw path is not — so an existing table
        // whose last path segment legitimately contains '@' (/data/t@v2)
        // keeps appending as a plain INSERT instead of being
        // reinterpreted as a branch write
        val (path, branch) = rawPath.lastIndexOf('@') match {
          case at if at > 0 &&
              rawPath.substring(at + 1).matches("[\\w-]+") && {
                val spark = org.apache.spark.sql.SparkSession.active
                !graft.index.sources.LakeTable.isLakeTable(spark, rawPath) &&
                  graft.index.sources.LakeTable.isLakeTable(
                    spark, rawPath.substring(0, at))
              } =>
            (rawPath.substring(0, at), Some(rawPath.substring(at + 1)))
          case _ => (rawPath, None)
        }
        GraftInsertCommand(path, resolveReads(i.query), i.overwrite, branch)
      }.getOrElse(plan)
    case _ => resolveReads(plan)
  }
}
