package graft.telemetry

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.{GraftConf, IndexState}
import graft.index.covering.CoveringIndexConfig

/** Reflection-instantiated test logger: the instance is created by
  * [[GraftEventLogging]], so recording goes through a companion queue. */
class RecordingEventLogger extends GraftEventLogger {
  override def logEvent(event: GraftEvent): Unit =
    RecordingEventLogger.events.add(event)
}

object RecordingEventLogger {
  val events = new ConcurrentLinkedQueue[GraftEvent]()
  def drain(): Seq[GraftEvent] = {
    val b = Seq.newBuilder[GraftEvent]
    var e = events.poll()
    while (e != null) { b += e; e = events.poll() }
    b.result()
  }
}

/** Not a [[GraftEventLogger]] — for the type-mismatch leg. */
class NotALogger

/**
 * Telemetry parity (reference: telemetry/HyperspaceEventLogging.scala:30-40,
 * HyperspaceEvent.scala:49-166): every action FSM verb emits its typed
 * event to the conf-resolved logger, index usage emits from the rewrite
 * rule, the default is a no-op, and misconfiguration fails loudly.
 */
class TelemetrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def lineitem =
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")

  private def withGraft[T](body: Graft => T): T = {
    val dir = Files.createTempDirectory("graft-tel-").toString
    spark.conf.set(GraftConf.SystemPathKey, dir)
    try body(new Graft(spark))
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      graft.index.rules.IndexCatalog.invalidate(spark)
    }
  }

  private def withLogger[T](className: String =
      classOf[RecordingEventLogger].getName)(body: => T): T = {
    spark.conf.set(GraftEventLogging.LoggerClassKey, className)
    RecordingEventLogger.drain()
    try body
    finally spark.conf.unset(GraftEventLogging.LoggerClassKey)
  }

  test("every action verb emits its typed event, in order, with the " +
      "post-transition log entry as payload") {
    withGraft { g =>
      withLogger() {
        val df = lineitem
        g.createIndex(df, CoveringIndexConfig(
          "tel_ci", Seq("l_orderkey"), Seq("l_quantity")))
        g.refreshIndex("tel_ci", "quick")
        g.refreshIndex("tel_ci", "incremental")
        g.refreshIndex("tel_ci", "full")
        g.optimizeIndex("tel_ci")
        g.vacuumIndex("tel_ci") // ACTIVE -> outdated-version cleanup
        g.deleteIndex("tel_ci")
        g.restoreIndex("tel_ci")
        g.deleteIndex("tel_ci")
        g.vacuumIndex("tel_ci") // DELETED -> hard delete
        val got = RecordingEventLogger.drain()
        assert(got.map(_.getClass.getSimpleName) == Seq(
          "CreateActionEvent", "RefreshQuickActionEvent",
          "RefreshIncrementalActionEvent", "RefreshActionEvent",
          "OptimizeActionEvent", "VacuumOutdatedActionEvent",
          "DeleteActionEvent", "RestoreActionEvent", "DeleteActionEvent",
          "VacuumActionEvent"), got.map(_.message).mkString("\n"))
        val create = got.head.asInstanceOf[CreateActionEvent]
        assert(create.indexConfig.indexName == "tel_ci")
        assert(create.index.exists(_.state == IndexState.Active))
        // analyzed-plan text: relation columns render, paths don't
        assert(create.originalPlan.contains("Relation") &&
          create.originalPlan.contains("l_orderkey"))
        assert(create.appInfo.appId.nonEmpty &&
          create.appInfo.appName.nonEmpty)
        val del = got(6).asInstanceOf[DeleteActionEvent]
        assert(del.index.name == "tel_ci" &&
          del.index.state == IndexState.Deleted)
        val rst = got(7).asInstanceOf[RestoreActionEvent]
        assert(rst.index.state == IndexState.Active)
        assert(got.forall(_.message.contains("tel_ci")))
      }
    }
  }

  test("cancel emits CancelActionEvent with the rolled-back state") {
    withGraft { g =>
      withLogger() {
        g.createIndex(lineitem, CoveringIndexConfig(
          "tel_cancel", Seq("l_orderkey"), Seq("l_quantity")))
        val log = g.indexManager.logManager("tel_cancel")
        val latest = log.getLatestStableLog.get
        assert(log.writeLog(latest.id + 1,
          latest.copy(state = IndexState.Refreshing, id = latest.id + 1)))
        RecordingEventLogger.drain()
        g.cancel("tel_cancel")
        val got = RecordingEventLogger.drain()
        assert(got.map(_.getClass.getSimpleName) == Seq("CancelActionEvent"))
        assert(got.head.asInstanceOf[CancelActionEvent]
          .index.state == IndexState.Active)
      }
    }
  }

  test("the rewrite rule emits IndexUsageEvent when an index serves a " +
      "query — with the applied names and both plans") {
    withGraft { g =>
      withLogger() {
        g.createIndex(lineitem, CoveringIndexConfig(
          "tel_usage", Seq("l_orderkey"), Seq("l_quantity")))
        RecordingEventLogger.drain()
        val q = lineitem.filter(col("l_orderkey") === 1L)
          .select(col("l_orderkey"), col("l_quantity"))
        q.collect()
        val usages = RecordingEventLogger.drain()
          .collect { case u: IndexUsageEvent => u }
        assert(usages.nonEmpty, "no usage event for an accelerated query")
        val u = usages.head
        assert(u.indexes == Seq("tel_usage"))
        // the SERVING RULE is stamped too — per-rule hit rates are the
        // corpus-tuning signal (a filter-query serve is FilterIndexRule)
        assert(u.rules == Seq("FilterIndexRule"), s"rules: ${u.rules}")
        // logical-plan text renders the pruned relation, not the path —
        // the applied names live in `indexes`; the plans must differ
        assert(u.planBeforeRule.nonEmpty && u.planAfterRule.nonEmpty &&
          u.planBeforeRule != u.planAfterRule)
        assert(u.message.contains("tel_usage"))
      }
    }
  }

  test("usage event stamps the serving rule per mechanism: a bucketed " +
      "join pair reports JoinIndexRule with both index names") {
    withGraft { g =>
      withLogger() {
        val orders = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
        g.createIndex(lineitem, CoveringIndexConfig(
          "tel_jr_li", Seq("l_orderkey"), Seq("l_quantity")))
        g.createIndex(orders, CoveringIndexConfig(
          "tel_jr_ord", Seq("o_orderkey"), Seq("o_totalprice")))
        RecordingEventLogger.drain()
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
          .collect()
        val usages = RecordingEventLogger.drain()
          .collect { case u: IndexUsageEvent => u }
        assert(usages.nonEmpty)
        val u = usages.head
        assert(u.indexes.toSet == Set("tel_jr_li", "tel_jr_ord"),
          s"indexes: ${u.indexes}")
        assert(u.rules.contains("JoinIndexRule"), s"rules: ${u.rules}")
      }
    }
  }

  test("usage emission is thread-safe: concurrent accelerated queries " +
      "all emit, none fails") {
    withGraft { g =>
      withLogger() {
        g.createIndex(lineitem, CoveringIndexConfig(
          "tel_mt", Seq("l_orderkey"), Seq("l_quantity")))
        RecordingEventLogger.drain()
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val runs = (1 to 4).map(i => Future {
          lineitem.filter(col("l_orderkey") === i.toLong)
            .select(col("l_orderkey"), col("l_quantity")).collect()
        })
        Await.result(Future.sequence(runs), 120.seconds)
        val usages = RecordingEventLogger.drain()
          .collect { case u: IndexUsageEvent => u }
        assert(usages.size >= 4 &&
          usages.forall(_.indexes == Seq("tel_mt")))
        assert(usages.forall(_.rules.nonEmpty))
      }
    }
  }

  test("default is the no-op logger: no conf, no events, and actions " +
      "never pay for payload construction") {
    withGraft { g =>
      RecordingEventLogger.drain()
      assert(GraftEventLogging.loggerFor(spark) eq NoOpEventLogger)
      g.createIndex(lineitem, CoveringIndexConfig(
        "tel_noop", Seq("l_orderkey"), Seq("l_quantity")))
      g.deleteIndex("tel_noop")
      assert(RecordingEventLogger.drain().isEmpty)
    }
  }

  test("misconfigured logger fails loudly: unknown class and non-logger " +
      "class both throw IllegalArgumentException naming the class") {
    withGraft { g =>
      def createOnce(name: String) = g.createIndex(lineitem,
        CoveringIndexConfig(name, Seq("l_orderkey"), Seq("l_quantity")))
      val e1 = intercept[IllegalArgumentException] {
        withLogger("graft.telemetry.DoesNotExist")(createOnce("tel_bad1"))
      }
      assert(e1.getMessage.contains("graft.telemetry.DoesNotExist"))
      // the logger is validated BEFORE the first durable log write: the
      // failed action must leave NO state behind (a caller retry after
      // fixing the conf starts clean instead of hitting a wedged index)
      assert(new graft.index.IndexManager(spark)
        .logManager("tel_bad1").getLatestId.isEmpty)
      val e2 = intercept[IllegalArgumentException] {
        withLogger(classOf[NotALogger].getName)(createOnce("tel_bad2"))
      }
      assert(e2.getMessage.contains("NotALogger") &&
        e2.getMessage.contains("not a"))
      // a bad logger never poisons the cache for a later good one
      withLogger()(createOnce("tel_good"))
      assert(RecordingEventLogger.drain()
        .exists(_.isInstanceOf[CreateActionEvent]))
    }
  }

  test("the rule-name taxonomy IndexUsageEvent.rules draws from is " +
      "pinned: renaming a rewrite rule or adding one must update this " +
      "vocabulary deliberately (ops dashboards key on these strings)") {
    assert(graft.index.rules.ScoreBasedOptimizer.ruleVocabulary.toSet ==
      Set("JoinIndexRule", "JoinOneSideIndexRule", "ExistsIndexRule",
        "AggIndexRule", "ZOrderFilterIndexRule", "FilterIndexRule",
        "DataSkippingRule"))
  }
}
