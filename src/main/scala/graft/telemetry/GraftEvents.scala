package graft.telemetry

import graft.index.{IndexConfig, IndexLogEntry}

/**
 * Typed telemetry events for every index action and for index usage at
 * query time (reference: telemetry/HyperspaceEvent.scala:49-166 — one
 * case class per action verb plus the usage event, re-derived with the
 * repo's own metadata types as payloads).
 *
 * Events are plain immutable case classes so a subscriber can pattern
 * match, serialize, or forward them without reflection. Every event
 * carries [[AppInfo]] (who/where) and a human-readable message; action
 * events carry the resulting [[IndexLogEntry]] — the post-transition
 * log state an audit trail wants, not the request.
 */
case class AppInfo(sparkUser: String, appId: String, appName: String)

sealed trait GraftEvent {
  def appInfo: AppInfo
  def message: String
}

/** Index CRUD / maintenance action events (one per action FSM verb). */
sealed trait GraftIndexCrudEvent extends GraftEvent

/** Emitted on index creation. `index` is None when create failed before
  * an entry could be written (e.g. invalid config). */
case class CreateActionEvent(
    appInfo: AppInfo,
    indexConfig: IndexConfig,
    index: Option[IndexLogEntry],
    originalPlan: String,
    message: String) extends GraftIndexCrudEvent

case class DeleteActionEvent(
    appInfo: AppInfo, index: IndexLogEntry, message: String)
  extends GraftIndexCrudEvent

case class RestoreActionEvent(
    appInfo: AppInfo, index: IndexLogEntry, message: String)
  extends GraftIndexCrudEvent

/** Hard delete of a soft-deleted index. */
case class VacuumActionEvent(
    appInfo: AppInfo, index: IndexLogEntry, message: String)
  extends GraftIndexCrudEvent

/** Outdated-version cleanup of an ACTIVE index. */
case class VacuumOutdatedActionEvent(
    appInfo: AppInfo, index: IndexLogEntry, message: String)
  extends GraftIndexCrudEvent

/** Full refresh. */
case class RefreshActionEvent(
    appInfo: AppInfo, index: IndexLogEntry, message: String)
  extends GraftIndexCrudEvent

case class RefreshIncrementalActionEvent(
    appInfo: AppInfo, index: IndexLogEntry, message: String)
  extends GraftIndexCrudEvent

case class RefreshQuickActionEvent(
    appInfo: AppInfo, index: IndexLogEntry, message: String)
  extends GraftIndexCrudEvent

case class OptimizeActionEvent(
    appInfo: AppInfo, index: IndexLogEntry, message: String)
  extends GraftIndexCrudEvent

/** In-flight action rolled back to the last stable state. */
case class CancelActionEvent(
    appInfo: AppInfo, index: IndexLogEntry, message: String)
  extends GraftIndexCrudEvent

/** Emitted when the optimizer rule serves a query from one or more
  * indexes (reference: HyperspaceIndexUsageEvent,
  * HyperspaceEvent.scala:149-166). Beyond the reference, `rules` names
  * WHICH rewrite mechanisms served (FilterIndexRule / JoinIndexRule /
  * JoinOneSideIndexRule / ExistsIndexRule / AggIndexRule /
  * ZOrderFilterIndexRule / DataSkippingRule) — per-rule hit rates are
  * what an ops team tunes an index corpus against. */
case class IndexUsageEvent(
    appInfo: AppInfo,
    indexes: Seq[String],
    rules: Seq[String],
    planBeforeRule: String,
    planAfterRule: String,
    message: String) extends GraftEvent
