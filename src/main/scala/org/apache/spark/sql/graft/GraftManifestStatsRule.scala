package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Attaches a snapshot table's manifest-derived catalog statistics
  * (exact row count, null counts, avg widths, KMV NDV) to relations
  * that reached the plan through doorways the library does not build
  * itself — `CREATE TABLE ... USING` and `spark.read.format(...)`,
  * where SPARK constructs the `LogicalRelation` (with a metastore
  * `CatalogTable` that has no stats unless someone ran ANALYZE). The
  * stats ride the manifest-backed `FileIndex`
  * ([[graft.sources.SnapshotTable.ManifestCatalogCarrier]]); this rule
  * copies them onto the node so `computeStats` serves
  * `Statistics(rowCount, attributeStats)` under
  * `spark.sql.cbo.planStats.enabled` — the SQL user's joins then pick
  * broadcast-vs-shuffle from real cardinalities, same as the library
  * API path. A `CatalogTable` that ALREADY carries stats (ANALYZE ran)
  * is left alone.
  *
  * Runs as an optimizer rule (user-provided batch): every use of the
  * leaf's statistics — physical join selection included — happens
  * after optimization, so placement at the end of the optimizer is
  * early enough. */
object GraftManifestStatsRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case lr @ LogicalRelation(rel: HadoopFsRelation, _, ct, _, _)
        if ct.forall(_.stats.isEmpty) =>
      rel.location match {
        case c: graft.sources.SnapshotTable.ManifestCatalogCarrier =>
          c.graftCatalog match {
            case Some(g) =>
              lr.copy(catalogTable =
                Some(ct.map(_.copy(stats = g.stats)).getOrElse(g)))
            case None => lr
          }
        case _ => lr
      }
  }

  /** Idempotently install on a session's user-optimizer batch — the
    * doorway for sessions built without `spark.sql.extensions`
    * (library callers, tests). Extension-configured sessions get it
    * via `GraftExtensions.injectOptimizerRule`. */
  def install(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(this))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ this
}
