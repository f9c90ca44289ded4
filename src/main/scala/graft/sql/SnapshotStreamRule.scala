package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2

/** `spark.readStream.table("graft.t")` (r18): the analyzer resolves a
  * streaming read of a catalog table to a `StreamingRelationV2` over
  * the loaded [[SnapshotTable]]; this resolution rule swaps that node
  * for the V1 `graft-cdc` relation on the table's directory — so the
  * streaming read of a snapshot table IS its change feed, byte-equal
  * to [[graft.sinks.Snapshots.readChangesStream]] by path. The Delta
  * device (DeltaAnalysis does exactly this for DeltaSource), used for
  * the same reason: the CDC micro-batch algebra is a distributed plan
  * only a V1 `Source` can hand the engine per trigger.
  *
  * Options pass through from `readStream.option(...)`:
  * `startingVersion` (default 0 — the full history as one catch-up)
  * and `maxVersionsPerTrigger` (admission control). Injected by
  * [[graft.GraftSession]]; foreign sessions set
  * `spark.sql.extensions=graft.sql.GraftExtensions` next to the
  * catalog config — the Delta deployment pair. */
class SnapshotStreamRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case r: StreamingRelationV2 if r.table.isInstanceOf[SnapshotTable] =>
        val dir = r.table.asInstanceOf[SnapshotTable].dir
        val passthrough = Seq("startingVersion", "maxVersionsPerTrigger")
          .flatMap(k => Option(r.extraOptions.get(k)).map(k -> _))
        org.apache.spark.sql.graftshim.StreamingRelationShim.v1Relation(
          spark, "graft-cdc", Map("path" -> dir) ++ passthrough)
    }
}

/** One-line extensions entry point for sessions not built through
  * [[graft.GraftSession]]:
  * `--conf spark.sql.extensions=graft.sql.GraftExtensions` alongside
  * `spark.sql.catalog.<name>=graft.sql.SnapshotCatalog` — functions +
  * the streaming-table rule, the same injection GraftSession does. */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.inject(ext)
    ext.injectResolutionRule(new SnapshotStreamRule(_))
  }
}
