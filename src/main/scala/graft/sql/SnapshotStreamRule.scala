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

/** SQL reads of COLUMN-MAPPED (renamed) snapshot tables (r18): the
  * stock DSv2 parquet scan matches columns by NAME, so a renamed
  * column would read NULL from files that store the physical name.
  * This resolution rule replaces the relation over a mapped
  * [[SnapshotTable]] with the Scala read path's plan (which applies
  * the physical→logical projection), re-aliased onto the ORIGINAL
  * relation's output attribute ids so every reference above resolves
  * unchanged — the exprId-preserving swap Delta's DeltaAnalysis uses
  * for the same problem. Unmapped tables keep the zero-IO
  * SnapshotScanShim path untouched. */
class SnapshotMappedReadRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.Project
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[SnapshotTable] &&
            r.table.asInstanceOf[SnapshotTable].isColumnMapped =>
        val t = r.table.asInstanceOf[SnapshotTable]
        val mapped = graft.sinks.Snapshots
          .read(spark, t.dir, Some(t.snap.version))
          .queryExecution.analyzed
        Project(r.output.zip(mapped.output).map { case (old, nu) =>
          Alias(nu, old.name)(exprId = old.exprId)
        }, mapped)
    }
}

/** One-line extensions entry point for sessions not built through
  * [[graft.GraftSession]]:
  * `--conf spark.sql.extensions=graft.sql.GraftExtensions` alongside
  * `spark.sql.catalog.<name>=graft.sql.SnapshotCatalog` — functions +
  * the streaming-table and mapped-read rules, the same injection
  * GraftSession does. */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.inject(ext)
    ext.injectResolutionRule(new SnapshotStreamRule(_))
    ext.injectResolutionRule(new SnapshotMappedReadRule(_))
  }
}
