package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scan-parallelism floor for CPU-dense kernel passes (optimization
  * guide §2.5: "input skew: one huge unsplittable file … otherwise
  * repartition immediately after the read").
  *
  * The fixture tables are single parquet files with one row group, so
  * a scan of one is a single task no matter the split config (byte-
  * range splits hand a row group to the one task holding its
  * midpoint) — and the kernels this helper guards (shingling, MinHash,
  * BPE, winnowing, hashed features: seconds of CPU per MB) run INSIDE
  * that scan stage, serializing on one core while the rest of the
  * machine idles.
  *
  * Measured discipline (r18, full-bench pairs at sf0.1):
  *   - a blanket re-deal at the table-load door lost more than it won
  *     (189 s → 220 s total): the extra exchange costs ~0.1–0.2 s of
  *     stage/AQE overhead per query, pure loss for the ~85% of queries
  *     whose per-row work is cheap;
  *   - a `df.rdd.getNumPartitions` probe at kernel entries re-planned
  *     the caller's whole upstream per call (hundreds of ms on big
  *     pipeline plans) AND mis-fired on bucketed store tables (8
  *     buckets < cores), re-dealing the very layout the store-probe
  *     joins rely on for exchange-freeness.
  *
  * So the decision is STATIC, from the analyzed logical plan, and
  * deliberately conservative — widen only when the input is a narrow
  * chain (project/filter/generate/union) over UNBUCKETED file scans
  * whose total size cannot yield ~core-count row-group splits.
  * Mid-pipeline frames (joins, aggregates, checkpoints) and bucketed
  * stores are never touched; a production multi-file corpus estimates
  * >= core-count splits and is never re-shuffled. The only cost of a
  * wrong "no" is the status quo.
  */
object Par {

  private val RowGroupBytes = 128L * 1024 * 1024 // parquet.block.size default

  /** `df` re-dealt to session parallelism when it is a narrow chain
    * over small unbucketed file scans; identity otherwise, and always
    * identity for streaming frames or under
    * `spark.graft.kernel.widen=false`. */
  def widen(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    if (!spark.conf.get("spark.graft.kernel.widen", "true").toBoolean) return df
    val cores = spark.sparkContext.defaultParallelism
    scanSplits(df.queryExecution.analyzed) match {
      case Some(splits) if splits < math.max(1L, cores / 2L) =>
        df.repartition(cores)
      case _ => df
    }
  }

  /** Estimated scan parallelism IF `p` is a narrow chain over
    * unbucketed file relations: one split per started row group.
    * None = not that shape (or bucketed) — never widen. */
  private def scanSplits(p: LogicalPlan): Option[Long] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation if fs.bucketSpec.isEmpty =>
        Some(math.max(1L,
          (fs.location.sizeInBytes + RowGroupBytes - 1) / RowGroupBytes))
      case _ => None // bucketed store layouts are load-bearing
    }
    case r: Range =>
      Some(r.numSlices.map(_.toLong).getOrElse(Long.MaxValue))
    case u: Union =>
      val parts = u.children.map(scanSplits)
      if (parts.forall(_.isDefined)) Some(parts.flatten.sum) else None
    case _: Project | _: Filter | _: Generate | _: SubqueryAlias =>
      scanSplits(p.children.head)
    case _: Deduplicate =>
      // Deduplicate plans as an aggregate with its own exchange, so a
      // widen above it re-deals an AQE-coalesced frame rather than the
      // raw scan. INTENTIONAL: the kernels downstream of
      // dropDuplicates (segment/signature dedup) are exactly the
      // CPU-dense case the floor exists for, the post-dedup frame is
      // no larger than the scan the estimate came from, and the r18
      // full-bench pair that adopted this design measured it with
      // Deduplicate included (q136 1.70→1.06 s).
      scanSplits(p.children.head)
    case _ => None
  }
}
