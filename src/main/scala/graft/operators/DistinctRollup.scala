package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count ROLLUP state — HLL sketches as data: build per-group
  * sketches once, STORE them (a binary column in any table), then
  * answer "how many distinct X" for any coarser grouping by merging
  * sketches — without ever re-touching the raw rows. The pattern a
  * 100 TB ingest needs for dashboard-grade distinct counts: per
  * day/source sketch at ingest time (one pass), arbitrary-range
  * distinct counts later at sketch-merge cost (registers, not rows).
  *
  * Built on Spark's DataSketches HLL aggregates (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`): codegen'd, map-side
  * combined, no RNG. One honesty note, measured (DistinctRollupSpec):
  * the ESTIMATE is not bit-stable across aggregation paths — a union
  * of stored sketches and a direct build over the same rows, or the
  * same build under a different partition layout, can differ by a few
  * counts (DataSketches' union gadget promotes sketches through a
  * different representation than a straight build). Every path stays
  * inside the standard HLL band (~1.04/√2^lgK relative at default
  * lgK 12 → ~1.6% σ), which is why consumers gate estimates within
  * the band (q201's booleans) instead of pinning values. The
  * exact-distinct pass ([[Dedup]] fingerprints, `countDistinct`)
  * remains the right tool when a report pins numbers — this is the
  * monitoring/rollup tool, the [[graft.functions.CmSketch]] discipline
  * applied to distinct counting.
  */
object DistinctRollup {

  /** One row per `groupCols` group with an `hll` sketch column over
    * `valueCol` (nulls contribute nothing) — the storable state. */
  def sketchBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
               lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21]: $lgK")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))
  }

  /** Merge stored sketches down to a coarser grouping (empty
    * `groupCols` = one global row). Sketch-sized work only. */
  def rollup(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    if (groupCols.isEmpty) sketches.agg(hll_union_agg(col("hll")).as("hll"))
    else sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))

  /** Distinct-count estimate from a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)
}
