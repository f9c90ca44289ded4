package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum — a running total in global `orderCol` order
  * WITHOUT the single-task trap.
  *
  * The naive form, `sum(v) over (order by o)`, has an empty partition
  * spec: Spark funnels the ENTIRE dataset through one task. This is the
  * classic two-pass scan instead:
  *
  *   1. range-partition by `orderCol` (so partition i holds keys below
  *      partition i+1's), then materialize ONCE (`localCheckpoint`) —
  *      range boundaries come from sampling, so the frame must be pinned
  *      for the partition ids to be consistent across the two reads;
  *   2. per-partition subtotals (tiny: one row per partition) get their
  *      exclusive running offsets on a single-task window over that tiny
  *      frame — bounded by partition COUNT, not data;
  *   3. offsets broadcast back; each partition computes its interior
  *      running sum locally.
  *
  * Cost: one full shuffle + one materialization; every per-row stage is
  * partition-local. The price of correctness at 100 TB is the
  * materialization, not a single-task sort.
  *
  * The use case this ships for is sequence packing (training shards cut
  * at a token budget): see [[packIntoShards]].
  */
object Prefix {

  /** Adds `outCol` = running sum of `valueCol` in ascending `orderCol`
    * order (inclusive of the current row). Ties in `orderCol` are broken
    * arbitrarily but consistently within the run; use a unique order
    * column for fully deterministic output. */
  def cumsum(df: DataFrame, orderCol: String, valueCol: String,
             outCol: String): DataFrame = {
    val ranged = df.repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin sampled range boundaries + partition ids
    val subtotals = ranged.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__psum"))
    // one row per partition — the only unpartitioned window, and it is
    // bounded by the partition count
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtotals
      .withColumn("__offset", coalesce(sum(col("__psum")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val wIn = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    ranged.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__offset") + sum(col(valueCol)).over(wIn))
      .drop("__pid", "__offset")
  }

  /** Sequence packing: assign each row the shard in which its token run
    * STARTS, cutting shards at `budget` tokens — greedy first-fit in
    * `orderCol` order, the standard pre-tokenization shard layout for
    * training data. shard = floor(exclusive_prefix / budget). */
  def packIntoShards(df: DataFrame, orderCol: String, tokenCol: String,
                     budget: Long, shardCol: String = "shard"): DataFrame =
    cumsum(df, orderCol, tokenCol, "__cum")
      .withColumn(shardCol,
        floor((col("__cum") - col(tokenCol)) / lit(budget)).cast("long"))
      .drop("__cum")
}
