package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for file skipping — the write-side
  * optimization that makes selective scans cheap at 100 TB: parquet
  * footers carry per-file (and per-row-group) min/max statistics, and a
  * reader prunes every file whose range excludes the predicate. Sorting
  * by one column makes ITS ranges tight and every other column's ranges
  * full-width; interleaving the bits of two columns into a Z-order
  * (Morton) key and range-partition-sorting by it makes BOTH columns'
  * per-file ranges narrow — point/range predicates on either column (or
  * both) skip most files. The standard lakehouse `OPTIMIZE ZORDER BY`
  * shape, expressed as plain Spark: one range shuffle on the z-key,
  * sort within partitions, write.
  *
  * The z-value is pure bit arithmetic (codegen'd comparisons-free
  * Column expression), so it is deterministic across engines and
  * oracle-checkable. */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integral columns: x occupies even bit positions, y odd. `bits` ≤
    * 31 keeps the result in a positive long. Values wider than `bits`
    * contribute only their low bits (callers bucket or clamp first when
    * the domain is wider). */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column =
    zValue(Seq(x, y), bits)

  /** N-column Morton interleave: column j owns bit positions
    * j, j+n, j+2n, … — the layout key for up to `n · bits ≤ 63`-bit
    * keys (3 columns × 16 bits, 4 × 15, …). Same contract as
    * [[zValue2]]. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n >= 1, "need at least one column")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must fit a positive long: $n x $bits")
    val terms = cols.zipWithIndex.flatMap { case (c, j) =>
      val cl = c.cast("long")
      (0 until bits).map(i =>
        shiftleft(shiftrightunsigned(cl, i).bitwiseAND(lit(1L)), n * i + j))
    }
    terms.reduce(_ + _) // disjoint bits: addition == OR
  }

  /** Quantize a column to `bits` bits over its observed [lo, hi] domain
    * — interleaving RAW values makes z-order degenerate to a sort on
    * whichever column has more significant bits (a 7-bit key drowns
    * under an 11-bit one), so both dims map onto the same grid first;
    * this is what `range_partition_id`-based OPTIMIZE ZORDER
    * implementations do with range buckets. Double arithmetic so wide
    * long domains cannot overflow; layout keys need determinism, not
    * oracle-grade exactness. */
  private def quantize(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val buckets = 1L << bits
    val span = (hi - lo + 1).toDouble
    least(lit(buckets - 1),
      floor((c.cast("double") - lo.toDouble) / span * buckets.toDouble)
        .cast("long"))
  }

  /** Rewrite `df` into `numFiles` z-ordered files on (`xCol`, `yCol`):
    * quantize both columns to a common `bits`-bit grid (one min/max agg
    * for the domains), range-partition by the interleaved z-value (one
    * shuffle), sort within partitions, drop the key, write parquet.
    * Per-file min/max of BOTH columns come out narrow — the skipping
    * contract LayoutSpec pins. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles >= 1, s"numFiles must be positive: $numFiles")
    val row = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    val (xLo, xHi, yLo, yHi) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    df.withColumn("__z", zValue2(
        quantize(col(xCol), xLo, xHi, bits),
        quantize(col(yCol), yLo, yHi, bits), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
