package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed table layout for co-located joins (SURVEY.md §7.0 scale
  * posture).
  *
  * A fact-to-fact join (e.g. lineitem ⋈ orders on orderkey) shuffles BOTH
  * sides on every query. Writing each table bucketed by the join key
  * moves that shuffle to write time, once: both sides land hash-
  * partitioned into the same number of buckets, and every subsequent join
  * on the bucket key is exchange-free (sort-merge over matching buckets).
  * At 100 TB this converts the dominant recurring network cost of the
  * star-schema workload into a one-time layout decision — the same
  * reasoning behind the session's 64 MB broadcast threshold for dims,
  * applied to the fact tables that can never broadcast.
  *
  * Buckets also bound file sizes (work with `maxRecordsPerFile`) and give
  * bucket pruning on equality filters over the bucket key.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. `buckets` should be
    * sized so one bucket of the LARGEST co-bucketed table fits an
    * executor's task comfortably (at cluster scale: thousands). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.isEmpty) w.sortBy(bucketCols.head, bucketCols.tail: _*)
      else w.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.format("parquet").saveAsTable(table)
  }
}
