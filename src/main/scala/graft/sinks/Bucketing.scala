package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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
    // Pre-shuffle on the bucket key into exactly `buckets` partitions:
    // repartition and bucketBy share the same murmur3-pmod assignment, so
    // each task then writes exactly ONE bucket file. Without this every
    // input task emits a file per bucket it happens to see — tasks×buckets
    // small files at cluster scale — and the scan side loses the
    // one-file-per-bucket precondition for sorted bucket reads.
    // A managed-table location can outlive the in-memory catalog (the
    // warehouse dir persists across JVMs); saveAsTable refuses to write
    // over a location the catalog doesn't own, so clear orphans first.
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) fs.delete(wh, true)
    }
    val keyed = df.repartition(buckets, bucketCols.map(col): _*)
    val w = keyed.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.isEmpty) w.sortBy(bucketCols.head, bucketCols.tail: _*)
      else w.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.format("parquet").saveAsTable(table)
  }
}
