package org.apache.spark.sql.graftshim

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.{FileStatusCache, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The DSv2 read path for snapshot tables — what lets
  * `spark.sql("SELECT … FROM graft.\`/path\` VERSION AS OF 3")` plan
  * exactly like the Scala-API [[LogFileIndex]] scan: the log entry
  * already knows every file's NAME and SIZE, so the index is built
  * from those pairs (no listing, no per-file getFileStatus, no footer
  * read when the schema is logged) and handed to Spark's own
  * `ParquetScanBuilder` — everything downstream is the stock DSv2
  * parquet scan: filter pushdown, column pruning, vectorized reading,
  * `maxPartitionBytes` split math off the logged sizes.
  *
  * Lives beside [[LogFileIndex]] in the `org.apache.spark.sql`
  * namespace because `ParquetScanBuilder`/`PartitioningAwareFileIndex`
  * are `sql`-internal — the same conventional connector seam. */
object SnapshotScanShim {

  def scanBuilder(spark: SparkSession, root: String,
                  files: Seq[(String, Long, graft.sinks.Snapshots.FileStats)],
                  dataSchema: StructType,
                  options: CaseInsensitiveStringMap): ScanBuilder = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(cs.sessionState.newHadoopConf())
    val qualRoot = fs.makeQualified(rootPath)
    val entries = files.map { case (name, len, stats) =>
      // mtime/blocksize fabricated (0 / 128 MB) as in LogFileIndex:
      // nothing in the parquet read path consults them; length drives
      // the split math, which is why logged sizes must be real
      (new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L,
        fs.makeQualified(new Path(rootPath, name))), stats)
    }
    val statuses = entries.map(_._1)
    val index = new PartitioningAwareFileIndex(
      cs, Map.empty, Some(dataSchema), FileStatusCache.getOrCreate(cs)) {
      override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
      override val leafFiles: mutable.LinkedHashMap[Path, FileStatus] =
        mutable.LinkedHashMap(statuses.map(s => s.getPath -> s): _*)
      override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
        statuses.groupBy(_.getPath.getParent)
          .map { case (d, fss) => d -> fss.toArray }
      override def rootPaths: Seq[Path] = Seq(qualRoot)
      override def refresh(): Unit = ()
      // DATA SKIPPING for the SQL path: FileScan hands the pushed data
      // filters here; files whose logged bounds provably exclude them
      // are dropped (sound keep-if-unknown — the scan re-applies the
      // predicate), so a filtered SQL query over a clustered snapshot
      // table reads only the files its range hits
      override def listFiles(partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                             dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
          : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] = {
        val kept =
          if (dataFilters.isEmpty) statuses.toArray
          else entries.collect {
            case (st, stats) if graft.sinks.StatsPruning.mayMatchAll(
              stats, dataFilters) => st
          }.toArray
        Seq(org.apache.spark.sql.execution.datasources.PartitionDirectory(
          org.apache.spark.sql.catalyst.InternalRow.empty, kept))
      }
    }
    ParquetScanBuilder(cs, index, dataSchema, dataSchema, options)
  }
}
