package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

import graft.sinks.Snapshots.FileStats
import graft.sinks.StatsPruning

/** The zero-filesystem-call scan a snapshot log makes possible — the
  * Delta TahoeLogFileIndex idea in miniature: the log entry already
  * knows every file's NAME, SIZE, and (since r17) per-column BOUNDS,
  * so the plan needs no directory listing, no per-file
  * `getFileStatus`, and (with the logged schema) no footer read. This
  * builds a [[FileIndex]] straight from the entry's rows and plans it
  * through the ordinary parquet `FileFormat` path, so everything
  * downstream is stock Spark: FileSourceScanExec, filter pushdown,
  * column pruning, whole-stage codegen, `maxPartitionBytes` splitting
  * (which is WHY the sizes must be real — split math reads
  * `FileStatus.getLen`).
  *
  * DATA SKIPPING: `listFiles` receives the query's data filters and
  * drops files whose logged bounds provably exclude them
  * ([[graft.sinks.StatsPruning.mayMatch]] — sound keep-if-unknown), so
  * `Snapshots.read(dir).where($"id" < 100)` on a clustered table scans
  * only the files the range hits, with no explicit prunedRead call.
  * The scan re-applies the predicate; skipping only saves IO.
  *
  * Lives in the `org.apache.spark.sql` namespace beside
  * [[StreamingFrame]] because the datasource plumbing
  * (`HadoopFsRelation`, `PartitionDirectory`) is `private[sql]`-scoped
  * internals — the same conventional connector seam. */
object LogFileIndex {
  def frame(root: String, files: Seq[(String, Long, FileStats)],
            dataSchema: StructType,
            spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(cs.sessionState.newHadoopConf())
    val entries = files.map { case (name, len, stats) =>
      // mtime/blocksize are fabricated (0 / 128 MB): nothing in the
      // parquet read path consults them; length drives the split math
      (new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L,
        fs.makeQualified(new Path(rootPath, name))), stats)
    }
    val statuses = entries.map(_._1).toArray
    val index = new FileIndex {
      override def rootPaths: Seq[Path] = Seq(fs.makeQualified(rootPath))
      override def listFiles(partitionFilters: Seq[Expression],
                             dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
        val kept =
          if (dataFilters.isEmpty) statuses
          else entries.collect {
            case (st, stats) if StatsPruning.mayMatchAll(stats, dataFilters) =>
              st
          }.toArray
        Seq(PartitionDirectory(InternalRow.empty, kept))
      }
      override def inputFiles: Array[String] = statuses.map(_.getPath.toString)
      override def refresh(): Unit = ()
      override def sizeInBytes: Long = files.map(_._2).sum
      override def partitionSchema: StructType = new StructType()
    }
    cs.baseRelationToDataFrame(HadoopFsRelation(
      index, new StructType(), dataSchema, None,
      new ParquetFileFormat, Map.empty)(cs))
  }
}
