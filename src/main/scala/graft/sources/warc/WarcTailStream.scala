package graft.sources.warc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.sources.jsonl.{JsonlSource, SerializableHadoopConf}

/** Continuous tail-ingest over an arriving crawl: segment files land in
  * the archive directory (the crawler's delivery pattern — one finished
  * `part-*.warc.gz` at a time) and each microbatch reads exactly the
  * NEW segments, through the same partition readers, pushdowns, and
  * framing contract as the batch scan.
  *
  * Offsets are segment FILE NAMES under lexicographic order — the
  * watermark is the highest name read. Each trigger: list the
  * directory (one RPC — the statuses were needed anyway), take every
  * file sorting strictly above the committed watermark, advance the
  * watermark to the highest taken. Offsets checkpoint as the plain
  * name, so a restarted query resumes from the committed segment.
  *
  * Delivery contract, mirroring [[graft.sources.es.EsTailStream]]'s
  * value-tailing caveat: segments must land ATOMICALLY (write
  * temp + rename — the committer discipline; a half-written segment
  * would fail framing mid-file) with names that sort ABOVE already
  * delivered ones (crawlers number segments for exactly this reason);
  * a late file sorting below the watermark is missed. Each segment is
  * read in precisely one microbatch — exactly-once per file.
  *
  * `option("start_after", name)` skips everything ≤ `name` (resume
  * into a directory with history already processed elsewhere).
  * `option("max_files_per_trigger", n)` is ADMISSION CONTROL
  * ([[SupportsAdmissionControl]]): a stream started against a 10k-file
  * backlog takes n segments per microbatch instead of the whole history
  * in one giant batch — progress checkpoints every n files, and a
  * restart mid-backfill loses at most one batch of work.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft-warc").load(archiveDir)
  *   .filter($"warc_type" === "response")  // pushed into the readers
  * }}}
  */
private[warc] class WarcTailStream(required: StructType, paths: Seq[String],
                                   pushed: Array[Filter],
                                   startAfter: String,
                                   maxFilesPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  // driver-side conf, shipped to executors per partition (batch-path
  // discipline); cached listing conf for the per-trigger probe
  private val hconf = JsonlSource.sessionHadoopConf()
  private val sconf = new SerializableHadoopConf(hconf)

  private def listNames(): Seq[(String, String)] = // (name, full path)
    paths.flatMap { p =>
      val path = new Path(p)
      JsonlSource.listFiles(path.getFileSystem(hconf), path)
        .map(f => f.getName -> f.toString)
    }.sortBy(_._1)

  override def initialOffset(): Offset = WarcTailOffset(startAfter)

  /** Non-admission path (the engine only calls this when
    * [[SupportsAdmissionControl]] is absent): everything available. */
  override def latestOffset(): Offset = {
    val names = listNames()
    WarcTailOffset(
      if (names.isEmpty) startAfter
      else Seq(startAfter, names.last._1).max)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Admission-controlled advance: the watermark moves past at most
    * `maxFiles` new segments per trigger, so a deep backlog drains in
    * checkpointed steps instead of one giant first batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[WarcTailOffset].name
    val fresh = listNames().map(_._1).filter(_ > s)
    val taken = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    WarcTailOffset(if (taken.isEmpty) s else taken.last)
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    WarcTailOffset(WarcTailOffset.parse(json))

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WarcTailOffset].name
    val e = end.asInstanceOf[WarcTailOffset].name
    listNames()
      .filter { case (n, _) => n > s && n <= e }
      .map { case (_, full) => WarcPartition(full, sconf): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, pushed, limit = None, countStar = false)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The committed watermark: the highest segment name read ("" = nothing
  * yet). Serialized as a JSON string — a bare empty line in the offset
  * log would be ambiguous. */
private[sources] final case class WarcTailOffset(name: String) extends Offset {
  override def json(): String =
    "\"" + name.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}

private[sources] object WarcTailOffset {
  def parse(json: String): String = {
    require(json.length >= 2 && json.head == '"' && json.last == '"',
      s"graft-warc offset: expected a JSON string, got '$json'")
    json.substring(1, json.length - 1)
      .replace("\\\"", "\"").replace("\\\\", "\\")
  }
}
