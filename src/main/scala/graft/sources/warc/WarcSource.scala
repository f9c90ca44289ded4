package graft.sources.warc

import java.io.{EOFException, IOException, InputStream}
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.jsonl.{JsonlSource, SerializableHadoopConf}

/** DSv2 source over WARC crawl archives (ISO 28500 — the Common Crawl /
  * Internet Archive container a web-scale training pipeline actually
  * starts from): each input file is one input partition (the Common
  * Crawl layout is many ~1 GB segment files, so slices scale with the
  * archive exactly like the jsonl dump reader), records are parsed
  * STREAMING — header block, then the payload is read or SKIPPED by its
  * declared Content-Length, never a whole-file materialization — and
  * `.gz` files read each-record-its-own-gzip-member archives through
  * Java's multi-member `GZIPInputStream` (the Common Crawl framing;
  * plain concatenated-record files work identically).
  *
  * Fixed envelope schema — WARC is a container, not a document model:
  * `url, warc_type, warc_date, record_id, content_type, content_length,
  * http_status, body`. For `application/http` response payloads the
  * HTTP envelope is parsed off: `http_status` from the status line,
  * `body` = payload minus the header block (a malformed envelope keeps
  * the raw payload and a NULL status — log-and-keep, the reference's
  * "survive problematic data" stance, dump-es-parquet:112-183, applied
  * to the crawl container). Non-HTTP records (warcinfo, metadata,
  * resource) keep their raw payload as `body`.
  *
  * Pushdown, mirroring the jsonl/ES sources (SURVEY §2.1 P1–P3):
  *  - column pruning: an un-required `body` is SKIPPED byte-wise, never
  *    allocated — `select(url)` over 100 TB of archives reads headers
  *    only (plus decompression, which gzip owes us regardless);
  *  - `warc_type = 'response'` (and IN-lists) evaluate in-reader BEFORE
  *    payload work — the classic "responses only" crawl scan skips
  *    request/metadata payloads entirely; conservative contract: every
  *    filter is also returned residual, Spark re-checks above the scan;
  *  - limit pushdown stops each reader after N emitted records;
  *  - `count(*)` pushes as one partial-count row per file (headers
  *    parsed, payloads skipped, zero rows materialized);
  *  - real byte statistics so a small archive broadcasts in joins.
  *
  * Framing honesty: a record whose header block is unreadable (no
  * WARC/ version line, no parseable Content-Length) kills the file read
  * with the file named — after a framing loss the remaining bytes
  * cannot be trusted, and silently dropping the tail of a crawl segment
  * is how corpora lose mass invisibly. Records with intact framing but
  * missing optional headers emit NULLs.
  *
  * Usage: `spark.read.format("graft-warc").load(dirOrFile)`. The sink
  * half ([[graft.sinks.WarcSink]]) writes the same framing back.
  */
class WarcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-warc"
  override def supportsExternalMetadata(): Boolean = false

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    (single ++ multi).distinct
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    WarcSource.parseMaxFiles(options) // malformed options die at load time
    WarcSource.Schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(paths(new CaseInsensitiveStringMap(properties)))
}

object WarcSource {
  private[warc] val log = org.slf4j.LoggerFactory.getLogger(classOf[WarcSource])

  private[warc] def parseMaxFiles(
      options: CaseInsensitiveStringMap): Option[Int] =
    Option(options.get("max_files_per_trigger")).map { v =>
      val n = try v.toInt catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft-warc: max_files_per_trigger must be an int, got '$v'") }
      require(n >= 1,
        s"graft-warc: max_files_per_trigger must be >= 1, got $n")
      n
    }

  /** The fixed envelope schema (WARC is a container format).
    * `record_offset` is the record's SEEKABLE position in the file's
    * raw bytes — the byte offset of the `WARC/` version line for plain
    * archives, the compressed offset of the gzip MEMBER whose
    * decompression carries that line for `.gz` ones (= the record's own
    * member under the record-per-member framing the sink writes and
    * Common Crawl ships). `record_file` is the containing segment's
    * path (DSv2 scans don't feed `input_file_name()`, so the envelope
    * carries it). (url, record_file, record_offset) is therefore a
    * cc-index-style random-access key: open the file, seek, decode
    * exactly one record. Both prune away like any other column when not
    * required. */
  val Schema: StructType = StructType(Seq(
    StructField("url", StringType), // WARC-Target-URI (warcinfo: null)
    StructField("warc_type", StringType), // response/request/warcinfo/...
    StructField("warc_date", TimestampType), // WARC-Date, UTC
    StructField("record_id", StringType), // WARC-Record-ID
    StructField("content_type", StringType), // the WARC block's type
    StructField("content_length", LongType), // payload bytes (envelope incl.)
    StructField("http_status", IntegerType), // application/http only
    StructField("body", BinaryType), // HTTP-header-stripped payload
    StructField("record_offset", LongType), // seekable raw-byte position
    StructField("record_file", StringType))) // containing segment path
}

/** Raw-byte position bookkeeping for [[WarcParser]]: what file offset
  * does the NEXT byte handed to the parser correspond to — the
  * consumed-byte count for plain streams, the current/next gzip
  * MEMBER's compressed start for member streams (the seekable unit). */
private[warc] trait OffsetAware { def nextRecordOffset: Long }

/** Plain-file counting wrapper (single-threaded reader, plain long). */
private[warc] final class CountingInputStream(under: InputStream)
    extends InputStream with OffsetAware {
  private var n = 0L
  override def nextRecordOffset: Long = n
  override def read(): Int = {
    val b = under.read()
    if (b >= 0) n += 1
    b
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    val r = under.read(b, off, len)
    if (r > 0) n += r
    r
  }
  override def close(): Unit = under.close()
}

private[warc] class WarcTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft_warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths,
      Option(options.get("start_after")).getOrElse(""),
      WarcSource.parseMaxFiles(options))
}

private[warc] class WarcScanBuilder(paths: Seq[String], startAfter: String,
                                    maxFilesPerTrigger: Option[Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType = WarcSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var countStar = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  /** In-reader retention on the three header-only columns — a
    * non-matching record's payload is SKIPPED, not parsed:
    * `warc_type = 'response'` is the classic responses-only scan;
    * `url`/`record_id` equality and IN-lists are the REHYDRATION
    * workload ("fetch these N documents out of the archive" — a curated
    * id list re-reading its bodies pays header parsing plus the matched
    * payloads only). Conservative contract (the jsonl stance): all
    * filters also return residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val cols = Set("warc_type", "url", "record_id")
    pushed = filters.filter {
      case EqualTo(c, _: String) => cols(c)
      case In(c, vs) => cols(c) && vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Partial `count(*)`: one row per file, headers parsed, payloads
    * skipped — counting a 100 TB archive never allocates a body. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = false
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = pushed.isEmpty && limit.isEmpty &&
      agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions().head
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
    if (ok) {
      countStar = true
      required = StructType(Seq(StructField("count(*)", LongType, nullable = false)))
    }
    ok
  }

  override def build(): Scan =
    new WarcScan(required, paths, pushed, limit, countStar, startAfter,
      maxFilesPerTrigger)
}

private[warc] class WarcScan(required: StructType, paths: Seq[String],
                             pushed: Array[Filter], val pushedLimit: Option[Int],
                             val pushedCountStar: Boolean,
                             startAfter: String = "",
                             maxFilesPerTrigger: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcTailStream(required, paths, pushed, startAfter,
      maxFilesPerTrigger)

  override def description(): String =
    s"graft-warc PushedFilters=[${pushed.mkString(", ")}]" +
      pushedLimit.map(l => s" PushedLimit=$l").getOrElse("") +
      (if (pushedCountStar) " PushedAggregation=[COUNT(*)]" else "")

  private lazy val totalBytes: Long =
    try {
      val conf = JsonlSource.sessionHadoopConf()
      paths.map { p =>
        val path = new Path(p)
        JsonlSource.listStatuses(path.getFileSystem(conf), path).map(_.getLen).sum
      }.sum
    } catch { case _: Exception => Long.MaxValue }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(totalBytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = JsonlSource.sessionHadoopConf()
    val sconf = new SerializableHadoopConf(conf)
    paths.flatMap { p =>
      val path = new Path(p)
      JsonlSource.listFiles(path.getFileSystem(conf), path)
    }.map(f => WarcPartition(f.toString, sconf): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, pushed, pushedLimit, pushedCountStar)
}

private[warc] case class WarcPartition(file: String,
                                       conf: SerializableHadoopConf)
    extends InputPartition

private[warc] class WarcReaderFactory(required: StructType,
                                      pushed: Array[Filter],
                                      limit: Option[Int], countStar: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WarcPartition]
    if (countStar) new WarcCountReader(p.file, p.conf.value)
    else new WarcPartitionReader(required, p.file, pushed, p.conf.value, limit)
  }
}

/** One parsed record header block. `headers` keys are lowercased;
  * `offset` is the record's seekable raw-byte position (see
  * [[WarcSource.Schema]]'s `record_offset`). */
private[warc] final case class WarcHeader(headers: Map[String, String],
                                          contentLength: Long,
                                          offset: Long)

/** Streaming WARC framing over a raw InputStream: header lines are read
  * byte-at-a-time off a buffered stream (a Reader would over-read into
  * the payload), payloads are consumed by declared Content-Length. */
private[warc] object WarcParser {

  /** Reads one CRLF-terminated header line as ISO-8859-1 (header bytes
    * are ASCII by spec); null at EOF before any byte. */
  def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  /** Parses the next record's header block, skipping any blank
    * separator lines first. Returns null at clean EOF; throws on a
    * framing loss (non-WARC version line, missing/bad Content-Length)
    * — after that the remaining bytes cannot be trusted. */
  def nextHeader(in: InputStream, file: String): WarcHeader = {
    // capture the seekable position BEFORE the line that turns out to be
    // the version line — blank separator bytes belong to the previous
    // record (and, in member framing, to its member)
    def offNow: Long = in match {
      case o: OffsetAware => o.nextRecordOffset
      case _ => -1L
    }
    var off = offNow
    var line = readLine(in)
    while (line != null && line.isEmpty) { off = offNow; line = readLine(in) }
    if (line == null) return null
    if (!line.startsWith("WARC/"))
      throw new IOException(
        s"$file: WARC framing lost — expected a WARC/ version line, got " +
          s"'${line.take(40)}'")
    val headers = Map.newBuilder[String, String]
    var last: String = null // header-name of the previous line (folding)
    var prev = Map.empty[String, String]
    line = readLine(in)
    while (line != null && line.nonEmpty) {
      if ((line.startsWith(" ") || line.startsWith("\t")) && last != null) {
        // obs-fold continuation: append to the previous header's value
        prev = prev.updated(last, prev(last) + " " + line.trim)
      } else {
        val i = line.indexOf(':')
        if (i > 0) {
          last = line.substring(0, i).trim.toLowerCase
          prev = prev.updated(last, line.substring(i + 1).trim)
        }
        // a colon-less non-continuation line is ignored (framing is
        // still intact: the block ends at the blank line)
      }
      line = readLine(in)
    }
    if (line == null)
      throw new EOFException(s"$file: EOF inside a WARC header block")
    val len = prev.get("content-length").flatMap(_.toLongOption)
      .getOrElse(throw new IOException(
        s"$file: WARC record without a parseable Content-Length " +
          s"(record-id=${prev.getOrElse("warc-record-id", "?")}) — framing unknowable"))
    headers ++= prev
    WarcHeader(headers.result(), len, off)
  }

  /** Splits an `application/http` payload into (status, body): status
    * from the first line, body after the first CRLFCRLF. A malformed
    * envelope returns (None, whole payload) — log-and-keep. */
  def splitHttp(payload: Array[Byte]): (Option[Int], Array[Byte]) = {
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return (None, payload)
    val head = new String(payload, 0, split, "ISO-8859-1")
    val statusLine = head.takeWhile(_ != '\r').takeWhile(_ != '\n')
    val status =
      if (statusLine.startsWith("HTTP/"))
        statusLine.split(" ", 3).lift(1).flatMap(_.toIntOption)
      else None
    (status, java.util.Arrays.copyOfRange(payload, split + 4, payload.length))
  }

  def open(file: String, hconf: Configuration): InputStream = {
    val path = new Path(file)
    val fs = path.getFileSystem(hconf)
    val raw = graft.sources.Retry.withBackoff(attempts = 3, backoffMs = 100) {
      fs.open(path)
    }
    val buffered: InputStream =
      new CountingInputStream(new java.io.BufferedInputStream(raw, 1 << 16))
    // multi-member gzip (the Common Crawl record-per-member framing)
    // through the HONEST reader, not java.util.zip.GZIPInputStream:
    // that one swallows exceptions while probing for the next member
    // and reports a corrupt or truncated tail as clean EOF — exactly
    // the "corpora lose mass invisibly" failure the framing-honesty
    // contract exists to kill (which the uncompressed path already
    // enforces). GzipMembersStream throws, naming the file.
    if (file.endsWith(".gz")) new GzipMembersStream(buffered, file)
    else buffered
  }
}

/** Multi-member gzip decoder with FRAMING HONESTY (RFC 1952 headers and
  * trailers parsed explicitly): concatenated members read as one
  * continuous stream — the Common Crawl record-per-member layout — and
  * every deviation is an error naming the file instead of a silent
  * early EOF: bytes after a member that are not a gzip header (trailing
  * garbage / bit rot), EOF inside a header, deflate body, or trailer
  * (truncation), and CRC-32 / ISIZE trailer mismatches (corruption).
  * Clean EOF exists in exactly one place: the raw stream ends precisely
  * at a member boundary. Java's `GZIPInputStream` treats all of the
  * above as clean EOF — a crawl segment losing its tail invisibly.
  *
  * One 64 KiB input buffer shared between header/trailer parsing and
  * the Inflater (positions reconciled via `getRemaining` at member
  * end); allocation per member is one `Inflater.reset`, so the
  * per-record-member framing costs no per-member buffers. */
private[warc] final class GzipMembersStream(raw: InputStream, file: String)
    extends InputStream with OffsetAware {
  private val inf = new java.util.zip.Inflater(true) // nowrap: we frame
  private val crc = new java.util.zip.CRC32
  private val buf = new Array[Byte](1 << 16)
  private var pos = 0
  private var limit = 0
  private var inMember = false
  private var finished = false
  private val one = new Array[Byte](1)
  private var rawConsumed = 0L // raw bytes pulled off `raw` so far
  private var memberStart = 0L // current member's compressed offset

  /** Compressed offset of the next unconsumed raw byte. While a member
    * is being decompressed, bytes handed in from the window may sit in
    * the inflater — subtract its remaining to stay exact. */
  private def rawPos: Long =
    rawConsumed - (limit - pos) - (if (inMember) inf.getRemaining else 0)

  /** The seekable position of the member that will produce the NEXT
    * decompressed byte: the in-flight member's start, or (at a
    * boundary) the position where the next member begins. An exhausted
    * member settles first — its trailer bytes belong to it, the next
    * byte does not. */
  override def nextRecordOffset: Long = {
    if (inMember && inf.finished()) endMember()
    if (inMember) memberStart else rawPos
  }

  /** Ensures ≥1 buffered byte; false at raw EOF. Never refills while
    * the inflater still references the window (callers fill only when
    * `needsInput`, and member end reconciles `pos` first). */
  private def fill(): Boolean = {
    if (pos < limit) return true
    val n = raw.read(buf)
    if (n < 0) return false
    rawConsumed += n
    pos = 0; limit = n; true
  }
  private def u8(): Int = {
    if (!fill()) throw new EOFException(
      s"$file: gzip member truncated (EOF inside header or trailer)")
    val b = buf(pos) & 0xff; pos += 1; b
  }
  private def u16(): Int = u8() | (u8() << 8)
  private def u32(): Long = u16().toLong | (u16().toLong << 16)

  /** Parses the next member's header; false at clean EOF (raw stream
    * ends exactly at a member boundary). */
  private def startMember(): Boolean = {
    if (!fill()) return false
    memberStart = rawPos // the member's seekable compressed offset
    if (u8() != 0x1f || u8() != 0x8b)
      throw new IOException(
        s"$file: bytes after a gzip member are not a gzip header — " +
          "trailing garbage or corruption; refusing to drop the tail")
    if (u8() != 8) throw new IOException(
      s"$file: unsupported gzip compression method")
    val flg = u8()
    var i = 0
    while (i < 6) { u8(); i += 1 } // MTIME(4) XFL OS
    if ((flg & 4) != 0) { var n = u16(); while (n > 0) { u8(); n -= 1 } }
    if ((flg & 8) != 0) while (u8() != 0) () // FNAME
    if ((flg & 16) != 0) while (u8() != 0) () // FCOMMENT
    if ((flg & 2) != 0) u16() // FHCRC (header CRC not verified)
    inf.reset(); crc.reset(); inMember = true
    true
  }

  /** Verifies the member trailer (CRC-32 + ISIZE) after the deflate
    * stream finishes, reclaiming the inflater's unconsumed bytes. */
  private def endMember(): Unit = {
    pos = limit - inf.getRemaining
    val wantCrc = u32()
    val wantIsize = u32()
    if (wantCrc != crc.getValue)
      throw new IOException(s"$file: gzip member CRC mismatch — corrupt")
    if (wantIsize != (inf.getBytesWritten & 0xffffffffL))
      throw new IOException(s"$file: gzip member ISIZE mismatch — corrupt")
    inMember = false
  }

  override def read(): Int = {
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    while (!finished) {
      if (!inMember) {
        if (!startMember()) { finished = true; return -1 }
      } else if (inf.finished()) endMember()
      else {
        if (inf.needsInput()) {
          if (!fill()) throw new EOFException(
            s"$file: gzip member truncated (EOF mid-deflate)")
          inf.setInput(buf, pos, limit - pos)
          pos = limit // handed to the inflater; endMember reconciles
        }
        val n =
          try inf.inflate(b, off, len)
          catch {
            case e: java.util.zip.DataFormatException => throw new IOException(
              s"$file: corrupt deflate data in gzip member: ${e.getMessage}")
          }
        if (n > 0) { crc.update(b, off, n); return n }
        if (inf.finished()) endMember()
      }
    }
    -1
  }

  override def close(): Unit = {
    inf.end()
    raw.close()
  }
}

/** Pushed-count(*) reader: headers parsed, payloads skipped, one
  * partial-count row per file. */
private[warc] class WarcCountReader(file: String, hconf: Configuration)
    extends PartitionReader[InternalRow] {
  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    val in = WarcParser.open(file, hconf)
    var n = 0L
    try {
      var h = WarcParser.nextHeader(in, file)
      while (h != null) {
        in.skipNBytes(h.contentLength)
        n += 1
        h = WarcParser.nextHeader(in, file)
      }
    } finally in.close()
    row = new GenericInternalRow(Array[Any](n))
    done = true
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

private[warc] class WarcPartitionReader(required: StructType, file: String,
                                        pushed: Array[Filter],
                                        hconf: Configuration,
                                        limit: Option[Int])
    extends PartitionReader[InternalRow] {
  private val in = WarcParser.open(file, hconf)
  private val fileUtf8 = UTF8String.fromString(file) // one copy per reader
  private var current: InternalRow = _
  private var emitted = 0L

  // the in-reader retention sets per header column (None = keep all)
  private def keepSet(column: String): Option[Set[String]] = {
    val sets = pushed.collect {
      case EqualTo(`column`, v: String) => Set(v)
      case In(`column`, vs) => vs.collect { case s: String => s }.toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }
  private val keepTypes = keepSet("warc_type")
  private val keepUrls = keepSet("url")
  private val keepIds = keepSet("record_id")
  // payload work is skipped entirely unless a payload-derived column is
  // required — `select(url)` over an archive reads headers only
  private val needsPayload =
    required.fieldNames.exists(n => n == "body" || n == "http_status")

  @annotation.tailrec
  final override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false
    val h = WarcParser.nextHeader(in, file)
    if (h == null) return false
    val wtype = h.headers.get("warc-type").orNull
    def dropped(keep: Option[Set[String]], header: String): Boolean =
      keep.exists { k =>
        val v = h.headers.get(header).orNull
        v == null || !k.contains(v)
      }
    if (dropped(keepTypes, "warc-type") ||
        dropped(keepUrls, "warc-target-uri") ||
        dropped(keepIds, "warc-record-id")) {
      in.skipNBytes(h.contentLength) // filtered: payload never read
      next()
    } else {
      val payload: Array[Byte] =
        if (needsPayload) {
          if (h.contentLength > Int.MaxValue - 8)
            throw new IOException(
              s"$file: record payload ${h.contentLength} B exceeds a " +
                "single-array bound — split the archive")
          in.readNBytes(h.contentLength.toInt)
        } else { in.skipNBytes(h.contentLength); null }
      if (payload != null && payload.length < h.contentLength)
        throw new EOFException(
          s"$file: truncated payload (${payload.length} of " +
            s"${h.contentLength} B, record-id=" +
            s"${h.headers.getOrElse("warc-record-id", "?")})")
      val ctype = h.headers.get("content-type").orNull
      val isHttp = ctype != null &&
        ctype.toLowerCase.startsWith("application/http")
      lazy val (status, body) =
        if (payload == null) (None, null)
        else if (isHttp) WarcParser.splitHttp(payload)
        else (None, payload)
      val values = required.fieldNames.map {
        case "url" => utf8(h.headers.get("warc-target-uri").orNull)
        case "warc_type" => utf8(wtype)
        case "warc_date" => h.headers.get("warc-date").flatMap(parseTs).orNull
        case "record_id" => utf8(h.headers.get("warc-record-id").orNull)
        case "content_type" => utf8(ctype)
        case "content_length" => java.lang.Long.valueOf(h.contentLength)
        case "http_status" => status.map(Integer.valueOf).orNull
        case "body" => body
        case "record_offset" =>
          if (h.offset < 0) null else java.lang.Long.valueOf(h.offset)
        case "record_file" => fileUtf8
        case other => throw new IllegalStateException(
          s"graft-warc: unknown required column '$other'")
      }
      current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
      emitted += 1
      true
    }
  }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** WARC-Date (ISO-8601 UTC) → micros; unparseable → NULL (the
    * envelope survives a sloppy date; framing did not depend on it). */
  private def parseTs(s: String): Option[java.lang.Long] =
    try {
      val inst = java.time.Instant.parse(s)
      Some(java.lang.Long.valueOf(inst.getEpochSecond * 1000000L +
        inst.getNano / 1000L))
    } catch { case _: java.time.format.DateTimeParseException => None }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
