package graft.sinks

import java.io.OutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.time.format.DateTimeFormatter
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** WARC writer — the sink half of [[graft.sources.warc.WarcSource]]:
  * serializes a frame of fetched documents back into ISO 28500 response
  * records, one `part-NNNN.warc[.gz]` file per partition (the
  * distributed shape: each task streams its own archive segment, no
  * driver funnel; partition count = `df`'s, so callers size segments
  * with `repartition`). Gzip mode writes EACH RECORD AS ITS OWN GZIP
  * MEMBER — the Common Crawl framing, so a future range-splitting
  * reader can seek to member boundaries; Java's GZIP header is written
  * with MTIME=0, making the bytes deterministic for a deterministic
  * input order (pair with `sortWithinPartitions`).
  *
  * COMMITTED LANDING — the [[graft.sources.warc.WarcTailStream]]
  * delivery contract this sink must satisfy to feed its own tail, both
  * halves: each task streams into a DOT-PREFIXED in-progress name
  * (`.part-NNNN.warc[.gz].inprogress-<task-attempt>`, invisible to
  * every graft listing — the `_`/`.` hidden-file rule), then the DRIVER
  * renames completed temps to their final names in ASCENDING segment
  * order as the job's commit point. Atomic renames mean no reader ever
  * sees a half-written segment; the ascending order means a concurrent
  * tail's filename watermark can never advance past a segment that
  * hasn't landed yet (task completion order is arbitrary — commit order
  * is not); and a job that dies pre-commit leaves only hidden temps,
  * all-or-nothing. Speculative or zombie attempts stay on their own
  * attempt-suffixed temps, swept after the commit. Overwrite cleanup is
  * per-FILE so the directory inode survives a rewrite — a live tail
  * never races a vanished directory.
  *
  * WARC-Date is formatted from the timestamp's INSTANT
  * (`DateTimeFormatter.ISO_INSTANT`), independent of
  * `spark.sql.session.timeZone` — a non-UTC session writes the same
  * bytes as a UTC one. Sub-second timestamps emit fractional digits
  * rather than silently truncating, so any input round-trips
  * bit-exactly through the source's `Instant.parse`; second-aligned
  * inputs keep the classic `…T00:00:00Z` form. The record's VERSION
  * LINE tracks the date's precision: fractional dates are a WARC/1.1
  * feature (ISO 28500:2009 mandates whole seconds), so a record
  * carrying one declares `WARC/1.1` and a second-aligned record stays
  * `WARC/1.0` — a strict 1.0 validator never sees a 1.0 record it
  * must reject (the version line is PER RECORD in WARC; mixed-version
  * files are the format's norm, and the source accepts any `WARC/`).
  *
  * Segment names are `part-NNNN…` zero-padded to the JOB'S OWN width
  * (4 digits up to 10k partitions, wider beyond), so within a commit
  * the lexicographic order every tail watermarks by IS the partition
  * order — `part-10000` after `part-09999`, never between `part-1000`
  * and `part-1001`. The pre-write cleanup matches any width
  * (`part-\d{4,}`), so a rerun at a narrower width still sweeps a
  * wider predecessor's segments.
  *
  * Input contract (checked up front): `url` string, `warc_date`
  * timestamp, `record_id` string, `http_status` int, `body` binary.
  * Each row becomes one `WARC-Type: response` record whose payload is
  * an HTTP response envelope (status line + Content-Type +
  * Content-Length + CRLF) followed by the body — exactly what the
  * source's `splitHttp` strips back off, so write→read round-trips
  * bit-exactly (WarcSourceSpec pins it; q210 pins it cross-engine).
  *
  * `warcinfo = true` opens each segment with a `WARC-Type: warcinfo`
  * leader record (the Common Crawl / Internet Archive convention:
  * provenance travels INSIDE the archive) naming the writing software,
  * the format, and the segment file; its WARC-Date is the segment's
  * first response date — deterministic, no wall-clock in the bytes.
  * The source parses it back like any record; a responses-only
  * pushdown skips it without payload work.
  *
  * Returns the per-file manifest `(file, n_records, n_bytes)` —
  * `n_records` counts RESPONSE records (the rows written; the warcinfo
  * leader is framing, not data) — the write is the action, the
  * manifest certifies it (the ShardWriter discipline).
  */
object WarcSink {

  private val Required = Seq("url", "warc_date", "record_id",
    "http_status", "body")

  def write(df: DataFrame, dir: String, gzip: Boolean = false,
            httpContentType: String = "text/plain; charset=utf-8",
            warcinfo: Boolean = false):
      DataFrame = {
    val spark = df.sparkSession
    Required.foreach(c => require(df.columns.contains(c),
      s"WarcSink.write: column '$c' required " +
        s"(has: ${df.columns.sorted.mkString(", ")})"))
    require(!httpContentType.exists(c => c == '\r' || c == '\n'),
      "WarcSink.write: httpContentType must not contain CR/LF")
    val hconf = new graft.sources.jsonl.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val ext = if (gzip) ".warc.gz" else ".warc"
    // overwrite semantics: a retried job converges on the same files.
    // Per-FILE cleanup, not a directory delete — the directory inode
    // stays alive throughout, so a tail or scan listing it mid-write
    // never races a vanished directory; stale segments from a wider
    // previous run (more partitions, or the other compression) and any
    // crashed-attempt in-progress debris go here, at the driver, before
    // any task writes
    locally {
      val p = new Path(dir)
      val fs = p.getFileSystem(hconf.value)
      if (fs.exists(p)) {
        fs.listStatus(p).foreach { st =>
          val n = st.getPath.getName
          // \d{4,}: a previous run with >=10k partitions wrote wider
          // names — its stale segments must not survive a narrower rerun
          if (st.isFile && (n.matches("part-\\d{4,}\\.warc(\\.gz)?") ||
              n.startsWith(".") && n.contains(".inprogress-")))
            fs.delete(st.getPath, false)
        }
      } else fs.mkdirs(p)
    }
    val rows = df.select(
      col("url").cast("string"),
      col("warc_date").cast("timestamp"),
      col("record_id").cast("string"),
      col("http_status").cast("int"),
      col("body").cast("binary"))
    import spark.implicits._
    // zero-pad width sized to THIS job's partition count (>=4): names
    // stay uniform-width, so the lexicographic order the tail
    // watermarks by equals the numeric partition order even past 10k
    // partitions (f"%04d" alone would sort part-10000 before part-9999
    // and break the ascending-landing contract)
    val width = padWidth(rows.rdd.getNumPartitions)
    // tasks stream into HIDDEN attempt-suffixed temps and return the
    // pending (pid, temp, final) triple — one row per non-empty
    // partition, bounded driver state like every manifest
    val pending = rows.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val name = s"part-%0${width}d".format(pid) + ext
      // hidden while in flight: the leading dot keeps every graft
      // listing (batch scan, tail, manifest) blind to it until the
      // commit rename; the attempt suffix keeps speculative attempts
      // on their own files
      val tmp = new Path(s"$dir/.$name.inprogress-${tc.taskAttemptId()}")
      val fs = tmp.getFileSystem(hconf.value)
      var n = 0L
      val out = fs.create(tmp, true)
      var ok = false
      try {
        it.foreach { r =>
          if (n == 0 && warcinfo)
            writeRecord(out, gzip, warcinfoRecord(name, r.get(1)))
          writeRecord(out, gzip, record(r, httpContentType))
          n += 1
        }
        out.close()
        ok = true
      } finally {
        try out.close() catch { case _: Exception => () }
        if (!ok || n == 0) fs.delete(tmp, false) // failure/empty: no debris
      }
      if (n == 0) Iterator.empty
      else Iterator.single((pid, tmp.toString, name, n,
        fs.getFileStatus(tmp).getLen))
    }.collect()
    // COMMIT POINT — driver-side renames in ASCENDING segment order,
    // the two halves of the tail's delivery contract at once: each
    // rename is atomic (no reader ever sees a half-written segment) and
    // lower names land strictly before higher ones (a tail's watermark
    // can never advance past a segment that hasn't landed yet). A job
    // that dies before this point leaves only hidden temps — readers
    // see nothing, all-or-nothing like a committer
    locally {
      val p = new Path(dir)
      val fs = p.getFileSystem(hconf.value)
      // ascending by PARTITION ID, not name: uniform-width names make
      // the two orders identical, but the numeric key can't be broken
      // by a width surprise
      pending.sortBy(_._1).foreach { case (_, tmp, name, _, _) =>
        val target = new Path(s"$dir/$name")
        if (fs.exists(target)) fs.delete(target, false) // retried job
        if (!fs.rename(new Path(tmp), target))
          throw new java.io.IOException(
            s"WarcSink: rename $tmp -> $target failed")
      }
      // sweep temps from lost speculative/zombie attempts
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && n.startsWith(".") && n.contains(".inprogress-"))
          fs.delete(st.getPath, false)
      }
    }
    spark.createDataFrame(pending.toSeq
      .map { case (_, _, name, n, bytes) => (s"$dir/$name", n, bytes) })
      .toDF("file", "n_records", "n_bytes")
  }

  /** One record to the segment stream — gzip mode frames it as its own
    * member (deterministic: MTIME=0). */
  private def writeRecord(out: OutputStream, gzip: Boolean,
                          rec: Array[Byte]): Unit =
    if (gzip) {
      val gz = new GZIPOutputStream(new NoCloseStream(out), 1 << 16)
      gz.write(rec); gz.finish(); gz.close()
    } else out.write(rec)

  /** WARC-Date: the timestamp's instant in ISO-8601 UTC — session-
    * timezone-independent by construction, fractional seconds emitted
    * exactly when present (ISO_INSTANT prints `…:00Z` for aligned
    * instants and `…:00.123456Z` otherwise — the WARC/1.1 form; the
    * source's `Instant.parse` reads both). Accepts either external
    * timestamp representation (the java8API flag decides which one a
    * Row carries). */
  private def formatDate(ts: Any): String = ts match {
    case null => null
    case t: java.sql.Timestamp => DateTimeFormatter.ISO_INSTANT.format(t.toInstant)
    case i: java.time.Instant => DateTimeFormatter.ISO_INSTANT.format(i)
    case other => throw new IllegalStateException(
      s"WarcSink: unexpected warc_date representation ${other.getClass}")
  }

  /** Segment-name pad width for a job of `numPartitions` tasks: 4 up
    * to 10k partitions (the classic `part-NNNN`), one digit per decade
    * beyond — uniform within a job, so lexicographic segment order IS
    * partition order at any scale. */
  private[sinks] def padWidth(numPartitions: Int): Int =
    math.max(4, (math.max(numPartitions, 1) - 1).toString.length)

  /** The record's version line for its date: fractional seconds are a
    * WARC/1.1 feature (ISO 28500:2009 restricts WARC-Date to whole
    * seconds), so a sub-second date declares 1.1 and anything else
    * stays 1.0 — a strict 1.0 validator never meets an illegal 1.0
    * record, and a 1.1-aware reader gets the full precision. */
  private def versionFor(date: String): String =
    if (date != null && date.contains('.')) "WARC/1.1" else "WARC/1.0"

  /** One serialized response record (headers ISO-8859-1, CRLF framing,
    * two CRLFs after the payload per spec; version line per
    * [[versionFor]]). */
  private def record(r: Row, httpContentType: String): Array[Byte] = {
    val body: Array[Byte] =
      if (r.isNullAt(4)) Array.emptyByteArray else r.getAs[Array[Byte]](4)
    val status = if (r.isNullAt(3)) 200 else r.getInt(3)
    val envelope = (s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $httpContentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1)
    val payloadLen = envelope.length + body.length
    def strHdr(k: String, v: String): String =
      if (v == null) "" else s"$k: $v\r\n"
    def hdr(k: String, i: Int): String =
      if (r.isNullAt(i)) "" else strHdr(k, r.getString(i))
    val date = formatDate(r.get(1))
    val head = (s"${versionFor(date)}\r\n" +
      "WARC-Type: response\r\n" +
      hdr("WARC-Record-ID", 2) +
      strHdr("WARC-Date", date) +
      hdr("WARC-Target-URI", 0) +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: $payloadLen\r\n\r\n").getBytes(ISO_8859_1)
    frame(head, envelope, body)
  }

  /** The per-segment provenance leader: `application/warc-fields`
    * payload naming software/format/segment, dated at the segment's
    * first response date (deterministic bytes — the wall clock never
    * enters the archive). */
  private def warcinfoRecord(segment: String,
                             firstDate: Any): Array[Byte] = {
    val date = formatDate(firstDate)
    val fmt = if (versionFor(date) == "WARC/1.1") "1.1" else "1.0"
    val body = ("software: graft WarcSink\r\n" +
      s"format: WARC File Format $fmt\r\n").getBytes(ISO_8859_1)
    val head = (s"${versionFor(date)}\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"WARC-Record-ID: <urn:graft:warcinfo:$segment>\r\n" +
      (if (date == null) "" else s"WARC-Date: $date\r\n") +
      s"WARC-Filename: $segment\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1)
    frame(head, Array.emptyByteArray, body)
  }

  /** head + payload + the record-terminating CRLFCRLF. */
  private def frame(head: Array[Byte], envelope: Array[Byte],
                    body: Array[Byte]): Array[Byte] = {
    val payloadLen = envelope.length + body.length
    val outBytes = new Array[Byte](head.length + payloadLen + 4)
    System.arraycopy(head, 0, outBytes, 0, head.length)
    System.arraycopy(envelope, 0, outBytes, head.length, envelope.length)
    System.arraycopy(body, 0, outBytes, head.length + envelope.length,
      body.length)
    outBytes(outBytes.length - 4) = '\r'
    outBytes(outBytes.length - 3) = '\n'
    outBytes(outBytes.length - 2) = '\r'
    outBytes(outBytes.length - 1) = '\n'
    outBytes
  }

  /** GZIPOutputStream.close() closes the underlying stream; members
    * share one file, so shield it. */
  private final class NoCloseStream(under: OutputStream)
      extends java.io.FilterOutputStream(under) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      under.write(b, off, len)
    override def close(): Unit = under.flush()
  }
}
