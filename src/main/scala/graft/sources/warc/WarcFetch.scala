package graft.sources.warc

import java.io.{BufferedInputStream, EOFException, FilterInputStream, IOException, InputStream}

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Random-access record retrieval over a cc-index frame — the workload
  * the Common Crawl URL index serves: given `(record_file,
  * record_offset)` rows (the seekable key every [[WarcSource]] scan
  * emits), open each file, SEEK to the offset, decode exactly that one
  * record, and return it in the source's own envelope schema. Where the
  * `record_id` IN-list rehydration (q212) still STREAMS each archive
  * segment past every header, a fetch reads only the requested records'
  * bytes — the right shape when the wanted set is sparse against a
  * 100 TB archive (point lookups against 64k segments), and the reason
  * crawl indexes exist at all.
  *
  * Scale shape: the index shuffles ONLY its (file, offset) pairs —
  * narrow rows, never payloads — RANGE-partitioned on (file, offset)
  * and sorted within each task, so one task's fetches against the same
  * segment share a single open stream and seek strictly FORWARD (the
  * spinning-rust-friendly order; object stores equally prefer it),
  * while a HOT segment (a million wanted records in one file) splits
  * across tasks by offset range instead of hashing onto one — the
  * skew case hash-by-file would serialize.
  * Each record then pays one seek + its own bytes: headers, payload,
  * and for `.gz` archives exactly its own gzip member (the
  * record-per-member framing the sink writes and Common Crawl ships —
  * seeking into a shared-window gzip stream would be impossible).
  * Duplicate keys collapse first: output is one record per DISTINCT
  * (file, offset).
  *
  * Framing honesty, inherited from the source: an offset that does not
  * land on a record (stale index, corrupt segment) throws naming the
  * file and offset — a random-access layer that silently skips is how
  * a rehydration loses documents invisibly.
  */
object WarcFetch {

  def fetch(index: DataFrame, fileCol: String = "record_file",
            offsetCol: String = "record_offset"): DataFrame = {
    Seq(fileCol, offsetCol).foreach(c => require(index.columns.contains(c),
      s"WarcFetch.fetch: column '$c' required " +
        s"(has: ${index.columns.sorted.mkString(", ")})"))
    val spark = index.sparkSession
    val hconf = new graft.sources.jsonl.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val keys = index
      .select(col(fileCol).cast("string").as("f"),
        col(offsetCol).cast("long").as("off"))
      .filter(col("f").isNotNull && col("off").isNotNull && col("off") >= 0)
      .distinct()
      // contiguous (file, offset) ranges per task, ascending within:
      // stream reuse + forward seeks, and a hot file splits across
      // tasks by offset range rather than hashing onto one
      .repartitionByRange(col("f"), col("off"))
      .sortWithinPartitions(col("f"), col("off"))
    keys.mapPartitions { it =>
      var curFile: String = null
      var raw: FSDataInputStream = null
      def closeRaw(): Unit = {
        if (raw != null) { try raw.close() catch { case _: Exception => () } }
        raw = null; curFile = null
      }
      val rows = it.map { r =>
        val file = r.getString(0)
        val off = r.getLong(1)
        if (file != curFile) {
          closeRaw()
          val p = new Path(file)
          val fs = p.getFileSystem(hconf.value)
          raw = graft.sources.Retry.withBackoff(attempts = 3, backoffMs = 100) {
            fs.open(p)
          }
          curFile = file
        }
        raw.seek(off)
        readOne(raw, file, off)
      }
      // close the last stream when the task's iterator drains
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h) closeRaw()
          h
        }
        override def next(): Row = rows.next()
      }
    }(Encoders.row(WarcSource.Schema))
  }

  /** Decodes the single record at the stream's current position (=
    * `off` in `file`), framing errors naming both. */
  private def readOne(raw: FSDataInputStream, file: String, off: Long): Row = {
    // the per-record wrappers buffer ahead and own an Inflater; shield
    // the shared file stream so closing them (freeing the Inflater's
    // native state) leaves it open for the next seek
    val buffered = new BufferedInputStream(new NoCloseInput(raw), 1 << 16)
    val in: InputStream =
      if (file.endsWith(".gz")) new GzipMembersStream(buffered, file)
      else buffered
    try {
      val h =
        try WarcParser.nextHeader(in, file)
        catch { case e: IOException => throw new IOException(
          s"$file: offset $off does not frame a WARC record — stale " +
            s"index or corrupt segment (${e.getMessage})") }
      if (h == null) throw new EOFException(
        s"$file: offset $off is at or past EOF — stale index")
      if (h.contentLength > Int.MaxValue - 8)
        throw new IOException(
          s"$file: record payload ${h.contentLength} B exceeds a " +
            "single-array bound — split the archive")
      val payload = in.readNBytes(h.contentLength.toInt)
      if (payload.length < h.contentLength)
        throw new EOFException(
          s"$file: truncated payload at offset $off (${payload.length} " +
            s"of ${h.contentLength} B)")
      val ctype = h.headers.get("content-type").orNull
      val (status, body) =
        if (ctype != null && ctype.toLowerCase.startsWith("application/http"))
          WarcParser.splitHttp(payload)
        else (None, payload)
      Row(
        h.headers.get("warc-target-uri").orNull,
        h.headers.get("warc-type").orNull,
        h.headers.get("warc-date").flatMap(parseTs).orNull,
        h.headers.get("warc-record-id").orNull,
        ctype,
        h.contentLength,
        status.map(Integer.valueOf).orNull,
        body,
        off,
        file)
    } finally in.close()
  }

  /** WARC-Date → external timestamp; unparseable → NULL (the reader's
    * log-and-keep stance). */
  private def parseTs(s: String): Option[java.sql.Timestamp] =
    try Some(java.sql.Timestamp.from(java.time.Instant.parse(s)))
    catch { case _: java.time.format.DateTimeParseException => None }

  /** Close-shield: per-record wrappers may close; the shared stream
    * survives for the next seek. */
  private final class NoCloseInput(under: InputStream)
      extends FilterInputStream(under) {
    override def close(): Unit = ()
  }
}
