package graft.sinks

import java.io.OutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
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
  * Input contract (checked up front): `url` string, `warc_date`
  * timestamp, `record_id` string, `http_status` int, `body` binary.
  * Each row becomes one `WARC-Type: response` record whose payload is
  * an HTTP response envelope (status line + Content-Type +
  * Content-Length + CRLF) followed by the body — exactly what the
  * source's `splitHttp` strips back off, so write→read round-trips
  * bit-exactly (WarcSourceSpec pins it; q210 pins it cross-engine).
  *
  * Returns the per-file manifest `(file, n_records, n_bytes)` — the
  * write is the action, the manifest certifies it (the ShardWriter
  * discipline).
  */
object WarcSink {

  private val Required = Seq("url", "warc_date", "record_id",
    "http_status", "body")

  def write(df: DataFrame, dir: String, gzip: Boolean = false,
            httpContentType: String = "text/plain; charset=utf-8"):
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
    // overwrite semantics: a retried job converges on the same files
    locally {
      val p = new Path(dir)
      val fs = p.getFileSystem(hconf.value)
      if (fs.exists(p)) fs.delete(p, true)
      fs.mkdirs(p)
    }
    val rows = df.select(
      col("url").cast("string"),
      date_format(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"),
      col("record_id").cast("string"),
      col("http_status").cast("int"),
      col("body").cast("binary"))
    import spark.implicits._
    val manifest = rows.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val file = f"$dir/part-$pid%04d$ext"
      val path = new Path(file)
      val fs = path.getFileSystem(hconf.value)
      var n = 0L
      val out = fs.create(path, true)
      try {
        it.foreach { r =>
          val rec = record(r, httpContentType)
          if (gzip) {
            // one gzip member per record (deterministic: MTIME=0)
            val gz = new GZIPOutputStream(new NoCloseStream(out), 1 << 16)
            gz.write(rec); gz.finish(); gz.close()
          } else out.write(rec)
          n += 1
        }
      } finally out.close()
      if (n == 0) { // no empty segment files
        fs.delete(path, false)
        Iterator.empty
      } else Iterator.single((file, n, fs.getFileStatus(path).getLen))
    }.toDF("file", "n_records", "n_bytes")
    // force the distributed write NOW; the manifest is tiny (one row
    // per partition), so the localCheckpoint holds no corpus state
    manifest.localCheckpoint()
  }

  /** One serialized WARC/1.0 response record (headers ISO-8859-1, CRLF
    * framing, two CRLFs after the payload per spec). */
  private def record(r: Row, httpContentType: String): Array[Byte] = {
    val body: Array[Byte] =
      if (r.isNullAt(4)) Array.emptyByteArray else r.getAs[Array[Byte]](4)
    val status = if (r.isNullAt(3)) 200 else r.getInt(3)
    val envelope = (s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $httpContentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1)
    val payloadLen = envelope.length + body.length
    def hdr(k: String, i: Int): String =
      if (r.isNullAt(i)) "" else s"$k: ${r.getString(i)}\r\n"
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      hdr("WARC-Record-ID", 2) +
      hdr("WARC-Date", 1) +
      hdr("WARC-Target-URI", 0) +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: $payloadLen\r\n\r\n").getBytes(ISO_8859_1)
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
