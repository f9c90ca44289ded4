package graft.sources.warc

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sinks.WarcSink
import org.apache.spark.sql.functions._

/** The cc-index random-access contract: `(file, record_offset)` from a
  * scan is enough to open the file, SEEK, and decode exactly that
  * record — the workload the Common Crawl index serves. This half needs
  * the package-private parser; the offset-shape assertions live in
  * WarcSourceSpec. */
class WarcOffsetSpec extends SparkSpec {
  import spark.implicits._

  test("seek + decode from record_offset retrieves exactly that record " +
      "(gzip member framing, sink-written archive)") {
    val dir = Files.createTempDirectory("warc_seek").toString + "/arch"
    val docs = (1 to 12).map(i => (s"https://s.example/$i",
        "2026-01-01 00:00:00", s"<urn:seek:$i>", 200, s"document body $i"))
      .toDF("url", "ts", "record_id", "http_status", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_date"), $"record_id",
        $"http_status", encode($"text", "UTF-8").as("body"))
    WarcSink.write(docs.repartition(2, $"record_id"), dir, gzip = true)
    val idx = spark.read.format("graft-warc").load(dir)
      .select($"record_id", $"record_file".as("f"), $"record_offset")
      .collect()
    assert(idx.length === 12)
    idx.foreach { r =>
      val bytes = Files.readAllBytes(localPath(r.getAs[String]("f")))
      val off = r.getAs[Long]("record_offset").toInt
      val in = new GzipMembersStream(
        new ByteArrayInputStream(
          java.util.Arrays.copyOfRange(bytes, off, bytes.length)),
        "seek.gz")
      try {
        val h = WarcParser.nextHeader(in, "seek.gz")
        assert(h.headers("warc-record-id") == r.getAs[String]("record_id"),
          s"seek to $off must decode ${r.getAs[String]("record_id")} first")
        assert(h.offset === 0L, "a fresh seek stream starts at offset 0")
        // the record's payload decodes intact from the seek point
        val payload = in.readNBytes(h.contentLength.toInt)
        assert(payload.length === h.contentLength.toInt)
      } finally in.close()
    }
  }

  test("offsets stay correct under the responses-only pushdown: skipped " +
      "records consume the stream, kept records report their own seats") {
    val dir = Files.createTempDirectory("warc_seek_push").toString + "/arch"
    val docs = (1 to 6).map(i => (s"https://s.example/$i",
        "2026-01-01 00:00:00", s"<urn:pf:$i>", 200, s"pushdown body $i"))
      .toDF("url", "ts", "record_id", "http_status", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_date"), $"record_id",
        $"http_status", encode($"text", "UTF-8").as("body"))
      .coalesce(1).sortWithinPartitions($"record_id")
    // warcinfo leader makes record 0 a NON-response: the filter skips it
    WarcSink.write(docs, dir, gzip = true, warcinfo = true)
    val filtered = spark.read.format("graft-warc").load(dir)
      .filter($"warc_type" === "response")
      .select($"record_id", $"record_file", $"record_offset")
      .collect()
    assert(filtered.length === 6)
    filtered.foreach { r =>
      val bytes = Files.readAllBytes(localPath(r.getAs[String]("record_file")))
      val off = r.getAs[Long]("record_offset").toInt
      assert(off > 0, "responses sit after the warcinfo leader")
      val in = new GzipMembersStream(
        new ByteArrayInputStream(
          java.util.Arrays.copyOfRange(bytes, off, bytes.length)),
        "seekf.gz")
      try assert(WarcParser.nextHeader(in, "seekf.gz")
        .headers("warc-record-id") == r.getAs[String]("record_id"))
      finally in.close()
    }
  }

  test("plain archives carry byte offsets through the parser too " +
      "(CountingInputStream path), blanks attributed to the PREVIOUS " +
      "record") {
    val dir = Files.createTempDirectory("warc_seek_plain").toString + "/arch"
    val docs = (1 to 5).map(i => (s"https://s.example/$i",
        "2026-01-01 00:00:00", s"<urn:sp:$i>", 200, s"body $i"))
      .toDF("url", "ts", "record_id", "http_status", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_date"), $"record_id",
        $"http_status", encode($"text", "UTF-8").as("body"))
      .coalesce(1)
    WarcSink.write(docs, dir)
    val rows = spark.read.format("graft-warc").load(dir)
      .select($"record_id", $"record_file".as("f"), $"record_offset")
      .collect().sortBy(_.getAs[Long]("record_offset"))
    val bytes = Files.readAllBytes(localPath(rows.head.getAs[String]("f")))
    assert(rows.head.getAs[Long]("record_offset") === 0L)
    rows.foreach { r =>
      val off = r.getAs[Long]("record_offset").toInt
      assert(new String(bytes, off, 5, "ISO-8859-1") == "WARC/")
    }
  }
}
