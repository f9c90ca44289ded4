package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import graft.sinks.WarcSink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** graft-warc DSv2: hand-built archives (plain + record-per-gzip-member),
  * envelope fields, HTTP header stripping incl. the malformed-envelope
  * keep, pushdowns (columns / warc_type filter / limit / count(*)),
  * framing fail-fast, and the WarcSink write→read round trip. */
class WarcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def rec(headers: Seq[(String, String)],
                  payload: Array[Byte]): Array[Byte] = {
    val head = (Seq("WARC/1.0") ++ headers.map { case (k, v) => s"$k: $v" })
      .mkString("", "\r\n", "\r\n") +
      s"Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes(ISO_8859_1) ++ payload ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }

  private def httpPayload(status: Int, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1) ++ body

  private val bodyHello = "héllo wörld".getBytes(UTF_8)
  private val records: Seq[Array[Byte]] = Seq(
    rec(Seq("WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:graft:info>",
      "WARC-Date" -> "2026-02-03T04:05:06Z",
      "Content-Type" -> "application/warc-fields"),
      "software: graft\r\n".getBytes(ISO_8859_1)),
    rec(Seq("WARC-Type" -> "request",
      "WARC-Record-ID" -> "<urn:graft:req>",
      "WARC-Date" -> "2026-02-03T04:05:06Z",
      "WARC-Target-URI" -> "https://a.example/x",
      "Content-Type" -> "application/http; msgtype=request"),
      "GET /x HTTP/1.1\r\n\r\n".getBytes(ISO_8859_1)),
    rec(Seq("WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:graft:resp>",
      "WARC-Date" -> "2026-02-03T04:05:07Z",
      "WARC-Target-URI" -> "https://a.example/x",
      "Content-Type" -> "application/http; msgtype=response"),
      httpPayload(200, bodyHello)),
    rec(Seq("WARC-Type" -> "resource",
      "WARC-Record-ID" -> "<urn:graft:res>",
      "WARC-Date" -> "not-a-date", // sloppy date: NULL, framing survives
      "WARC-Target-URI" -> "https://a.example/plain.txt",
      "Content-Type" -> "text/plain"),
      "plain".getBytes(ISO_8859_1)),
    rec(Seq("WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:graft:bad>",
      "WARC-Date" -> "2026-02-03T04:05:08Z",
      "WARC-Target-URI" -> "https://a.example/bad",
      "Content-Type" -> "application/http; msgtype=response"),
      "HTTP/1.1 200 OKno-separator-here".getBytes(ISO_8859_1)))

  private lazy val plainDir = {
    val d = Files.createTempDirectory("warc_plain").toString
    Files.write(Paths.get(s"$d/a.warc"),
      records.take(3).reduce(_ ++ _))
    Files.write(Paths.get(s"$d/b.warc"),
      records.drop(3).reduce(_ ++ _))
    d
  }
  private lazy val gzDir = {
    val d = Files.createTempDirectory("warc_gz").toString
    val buf = new ByteArrayOutputStream()
    records.foreach { r => // one gzip member per record (Common Crawl)
      val gz = new GZIPOutputStream(buf); gz.write(r); gz.finish(); gz.close()
    }
    Files.write(Paths.get(s"$d/a.warc.gz"), buf.toByteArray)
    d
  }

  private def readAll(dir: String) =
    spark.read.format("graft-warc").load(dir)

  test("envelope fields, HTTP stripping, malformed-envelope keep, " +
      "null url on warcinfo, sloppy date -> null") {
    val rows = readAll(plainDir).collect()
      .map(r => r.getAs[String]("record_id") -> r).toMap
    assert(rows.size === 5)
    val info = rows("<urn:graft:info>")
    assert(info.getAs[String]("url") == null &&
      info.getAs[String]("warc_type") == "warcinfo" &&
      new String(info.getAs[Array[Byte]]("body"), ISO_8859_1) ==
        "software: graft\r\n")
    assert(info.getAs[java.sql.Timestamp]("warc_date").toInstant ==
      java.time.Instant.parse("2026-02-03T04:05:06Z"))
    val resp = rows("<urn:graft:resp>")
    assert(resp.getAs[String]("url") == "https://a.example/x")
    assert(resp.getAs[Int]("http_status") === 200)
    assert(new String(resp.getAs[Array[Byte]]("body"), UTF_8) == "héllo wörld")
    assert(resp.getAs[Long]("content_length") ===
      httpPayload(200, bodyHello).length.toLong)
    val req = rows("<urn:graft:req>") // request payload is also http
    assert(req.getAs[String]("warc_type") == "request")
    val res = rows("<urn:graft:res>") // non-http: raw payload, no status
    assert(res.isNullAt(res.fieldIndex("http_status")) &&
      new String(res.getAs[Array[Byte]]("body"), ISO_8859_1) == "plain")
    assert(res.isNullAt(res.fieldIndex("warc_date"))) // sloppy date
    val bad = rows("<urn:graft:bad>") // malformed envelope: keep raw
    assert(bad.isNullAt(bad.fieldIndex("http_status")) &&
      new String(bad.getAs[Array[Byte]]("body"), ISO_8859_1)
        .startsWith("HTTP/1.1 200 OK"))
  }

  test("record-per-gzip-member archive reads identically to plain " +
      "(record_offset/record_file excepted — physical by design)") {
    val a = readAll(plainDir).drop("record_offset", "record_file")
    val b = readAll(gzDir).drop("record_offset", "record_file")
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("record_offset is a SEEKABLE position: plain offsets land on the " +
      "version line, gzip offsets on their record's member — and a " +
      "seek+decode from the offset retrieves exactly that record") {
    // plain: every offset points at the 'WARC/' version line
    val plain = readAll(plainDir)
      .select($"record_id", $"record_file".as("f"), $"record_offset")
      .collect()
    plain.foreach { r =>
      val bytes = Files.readAllBytes(localPath(r.getAs[String]("f")))
      val off = r.getAs[Long]("record_offset").toInt
      assert(new String(bytes, off, 5, ISO_8859_1) == "WARC/",
        s"${r.getAs[String]("record_id")} @ $off")
    }
    // gzip: every offset is a member boundary
    val gz = readAll(gzDir)
      .select($"record_id", $"record_file".as("f"), $"record_offset")
      .collect()
    assert(gz.map(_.getAs[Long]("record_offset")).distinct.length ===
      gz.length, "record-per-member framing: offsets must be distinct")
    gz.foreach { r =>
      val bytes = Files.readAllBytes(localPath(r.getAs[String]("f")))
      val off = r.getAs[Long]("record_offset").toInt
      assert((bytes(off) & 0xff) == 0x1f && (bytes(off + 1) & 0xff) == 0x8b,
        s"offset $off must sit on a gzip member header")
    }
    // the seek+decode half (needs package-private parser access) lives
    // in graft.sources.warc.WarcOffsetSpec
  }

  test("column pruning reaches the reader; un-required bodies are " +
      "skipped, not allocated") {
    val df = readAll(plainDir).select($"url")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty &&
      scans.head.scan.readSchema().fieldNames.toSeq == Seq("url"))
    assert(df.collect().length === 5)
  }

  test("warc_type filter pushes into the reader (responses-only scan)") {
    val df = readAll(plainDir).filter($"warc_type" === "response")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.head.scan.description()
      .contains("PushedFilters=[EqualTo(warc_type,response)]"))
    assert(df.count() === 2) // Spark re-checks residually above the scan
  }

  test("rehydration pushdown: a record_id/url IN-list skips every " +
      "other record's payload in-reader") {
    val wanted = Seq("<urn:graft:resp>", "<urn:graft:res>")
    val df = readAll(plainDir).filter($"record_id".isin(wanted: _*))
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty &&
      scans.head.scan.description().contains("In(record_id,"))
    assert(df.collect().map(_.getAs[String]("record_id")).sorted.toSeq ===
      wanted.sorted)
    val byUrl = readAll(plainDir).filter($"url" === "https://a.example/x")
    val uscans = byUrl.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(uscans.nonEmpty && uscans.head.scan.description()
      .contains("EqualTo(url,https://a.example/x)"))
    assert(byUrl.count() === 2) // the request and the response record
  }

  test("count(*) pushes as per-file partials; limit stops the reader") {
    val cnt = readAll(plainDir).count()
    assert(cnt === 5)
    val agg = readAll(plainDir).groupBy().count()
    agg.collect() // materialize AQE stages before walking the plan
    val scans = collectPlan(agg.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.head.scan.description()
      .contains("PushedAggregation=[COUNT(*)]"))
    val lim = readAll(plainDir).limit(2)
    val lscans = collectPlan(lim.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }
    assert(lscans.nonEmpty &&
      lscans.head.scan.description().contains("PushedLimit=2"))
    assert(lim.collect().length === 2)
  }

  test("framing fail-fast: garbage version line, missing Content-Length") {
    val d1 = Files.createTempDirectory("warc_bad1").toString
    Files.write(Paths.get(s"$d1/x.warc"),
      "NOT-A-WARC\r\n\r\n".getBytes(ISO_8859_1))
    val e1 = intercept[org.apache.spark.SparkException](
      readAll(d1).collect())
    assert(String.valueOf(e1.getCause.getMessage).contains("framing"))
    val d2 = Files.createTempDirectory("warc_bad2").toString
    Files.write(Paths.get(s"$d2/y.warc"),
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:graft:nolen>\r\n\r\npayload")
        .getBytes(ISO_8859_1))
    val e2 = intercept[org.apache.spark.SparkException](
      readAll(d2).collect())
    assert(String.valueOf(e2.getCause.getMessage).contains("Content-Length"))
  }

  test("WarcSink round trip: write (gzip, per-partition files) -> read " +
      "back bit-exactly; manifest certifies the files") {
    val out = Files.createTempDirectory("warc_sink").toString + "/arch"
    val docs = Seq(
      ("https://x.example/1", "2026-01-01 00:00:00", "<urn:g:1>", 200,
        "first döc"),
      ("https://x.example/2", "2026-01-01 00:00:01", "<urn:g:2>", 404,
        "second"),
      ("https://x.example/3", "2026-01-01 00:00:02", "<urn:g:3>", 200,
        "")).toDF("url", "ts", "record_id", "http_status", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_date"),
        $"record_id", $"http_status", encode($"text", "UTF-8").as("body"))
    val manifest = WarcSink.write(docs.repartition(2, $"record_id"),
      out, gzip = true)
    assert(manifest.agg(sum($"n_records")).head().getLong(0) === 3L)
    assert(manifest.select($"file").as[String].collect()
      .forall(_.endsWith(".warc.gz")))
    val back = spark.read.format("graft-warc").load(out)
      .select($"url", $"warc_date", $"record_id", $"http_status",
        decode($"body", "UTF-8").as("text"), $"warc_type")
    val expected = docs
      .select($"url", $"warc_date", $"record_id", $"http_status",
        decode($"body", "UTF-8").as("text"), lit("response").as("warc_type"))
    assert(back.exceptAll(expected).isEmpty &&
      expected.exceptAll(back).isEmpty)
    // re-write converges (overwrite semantics), no empty segments linger
    WarcSink.write(docs.repartition(8, $"record_id"), out, gzip = true)
    assert(spark.read.format("graft-warc").load(out).count() === 3)
    // fail fast: missing contract column
    val e = intercept[IllegalArgumentException](
      WarcSink.write(docs.drop("body"), out))
    assert(e.getMessage.contains("'body'"))
  }

  test("atomic landing: the finished directory holds ONLY final segment " +
      "names — no in-progress debris, nothing a listing would hide") {
    val out = Files.createTempDirectory("warc_atomic").toString + "/arch"
    val docs = Seq(("https://x.example/1", "2026-01-01 00:00:00",
      "<urn:g:1>", 200, "one"))
      .toDF("url", "ts", "record_id", "http_status", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_date"), $"record_id",
        $"http_status", encode($"text", "UTF-8").as("body"))
    // 4 partitions, 3 of them empty: empty partitions must leave neither
    // a final nor a temp file behind
    WarcSink.write(docs.repartition(4), out, gzip = true)
    // (dot-prefixed .crc sidecars are the local filesystem's checksum
    // artifact — hidden to every listing, not sink debris)
    val names = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSeq.sorted
    assert(names.length === 1 && names.head.matches("part-\\d{4}\\.warc\\.gz"),
      s"expected exactly one final segment, got $names")
  }

  test("WARC-Date: sub-second timestamps round-trip bit-exactly " +
      "(fractional WARC/1.1 form), second-aligned keep the classic form") {
    val out = Files.createTempDirectory("warc_micros").toString + "/arch"
    val docs = Seq(
      ("https://x.example/f", "2026-01-01 00:00:00.123456", "<urn:g:f>"),
      ("https://x.example/s", "2026-01-01 00:00:01", "<urn:g:s>"))
      .toDF("url", "ts", "record_id")
      .select($"url", $"ts".cast("timestamp").as("warc_date"), $"record_id",
        lit(200).as("http_status"), encode(lit("x"), "UTF-8").as("body"))
      .coalesce(1)
    WarcSink.write(docs, out)
    val raw = new String(Files.readAllBytes(
      new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".warc")).head.toPath), ISO_8859_1)
    assert(raw.contains("WARC-Date: 2026-01-01T00:00:00.123456Z"),
      "fractional seconds must be emitted, not truncated")
    assert(raw.contains("WARC-Date: 2026-01-01T00:00:01Z"),
      "second-aligned dates keep the classic form")
    // the version line tracks the date's precision PER RECORD:
    // fractional dates are illegal in WARC/1.0 (ISO 28500:2009 mandates
    // whole seconds), so the sub-second record must declare 1.1 while
    // the aligned record stays 1.0 — strict 1.0 validators never meet
    // an illegal 1.0 record
    assert(raw.contains("WARC/1.1\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:g:f>"),
      "sub-second record must carry a WARC/1.1 version line")
    assert(raw.contains("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:g:s>"),
      "second-aligned record must stay WARC/1.0")
    val back = spark.read.format("graft-warc").load(out)
      .select($"record_id", $"warc_date").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1).toInstant).toMap
    assert(back("<urn:g:f>") ==
      java.time.Instant.parse("2026-01-01T00:00:00.123456Z"))
    assert(back("<urn:g:s>") ==
      java.time.Instant.parse("2026-01-01T00:00:01Z"))
  }

  test("WARC-Date is the INSTANT, independent of the session timezone") {
    val out = Files.createTempDirectory("warc_tz").toString + "/arch"
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // timestamp literal parses in session tz: 00:00 New York = 05:00 UTC
      val docs = Seq(("https://x.example/tz", "2026-01-01 00:00:00",
        "<urn:g:tz>", 200, "zoned"))
        .toDF("url", "ts", "record_id", "http_status", "text")
        .select($"url", $"ts".cast("timestamp").as("warc_date"),
          $"record_id", $"http_status", encode($"text", "UTF-8").as("body"))
        .coalesce(1)
      WarcSink.write(docs, out)
      val raw = new String(Files.readAllBytes(
        new java.io.File(out).listFiles()
          .filter(_.getName.endsWith(".warc")).head.toPath), ISO_8859_1)
      assert(raw.contains("WARC-Date: 2026-01-01T05:00:00Z"),
        "the archive must carry the instant in UTC, not local wall-clock " +
          "labeled Z")
      val back = spark.read.format("graft-warc").load(out)
        .select($"warc_date").head().getTimestamp(0).toInstant
      assert(back == java.time.Instant.parse("2026-01-01T05:00:00Z"))
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("warcinfo leader: provenance record opens each segment, dated at " +
      "the first response; responses-only pushdown skips it; manifest " +
      "counts responses only") {
    val out = Files.createTempDirectory("warc_info").toString + "/arch"
    val docs = Seq(
      ("https://x.example/1", "2026-01-01 00:00:00", "<urn:g:1>", 200, "a"),
      ("https://x.example/2", "2026-01-01 00:00:01", "<urn:g:2>", 200, "b"))
      .toDF("url", "ts", "record_id", "http_status", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_date"), $"record_id",
        $"http_status", encode($"text", "UTF-8").as("body"))
      .coalesce(1).sortWithinPartitions($"record_id")
    val manifest = WarcSink.write(docs, out, gzip = true, warcinfo = true)
    assert(manifest.agg(sum($"n_records")).head().getLong(0) === 2L,
      "the warcinfo leader is framing, not data")
    val all = spark.read.format("graft-warc").load(out)
    assert(all.count() === 3)
    val info = all.filter($"warc_type" === "warcinfo").collect()
    assert(info.length === 1)
    val i = info.head
    assert(i.getAs[String]("record_id")
      .matches("<urn:graft:warcinfo:part-\\d{4}\\.warc\\.gz>"))
    assert(i.getAs[String]("content_type") == "application/warc-fields")
    assert(i.getAs[java.sql.Timestamp]("warc_date").toInstant ==
      java.time.Instant.parse("2026-01-01T00:00:00Z"),
      "warcinfo is dated at the segment's first response — no wall clock")
    val fields = new String(i.getAs[Array[Byte]]("body"), ISO_8859_1)
    assert(fields.contains("software: graft WarcSink") &&
      fields.contains("format: WARC File Format 1.0"))
    assert(all.filter($"warc_type" === "response").count() === 2)
  }

  test("gzip framing honesty: a truncated .warc.gz kills the read " +
      "naming the file — never a silent short count") {
    val d = Files.createTempDirectory("warc_trunc").toString
    val full = {
      val buf = new ByteArrayOutputStream()
      records.take(3).foreach { r =>
        val gz = new GZIPOutputStream(buf); gz.write(r); gz.finish(); gz.close()
      }
      buf.toByteArray
    }
    // cut inside the LAST member's deflate stream: Java's
    // GZIPInputStream would report clean EOF after 2 records
    Files.write(Paths.get(s"$d/t.warc.gz"),
      java.util.Arrays.copyOfRange(full, 0, full.length - 6))
    val e = intercept[org.apache.spark.SparkException](readAll(d).collect())
    assert(String.valueOf(e.getCause.getMessage).contains("t.warc.gz"),
      s"got: ${e.getCause}")
  }

  test("gzip framing honesty: trailing garbage after the last member " +
      "kills the read — bytes in an archive are never silently dropped") {
    val d = Files.createTempDirectory("warc_garbage").toString
    val buf = new ByteArrayOutputStream()
    records.take(2).foreach { r =>
      val gz = new GZIPOutputStream(buf); gz.write(r); gz.finish(); gz.close()
    }
    buf.write("this is not a gzip member".getBytes(ISO_8859_1))
    Files.write(Paths.get(s"$d/g.warc.gz"), buf.toByteArray)
    val e = intercept[org.apache.spark.SparkException](readAll(d).collect())
    assert(String.valueOf(e.getCause.getMessage).contains("g.warc.gz") &&
      String.valueOf(e.getCause.getMessage).contains("not a gzip header"),
      s"got: ${e.getCause}")
  }

  test("gzip framing honesty: a flipped payload bit fails the member " +
      "CRC instead of shipping corrupt bytes") {
    val d = Files.createTempDirectory("warc_crc").toString
    val buf = new ByteArrayOutputStream()
    records.take(1).foreach { r =>
      val gz = new GZIPOutputStream(buf); gz.write(r); gz.finish(); gz.close()
    }
    val bytes = buf.toByteArray
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x40).toByte
    Files.write(Paths.get(s"$d/c.warc.gz"), bytes)
    val e = intercept[org.apache.spark.SparkException](readAll(d).collect())
    assert(String.valueOf(e.getCause.getMessage).contains("c.warc.gz"),
      s"got: ${e.getCause}")
  }
}
