package graft.sources.warc

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.WarcSink

/** Random-access fetch over the cc-index key: seek + decode must equal
  * the streaming scan record for record, on both framings, reusing one
  * stream per (task, file), and fail loudly on a stale offset. */
class WarcFetchSpec extends SparkSpec {
  import spark.implicits._

  private def archive(dir: String, gzip: Boolean, n: Int = 24): Unit = {
    val docs = (1 to n).map(i => (s"https://f.example/$i",
        f"2026-01-01 00:00:${i % 60}%02d", s"<urn:fetch:$i>",
        200, s"fetch body $i"))
      .toDF("url", "ts", "record_id", "http_status", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_date"), $"record_id",
        $"http_status", encode($"text", "UTF-8").as("body"))
    WarcSink.write(docs.repartition(3, $"record_id")
      .sortWithinPartitions($"record_id"), dir, gzip = gzip)
  }

  test("fetch == the streaming scan, record for record (gzip members)") {
    val dir = Files.createTempDirectory("warc_fetch_gz").toString + "/arch"
    archive(dir, gzip = true)
    val scanned = spark.read.format("graft-warc").load(dir)
    val fetched = WarcFetch.fetch(
      scanned.select($"record_file", $"record_offset"))
    // every column equal, offsets and files included — the fetch returns
    // the source's own envelope schema
    assert(fetched.count() === 24)
    assert(fetched.exceptAll(scanned).isEmpty &&
      scanned.exceptAll(fetched).isEmpty,
      "seek+decode must reproduce the scan bit-exactly")
  }

  test("fetch == the streaming scan on PLAIN archives; sparse subsets " +
      "touch only their own records; duplicate keys collapse") {
    val dir = Files.createTempDirectory("warc_fetch_plain").toString + "/arch"
    archive(dir, gzip = false)
    val scanned = spark.read.format("graft-warc").load(dir)
    val some = scanned.filter($"record_id".rlike(":(3|7|11|19)>$"))
      .select($"record_file", $"record_offset")
    val fetched = WarcFetch.fetch(some.unionAll(some)) // dups collapse
    val expect = scanned.filter($"record_id".rlike(":(3|7|11|19)>$"))
    assert(fetched.count() === 4)
    assert(fetched.exceptAll(expect).isEmpty &&
      expect.exceptAll(fetched).isEmpty)
  }

  test("a stale offset fails loudly naming file and offset — never a " +
      "silent skip; missing key columns fail fast") {
    val dir = Files.createTempDirectory("warc_fetch_bad").toString + "/arch"
    archive(dir, gzip = true, n = 3)
    val file = spark.read.format("graft-warc").load(dir)
      .select($"record_file").as[String].head()
    val bogus = Seq((file, 7L)).toDF("record_file", "record_offset")
    val e = intercept[org.apache.spark.SparkException] {
      WarcFetch.fetch(bogus).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("offset 7") || msg.contains("gzip"),
      s"stale offsets must name the failure, got: $msg")
    val idx = Seq((file, 0L)).toDF("f", "record_offset")
    assert(intercept[IllegalArgumentException](
      WarcFetch.fetch(idx)).getMessage.contains("record_file"))
  }
}
