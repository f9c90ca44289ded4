package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Segment naming past 10k partitions: the pad width grows with the
  * job so lexicographic name order (the tail's watermark order) stays
  * the partition order, and the pre-write cleanup sweeps stale
  * segments of ANY width — the advisor's 5-digit findings. */
class WarcSinkNamesSpec extends SparkSpec {
  import spark.implicits._

  test("padWidth: 4 digits through 10k partitions, one per decade after") {
    assert(WarcSink.padWidth(1) === 4)
    assert(WarcSink.padWidth(3) === 4)
    assert(WarcSink.padWidth(9999) === 4)   // max pid 9998
    assert(WarcSink.padWidth(10000) === 4)  // max pid 9999 — still fits
    assert(WarcSink.padWidth(10001) === 5)  // pid 10000 needs the digit
    assert(WarcSink.padWidth(100001) === 6)
    // uniform width makes lexicographic == numeric across the job
    val w = WarcSink.padWidth(10001)
    val names = Seq(0, 7, 9999, 10000).map(p =>
      s"part-%0${w}d".format(p) + ".warc")
    assert(names.sorted === names,
      "zero-padded names must sort in partition order")
    // the f"%04d" failure shape this replaces: 5 digits sort BEFORE 4
    assert(Seq(f"part-${10000}%04d", f"part-${9999}%04d").sorted.head
      === "part-10000", "unpadded widths would invert the commit order")
  }

  test("pre-write cleanup sweeps stale segments of ANY width (a rerun " +
      "with fewer partitions after a >=10k-partition run)") {
    val out = Files.createTempDirectory("warc_widths").toString + "/arch"
    new java.io.File(out).mkdirs()
    // debris a previous wider/other-compression run could have left
    val stale = Seq("part-10000.warc", "part-98765.warc.gz",
      "part-0123.warc")
    stale.foreach(n => Files.write(
      new java.io.File(out, n).toPath, "junk".getBytes))
    val docs = Seq(
      ("https://x.example/1", "2026-01-01 00:00:00", "<urn:g:1>", 200, "a"),
      ("https://x.example/2", "2026-01-01 00:00:01", "<urn:g:2>", 200, "b"))
      .toDF("url", "ts", "record_id", "http_status", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_date"), $"record_id",
        $"http_status", encode($"text", "UTF-8").as("body"))
    WarcSink.write(docs.repartition(2, $"record_id"), out)
    val names = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSeq.sorted
    assert(names.forall(_.matches("part-\\d{4}\\.warc")),
      s"only this job's segments may remain, got $names")
    assert(stale.forall(s => !names.contains(s)),
      s"stale wide/other-width segments must be swept, got $names")
    // and the read sees exactly this job's records
    assert(spark.read.format("graft-warc").load(out).count() === 2)
  }
}
