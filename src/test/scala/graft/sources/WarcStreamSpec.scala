package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sinks.WarcSink
import org.apache.spark.sql.functions._

/** graft-warc streaming tail: exactly-once per segment file across live
  * arrivals, idle triggers, start_after resume, the responses-only
  * pushdown on the streaming path, and offset round-tripping. */
class WarcStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Writes one single-record response segment file named `name`.
    * WarcSink lands atomically on its own (hidden temp + rename); the
    * move here exists only to give each arrival a distinct ascending
    * NAME (the sink always numbers from part-0000) — the crawler-side
    * naming discipline the tail's offset contract documents. */
  private def segment(dir: String, name: String, id: String,
                      text: String): Unit = {
    val one = Seq((s"https://t.example/$id", "2026-01-01 00:00:00",
      s"<urn:w:$id>", 200, text)).toDF("url", "ts", "record_id",
      "http_status", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_date"), $"record_id",
        $"http_status", encode($"text", "UTF-8").as("body"))
      .coalesce(1)
    val tmp = Files.createTempDirectory("warc_seg").toString
    WarcSink.write(one, tmp, gzip = true)
    val written = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    Files.move(written.toPath, Paths.get(s"$dir/$name"))
  }

  test("WarcSink feeds the tail it ships beside: a stream tailing the " +
      "directory WHILE the sink writes into it sees only complete " +
      "segments — the sink satisfies the tail's own delivery contract") {
    val dir = Files.createTempDirectory("warc_sink_tail").toString
    val df = spark.readStream.format("graft-warc").load(dir)
      .select($"record_id", decode($"body", "UTF-8").as("text"))
    val query = df.writeStream.format("memory").queryName("warc_st").start()
    try {
      query.processAllAvailable() // empty dir: zero rows, stream healthy
      assert(spark.table("warc_st").count() === 0)
      // the sink writes a multi-partition archive into the WATCHED dir
      // while triggers keep firing — atomic temp+rename landing means
      // no trigger can ever list a half-written segment
      val docs = Seq(
        ("https://t.example/a", "2026-01-01 00:00:00", "<urn:st:a>", 200, "aa"),
        ("https://t.example/b", "2026-01-01 00:00:01", "<urn:st:b>", 200, "bb"),
        ("https://t.example/c", "2026-01-01 00:00:02", "<urn:st:c>", 200, "cc"))
        .toDF("url", "ts", "record_id", "http_status", "text")
        .select($"url", $"ts".cast("timestamp").as("warc_date"), $"record_id",
          $"http_status", encode($"text", "UTF-8").as("body"))
      WarcSink.write(docs.repartition(3, $"record_id"), dir, gzip = true)
      query.processAllAvailable()
      val got = spark.table("warc_st").select($"record_id").as[String]
        .collect().toSeq.sorted
      assert(got === Seq("<urn:st:a>", "<urn:st:b>", "<urn:st:c>"), s"got $got")
      assert(spark.table("warc_st").where($"record_id" === "<urn:st:b>")
        .select($"text").as[String].head() === "bb")
      // the landed directory holds only final segment names (plus the
      // local filesystem's hidden .crc checksum sidecars)
      val names = new java.io.File(dir).listFiles().map(_.getName)
        .filterNot(_.startsWith(".")).toSeq
      assert(names.forall(_.matches("part-\\d{4}\\.warc\\.gz")), s"$names")
    } finally query.stop()
  }

  test("each segment is read in exactly one microbatch; idle triggers " +
      "add nothing; later arrivals append") {
    val dir = Files.createTempDirectory("warc_tail").toString
    segment(dir, "seg-0001.warc.gz", "a", "first")
    segment(dir, "seg-0002.warc.gz", "b", "second")
    val df = spark.readStream.format("graft-warc").load(dir)
      .select($"record_id", decode($"body", "UTF-8").as("text"))
    val query = df.writeStream.format("memory").queryName("warc_tail").start()
    try {
      def got = spark.table("warc_tail").select($"record_id").as[String]
        .collect().toSeq.sorted
      query.processAllAvailable()
      assert(got === Seq("<urn:w:a>", "<urn:w:b>"), s"backfill, got $got")
      query.processAllAvailable() // idle: watermark unchanged
      assert(got === Seq("<urn:w:a>", "<urn:w:b>"))
      segment(dir, "seg-0003.warc.gz", "c", "third")
      query.processAllAvailable()
      assert(got === Seq("<urn:w:a>", "<urn:w:b>", "<urn:w:c>"),
        s"live arrival exactly once, got $got")
      assert(spark.table("warc_tail").where($"record_id" === "<urn:w:c>")
        .select($"text").as[String].head() === "third")
    } finally query.stop()
  }

  test("start_after skips history; warc_type filter rides the " +
      "streaming readers") {
    val dir = Files.createTempDirectory("warc_tail2").toString
    segment(dir, "seg-0001.warc.gz", "old", "ancient")
    segment(dir, "seg-0002.warc.gz", "new", "fresh")
    val df = spark.readStream.format("graft-warc")
      .option("start_after", "seg-0001.warc.gz").load(dir)
      .filter($"warc_type" === "response") // pushes into the readers
      .select($"record_id")
    val query = df.writeStream.format("memory").queryName("warc_from").start()
    try {
      query.processAllAvailable()
      val got = spark.table("warc_from").as[String].collect().toSeq
      assert(got === Seq("<urn:w:new>"))
    } finally query.stop()
  }

  test("max_files_per_trigger drains a backlog in checkpointed steps, " +
      "never a giant first batch") {
    val dir = Files.createTempDirectory("warc_tail3").toString
    for (i <- 1 to 5)
      segment(dir, f"seg-$i%04d.warc.gz", s"d$i", s"doc number $i")
    val df = spark.readStream.format("graft-warc")
      .option("max_files_per_trigger", "2").load(dir)
      .select($"record_id")
    val query = df.writeStream.format("memory").queryName("warc_adm").start()
    try {
      query.processAllAvailable()
      assert(spark.table("warc_adm").count() === 5)
      // 5 segments at 2/trigger = 3 microbatches, each its own commit
      val batches = query.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length === 3, batches.map(_.numInputRows).toSeq)
      assert(batches.map(_.numInputRows).toSeq === Seq(2, 2, 1))
    } finally query.stop()
    // fail fast on a bad limit
    intercept[IllegalArgumentException](
      spark.readStream.format("graft-warc")
        .option("max_files_per_trigger", "zero").load(dir).schema)
  }

  test("offsets round-trip through their JSON form, empty included") {
    import graft.sources.warc.WarcTailOffset
    for (n <- Seq("", "seg-0042.warc.gz", "odd\"name\\x"))
      assert(WarcTailOffset.parse(WarcTailOffset(n).json()) === n)
    intercept[IllegalArgumentException](WarcTailOffset.parse("notjson"))
  }
}
