package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming domain cap: admissions respect the per-domain budget across
  * micro-batches (state survives the batch boundary), and the streamed
  * result equals the batch window cap on the same data. */
class UrlStreamSpec extends SparkSpec {

  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2026-03-01 12:00:00")
  private def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)

  test("blocklist gate mid-stream == the batch suffix-join gate; " +
    "over-budget list fails fast naming the batch path") {
    val src = Files.createTempDirectory("bl_src").toString
    val out = Files.createTempDirectory("bl_out").toString
    val ckpt = Files.createTempDirectory("bl_ckpt").toString
    val rows = Seq(
      (1L, "https://ads.x.example.com/a"),  // parent suffix
      (2L, "https://example.com/b"),        // exact
      (3L, "https://notexample.com/c"),     // lookalike survives
      (4L, "https://sub.bad.net/d"),
      (5L, "https://fine.org/e"))
      .toDF("doc_id", "url")
    val blocked = Seq("Example.com", "bad.net").toDF("domain")
    rows.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(rows.schema).parquet(src)
    val q = BlocklistGate.admitted(stream, "url", blocked).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val batch = graft.operators.UrlOps.dropBlockedDomains(
      rows, "url", "doc_id", blocked)
    assert(streamed.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Seq(3L, 5L))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    val big = spark.range(70000)
      .select(concat($"id".cast("string"), lit(".example")).as("domain"))
    val e = intercept[IllegalArgumentException](
      BlocklistGate.admitted(stream, "url", big))
    assert(e.getMessage.contains("dropBlockedDomains"))
  }

  test("robots gate mid-stream == the batch join+max gate — wildcards, " +
    "Allow-ties, longest-match, unparseable pass; over-budget fails " +
    "fast naming the batch path") {
    val src = Files.createTempDirectory("rg_src").toString
    val out = Files.createTempDirectory("rg_out").toString
    val ckpt = Files.createTempDirectory("rg_ckpt").toString
    val rows = Seq(
      (1L, "https://h.example/private/doc"),   // blocked: /private
      (2L, "https://h.example/public/doc"),    // no rule: survives
      (3L, "https://other.example/private/x"), // other host: survives
      (4L, "https://h.example/p/10"),          // /p/1 dis beats /p allow
      (5L, "https://h.example/p/2?x=1"),       // /p allow wins
      (6L, "https://h.example/private/ok/f"),  // longer Allow carves hole
      (7L, "not a url"),                       // unparseable: passes
      (8L, "https://h.example/a-mid-z9"),      // /a*9$ wildcard blocks
      (9L, "https://h.example/t/x"))           // exact-length tie: Allow
      .toDF("doc_id", "url")
    val rules = Seq(
      ("h.example", "/private", false),
      ("h.example", "/private/ok", true),
      ("h.example", "/p/1", false),
      ("h.example", "/p", true),
      ("h.example", "/a*9$", false),
      ("h.example", "/t", false),
      ("h.example", "/t", true)
    ).toDF("host", "prefix", "allow")
    rows.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(rows.schema).parquet(src)
    val q = RobotsGate.admitted(stream, "url", rules).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    assert(streamed.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L, 5L, 6L, 7L, 9L))
    // == the batch gate, the shared-translation guarantee made visible
    val batch = graft.operators.UrlOps.applyRobots(
      rows, "url", "doc_id", rules)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
    // empty rule table: everything flows
    assert(RobotsGate.admitted(rows, "url", rules.limit(0)).count() === 9)
    // over-budget literal map fails fast naming the batch join
    val big = spark.range(70000).select(
      lit("h.example").as("host"),
      concat(lit("/p"), $"id".cast("string")).as("prefix"),
      lit(false).as("allow"))
    val e = intercept[IllegalArgumentException](
      RobotsGate.admitted(stream, "url", big))
    assert(e.getMessage.contains("UrlOps.applyRobots"))
    // contract columns
    assert(intercept[IllegalArgumentException](
      RobotsGate.admitted(stream, "url",
        rules.withColumnRenamed("allow", "a")))
      .getMessage.contains("lacks 'allow'"))
  }

  test("stream == batch; quota spans micro-batches and never re-admits") {
    val src = Files.createTempDirectory("dc_src").toString
    val out = Files.createTempDirectory("dc_out").toString
    val ckpt = Files.createTempDirectory("dc_ckpt").toString

    // hot.example gets 4 docs across two micro-batches; cap is 2, so the
    // second batch must admit NOTHING for it even though its own batch
    // count (1) is under the cap — that is the cross-batch state.
    val batch1 = Seq(
      (1L, "https://WWW.Hot.example/a", ts(0)),
      (2L, "http://hot.example/b", ts(1)),
      (3L, "https://hot.example:443/c", ts(2)), // over quota already
      (4L, "https://cold.example/x", ts(3)))
      .toDF("doc_id", "url", "ingest_ts")
    val batch2 = Seq(
      (5L, "https://hot.example/d", ts(10)),    // must be rejected
      (6L, "https://cold.example/y", ts(11)),   // second (and last) for cold
      (7L, "https://cold.example/z", ts(12)),   // over quota
      (8L, "https://fresh.example/1", ts(13)))
      .toDF("doc_id", "url", "ingest_ts")

    batch1.write.mode("append").parquet(src)
    def run(): Unit = {
      val stream = spark.readStream.schema(batch1.schema).parquet(src)
      val q = DomainCap.cap(stream, "url", "doc_id", "ingest_ts", n = 2)
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    run()
    batch2.write.mode("append").parquet(src)
    run()

    val streamed = spark.read.parquet(out)
      .select($"doc_id", $"domain").as[(Long, String)].collect().sorted.toSeq
    assert(streamed == Seq((1L, "hot.example"), (2L, "hot.example"),
      (4L, "cold.example"), (6L, "cold.example"), (8L, "fresh.example")),
      s"got $streamed")
    // the batch twin on the unioned data gives the identical admissions
    val viaBatch = DomainCap.cap(batch1.unionByName(batch2),
        "url", "doc_id", "ingest_ts", n = 2)
      .as[(Long, String)].collect().sorted.toSeq
    assert(viaBatch == streamed)
  }

  test("capPerWindow: stream == batch on ordered feeds; late rows drop; expired windows evict") {
    val src = Files.createTempDirectory("dcw_src").toString
    val out = Files.createTempDirectory("dcw_out").toString
    val ckpt = Files.createTempDirectory("dcw_ckpt").toString
    def min(m: Int, sec: Int = 0) =
      new java.sql.Timestamp(base.getTime + (m * 60 + sec) * 1000L)
    val w0 = base.getTime                // 12:00 window start
    val w2 = base.getTime + 120000L      // 12:02
    val w3 = base.getTime + 180000L      // 12:03

    // 1-minute tumbling windows, cap 2 per (domain, window).
    // b1 (all in window W0): hot gets 3 docs -> admit 2; cold gets 1.
    val b1 = Seq(
      (1L, "https://hot.example/a", min(0, 0)),
      (2L, "https://hot.example/b", min(0, 5)),
      (3L, "https://hot.example/c", min(0, 10)), // over W0's budget
      (4L, "https://cold.example/x", min(0, 20)))
      .toDF("doc_id", "url", "ingest_ts")
    // b2: a NEW window W2 — hot's budget RESETS (that is the windowed
    // semantics); watermark advances to 12:02:30
    val b2 = Seq((5L, "https://hot.example/d", min(2, 30)))
      .toDF("doc_id", "url", "ingest_ts")
    // b3: doc 6 is LATE for W0 (cold-W0 has room, so the BATCH twin
    // would admit it) — but W0 closed at 12:01 < watermark 12:02:30, so
    // the stream refuses it: the counter may already be evicted and
    // refusing is the only answer that cannot overspend. doc 7 opens W3.
    val b3 = Seq(
      (6L, "https://cold.example/late", min(0, 50)),
      (7L, "https://cold.example/y", min(3, 10)))
      .toDF("doc_id", "url", "ingest_ts")

    var lastState = -1L
    def run(): Unit = {
      val stream = spark.readStream.schema(b1.schema).parquet(src)
      val q = DomainCap.capPerWindow(stream, "url", "doc_id", "ingest_ts",
          n = 2, every = "1 minute")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      Option(q.lastProgress).foreach { p =>
        p.stateOperators.find(_.operatorName.contains("flatMapGroupsWithState"))
          .foreach(s => lastState = s.numRowsTotal)
      }
    }
    def streamed() = spark.read.parquet(out)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

    b1.write.mode("append").parquet(src); run()
    assert(lastState == 2, s"(hot,W0) and (cold,W0) counters live: $lastState")
    assert(streamed() == Seq((1L, "hot.example", w0), (2L, "hot.example", w0),
      (4L, "cold.example", w0)), s"got ${streamed()}")

    b2.write.mode("append").parquet(src); run()
    // the run's closing no-data micro-batch sees the advanced watermark
    // (12:02:30) and times out BOTH W0 counters — eviction is eager, so
    // only (hot, W2) survives the run even though W0 held 2 counters
    // when b2's rows were folded
    assert(lastState == 1,
      s"expired W0 counters must LEAVE the state store: $lastState")
    assert(streamed().contains((5L, "hot.example", w2)),
      "a fresh window re-opens the domain's budget")
    // parity on the event-time-ordered prefix: batch twin == stream
    val ordered = b1.unionByName(b2)
    val viaBatch = DomainCap.capPerWindow(ordered, "url", "doc_id",
        "ingest_ts", n = 2, every = "1 minute")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(viaBatch == streamed(), s"stream ${streamed()} != batch $viaBatch")

    b3.write.mode("append").parquet(src); run()
    // W2 (close 12:03) falls to the advanced watermark 12:03:10 in turn;
    // only W3's counter survives
    assert(lastState == 1, s"W2's counter evicted in turn: $lastState")
    val finalRows = streamed()
    assert(!finalRows.exists(_._1 == 6L),
      s"late row for a closed window must be dropped: $finalRows")
    assert(finalRows.contains((7L, "cold.example", w3)))
    // ... and that drop is the documented batch divergence: the batch
    // window cap, seeing all data at once, admits doc 6 into cold-W0
    val batchAll = DomainCap.capPerWindow(
        b1.unionByName(b2).unionByName(b3), "url", "doc_id", "ingest_ts",
        n = 2, every = "1 minute")
      .as[(Long, String, Long)].collect()
    assert(batchAll.exists(_._1 == 6L),
      "fixture must make the late row batch-admittable for the divergence pin")
  }
}
