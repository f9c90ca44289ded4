package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming corpus-card telemetry: batch == stream on the same rows,
  * sketch quantiles exact below the collapse threshold, dup-mass
  * estimate exact at small cardinality, per-window hand-computed cells. */
class CardStreamSpec extends SparkSpec {

  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2026-03-01 10:00:00")
  private def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)

  // window 1 (10:00): token counts (3, 1, 0-null, 3-dup) — dup text;
  // window 2 (11:00): token counts (2, 5)
  private def fixture = Seq(
    (1L, "a b c", ts(0)),
    (2L, "d", ts(10)),
    (3L, null.asInstanceOf[String], ts(20)),
    (4L, "a b c", ts(30)),            // exact dup of 1 within the window
    (5L, "x y", ts(60)),
    (6L, "p q r s t", ts(70))
  ).toDF("doc_id", "text", "ingest_ts")

  test("hand-computed per-window cells; sketch exact below collapse") {
    val out = CardStream.perWindow(fixture, sketchK = 64)
      .orderBy($"w_start").collect()
    assert(out.length == 2)
    val w1 = out(0)
    assert(w1.getLong(2) == 4L)            // n_docs
    assert(w1.getLong(3) == 1L)            // n_empty (the null)
    assert(w1.getDouble(4) == 7.0)         // tok_total 3+1+0+3
    assert(w1.getDouble(5) == 7.0 / 4.0)   // tok_mean
    // nearest-rank over (0,1,3,3): p50 rank ceil(2)=2 -> 1; p90 rank 4 -> 3
    assert(w1.getDouble(6) == 1.0 && w1.getDouble(7) == 3.0)
    assert(w1.getLong(8) == 1L)            // dup_est: 3 texts, 2 distinct
    val w2 = out(1)
    assert(w2.getLong(2) == 2L && w2.getDouble(4) == 7.0)
    // nearest-rank over (2,5): p50 rank 1 -> 2; p90 rank 2 -> 5
    assert(w2.getDouble(6) == 2.0 && w2.getDouble(7) == 5.0)
    assert(w2.getLong(8) == 0L)
  }

  test("stream == batch once windows close (same code, both plans)") {
    val src = Files.createTempDirectory("cs_src").toString
    val out = Files.createTempDirectory("cs_out").toString
    val ckpt = Files.createTempDirectory("cs_ckpt").toString
    fixture.write.mode("append").parquet(src)

    def run(): Unit = {
      val stream = spark.readStream.schema(fixture.schema).parquet(src)
      val q = CardStream.perWindow(stream, sketchK = 64).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    // batch 1: watermark hasn't passed any window end -> nothing emits
    run()
    // batch 2: a far-future doc closes both fixture windows
    Seq((99L, "flush", ts(60 * 24 * 30))).toDF("doc_id", "text", "ingest_ts")
      .write.mode("append").parquet(src)
    run()

    val streamed = spark.read.parquet(out)
    val expected = CardStream.perWindow(fixture, sketchK = 64) // batch plan
    assert(streamed.count() == 2)
    assert(streamed.exceptAll(expected).isEmpty &&
      expected.exceptAll(streamed).isEmpty)
  }

  test("asCards re-shapes windows as cards and publishes into the same " +
    "store the batch card uses") {
    import graft.operators.CorpusReport
    val telemetry = CardStream.perWindow(fixture, sketchK = 64)
    val cards = CardStream.asCards(telemetry)
    // per-window cells survive the reshape exactly (window 1 fixture
    // arithmetic from the hand-computed test above)
    val w1 = cards.filter($"snapshot" === "2026-03-01_10.00.00")
      .select($"section", $"key", $"value")
      .as[(String, String, Double)].collect()
      .map { case (s, k, v) => (s, k) -> v }.toMap
    assert(w1(("corpus", "n_docs")) == 4.0)
    assert(w1(("corpus", "n_empty")) == 1.0)
    assert(w1(("corpus", "exact_dup_docs")) == 1.0)
    assert(w1(("tokens", "total")) == 7.0)
    assert(w1(("tokens", "mean")) == 7.0 / 4.0)
    assert(w1(("tokens", "p50")) == 1.0 && w1(("tokens", "p90")) == 3.0)
    // each window publishes as a snapshot of the SAME store artifact a
    // batch run writes; the cross-engine diff then aligns on the shared
    // (section, key) names
    val path = Files.createTempDirectory("stream_cards").toString
    cards.select($"snapshot").distinct().as[String].collect().foreach { s =>
      CorpusReport.writeCard(
        cards.filter($"snapshot" === s).drop("snapshot"), path, s)
    }
    val batchCard = CorpusReport.build(
      fixture.filter($"ingest_ts" < ts(60)), "text", "doc_id")
    CorpusReport.writeCard(batchCard, path, "batch_w1")
    assert(CorpusReport.snapshots(spark, path).count() == 3)
    val d = CorpusReport.diffSnapshots(spark, path,
      "batch_w1", "2026-03-01_10.00.00")
    // exact cells agree batch-vs-stream on this window (the sketch
    // cells are exact at this cardinality too — the documented regime)
    assert(d.filter($"section" === "corpus" && $"key" === "n_docs")
      .head().getDouble(4) == 0.0)
    assert(d.filter($"delta".isNull).isEmpty,
      "batch and stream cards must align on every (section, key)")
  }
}
