package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Streaming prep pipeline: re-deliveries deduped within the horizon,
  * low-quality docs dropped, split assignment stable — and the streamed
  * result equals the same code run as a batch plan. */
class DocPrepSpec extends SparkSpec {

  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2026-02-01 09:00:00")
  private def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)

  private def goodText(seed: Int): String =
    (0 until 30).map(i => s"tok${seed}_$i").mkString(" ")

  test("stream == batch; re-deliveries deduped; low-quality filtered") {
    val src = Files.createTempDirectory("dp_src").toString
    val out = Files.createTempDirectory("dp_out").toString
    val ckpt = Files.createTempDirectory("dp_ckpt").toString

    val batch1 = Seq(
      (1L, goodText(1), ts(0)),
      (2L, goodText(2), ts(1)),
      (2L, goodText(2), ts(2)),     // in-horizon re-delivery -> dropped
      (3L, "short text", ts(3)),    // under minTokens -> filtered
      // passes token count AND type-token ratio (6/30 = 0.2) but is a
      // period-6 generation loop: 22 of 28 trigram occurrences are
      // repeats (0.786 > 0.75) -> the repetition gate drops it
      (5L, Seq.fill(5)("a b c d e f").mkString(" "), ts(4)))
      .toDF("doc_id", "text", "ingest_ts")
    val batch2 = Seq(
      (4L, goodText(4), ts(10)),
      (1L, goodText(1), ts(11)))    // re-delivery across microbatches
      .toDF("doc_id", "text", "ingest_ts")

    batch1.write.mode("append").parquet(src)
    def run(): Unit = {
      val stream = spark.readStream.schema(batch1.schema).parquet(src)
      val q = DocPrep.prep(stream).writeStream
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
    assert(streamed.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L), "dups, low-quality and repetitive rows must not pass")
    // Same code path, batch plan, same answer — compared on the winner-
    // invariant columns: WHICH duplicate survives is "any one" by
    // contract (a stream keeps the first row processed inside a
    // microbatch, which is partition-order arbitrary; the batch twin
    // deterministically keeps the earliest ts), so ingest_ts may differ.
    val viaBatch = DocPrep.prep(batch1.unionByName(batch2)).drop("ingest_ts")
    val streamedInv = streamed.drop("ingest_ts")
    assert(streamedInv.exceptAll(viaBatch).isEmpty &&
      viaBatch.exceptAll(streamedInv).isEmpty)
    // split labels are content-addressed: stable across modes and reruns
    val splits = streamed.select($"split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  test("line-clean + gopher gates: stream == batch, stateless in-stream") {
    val src = Files.createTempDirectory("dp2_src").toString
    val out = Files.createTempDirectory("dp2_out").toString
    val ckpt = Files.createTempDirectory("dp2_ckpt").toString
    def lined(seed: Int): String =
      (0 until 3).map(l => s"the quick tok${seed}_$l line of words number $l.")
        .mkString("\n")
    val rows = Seq(
      (1L, lined(1), ts(0)),                            // passes everything
      (2L, lined(2) + "\njunk line", ts(1)),            // junk line stripped, doc passes
      (3L, "no punctuation line here\nanother bad", ts(2)), // 0 lines survive
      (4L, lined(4) + "\n" + ("# " * 40) + "#.", ts(3)) // survives line rules, gopher symbol ratio kills it
    ).toDF("doc_id", "text", "ingest_ts")
    rows.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(rows.schema).parquet(src)
    val q = DocPrep.prep(stream, lineClean = true, gopher = true).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    assert(streamed.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    val viaBatch = DocPrep.prep(rows, lineClean = true, gopher = true)
      .drop("ingest_ts")
    val streamedInv = streamed.drop("ingest_ts")
    assert(streamedInv.exceptAll(viaBatch).isEmpty &&
      viaBatch.exceptAll(streamedInv).isEmpty)
  }

  test("optional classifier gate: stream == batch, and the gate actually bites") {
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("dpc_src").toString
    val out = Files.createTempDirectory("dpc_out").toString
    val ckpt = Files.createTempDirectory("dpc_ckpt").toString
    val docs = Seq(
      (1L, goodText(1), ts(0)),
      (2L, goodText(2), ts(1)),
      (3L, goodText(3), ts(2)))
      .toDF("doc_id", "text", "ingest_ts")
    docs.write.mode("append").parquet(src)
    // weights whose per-doc scores split the three docs (found by
    // scoring, then thresholding between min and max)
    val weights = (0 until 32).map(i => i -> (i - 16) / 16.0).toMap
    val scores = graft.operators.Classifier
      .score(docs, "text", "doc_id", weights, bias = 0.0, dim = 32)
      .select($"score").as[Double].collect().sorted
    val tau = scores(1) // keeps exactly the top two
    def run(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(src)
      val q = DocPrep.prep(stream,
          classifierWeights = Some(weights), classifierBias = 0.0,
          classifierTau = tau)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    run()
    val streamed = spark.read.parquet(out).drop("ingest_ts")
    assert(streamed.count() == 2, "the gate must drop the lowest-scoring doc")
    val viaBatch = DocPrep.prep(docs,
      classifierWeights = Some(weights), classifierBias = 0.0,
      classifierTau = tau).drop("ingest_ts")
    assert(streamed.exceptAll(viaBatch).isEmpty &&
      viaBatch.exceptAll(streamed).isEmpty)
  }
}
