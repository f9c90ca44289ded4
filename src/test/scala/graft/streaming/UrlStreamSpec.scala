package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Streaming domain cap: admissions respect the per-domain budget across
  * micro-batches (state survives the batch boundary), and the streamed
  * result equals the batch window cap on the same data. */
class UrlStreamSpec extends SparkSpec {

  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2026-03-01 12:00:00")
  private def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)

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
}
