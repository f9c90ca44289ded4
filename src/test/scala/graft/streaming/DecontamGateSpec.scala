package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Streaming decontamination gate: stream == batch across micro-batch
  * boundaries (stateless, so equality is by construction — the pin
  * proves the plan survives streaming analysis), gram-less pass-through,
  * and the over-budget fail-fast naming the batch path. */
class DecontamGateSpec extends SparkSpec {

  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("stream == batch decontaminate across two micro-batches; " +
      "gram-less docs pass") {
    val bench = Seq((100L, words("leak", 20))).toDF("doc_id", "text")
    // doc 1 embeds a benchmark 13-gram run mid-document (contaminated);
    // doc 2 is clean long text; doc 3 is shorter than 13 tokens
    // (gram-less -> passes); doc 4 in the SECOND batch repeats the leak
    val batch1 = Seq(
      (1L, words("pre", 5) + " " + words("leak", 14) + " " + words("post", 5)),
      (2L, words("clean", 30)),
      (3L, "too short for any thirteen gram")
    ).toDF("doc_id", "text")
    val batch2 = Seq(
      (4L, words("leak", 13)),
      (5L, words("novel", 25))
    ).toDF("doc_id", "text")

    val src = Files.createTempDirectory("decontam_src").toString
    val out = Files.createTempDirectory("decontam_out").toString
    val ckpt = Files.createTempDirectory("decontam_ckpt").toString
    def run(): Unit = {
      val stream = spark.readStream.schema(batch1.schema).parquet(src)
      val q = DecontamGate.admitted(stream, bench, "text", "doc_id")
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    batch1.write.mode("append").parquet(src)
    run()
    batch2.write.mode("append").parquet(src)
    run()

    val streamed = spark.read.parquet(out)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == Seq(2L, 3L, 5L),
      s"contaminated docs must fall in THEIR OWN micro-batch: $streamed")
    val viaBatch = graft.operators.Decontam.decontaminate(
        batch1.unionByName(batch2), bench, "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == viaBatch, "gate must equal the batch sweep")
  }

  test("over-budget benchmark fails fast naming the batch machinery") {
    // one long doc carries tokens-12 distinct 13-grams: blow the 2^16
    // literal budget with a single 70k-token benchmark document
    val big = Seq((1L, words("t", 70000))).toDF("doc_id", "text")
    val stream = Seq((2L, words("x", 20))).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      DecontamGate.admitted(stream, big, "text", "doc_id")
    }
    assert(ex.getMessage.contains("Decontam.decontaminate"),
      s"budget error must point at the batch path: ${ex.getMessage}")
  }
}
