package graft.operators

import graft.SparkSpec

class SemanticDecontamSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Seq(1.0, 0.0)),  // identical to benchmark vector
    (2L, Seq(0.0, 1.0)),  // orthogonal to it, aligned with the other
    (3L, Seq(1.0, 1.0)))  // 45 degrees from both
    .toDF("id", "emb")
  private val bench = Seq(
    (10L, Seq(1.0, 0.0)), (11L, Seq(0.0, -1.0)))
    .toDF("id", "emb")

  test("flags rows whose max benchmark cosine clears tau") {
    val out = Decontam.semanticOverlap(corpus, bench, "id", "emb", tau = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(out(1L) == ((1.0, true)))
    assert(out(2L) == ((0.0, false))) // best is cos((0,1),(1,0)) = 0
    val c3 = out(3L)
    assert(math.abs(c3._1 - math.sqrt(0.5)) < 1e-6 && !c3._2)
  }

  test("literal and broadcast branches agree bit-for-bit") {
    val lit = Decontam.semanticOverlap(corpus, bench, "id", "emb", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val bc = Decontam.semanticOverlap(corpus, bench, "id", "emb", tau = 0.5,
        literalLimit = 1) // forces the broadcast-join branch
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(lit == bc)
  }

  test("literal branch is fully narrow: zero exchanges in the plan") {
    val p = Decontam.semanticOverlap(corpus, bench, "id", "emb")
    val exchanges = collectPlan(p.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "literal-branch decontam must not shuffle")
  }

  test("literal branch is streaming-valid: streamed corpus == batch result") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("sd_src").toString
    val out = Files.createTempDirectory("sd_out").toString
    val ckpt = Files.createTempDirectory("sd_ckpt").toString
    corpus.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(corpus.schema).parquet(src)
    val q = Decontam.semanticOverlap(stream, bench, "id", "emb", tau = 0.9)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val batch = Decontam.semanticOverlap(corpus, bench, "id", "emb", tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(streamed == batch)
  }

  test("empty benchmark yields null evidence, not dropped rows") {
    val out = Decontam.semanticOverlap(corpus,
        bench.filter($"id" < 0), "id", "emb")
      .collect()
    assert(out.length == 3)
    assert(out.forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  test("benchmark-growth guard: over-budget benchmark fails fast, not slow") {
    // 3 vectors x 2 dims = 6 values; a budget of 5 must refuse BEFORE
    // planning the corpus-side work (the q142 x100 lesson: a benchmark
    // that grows with the corpus silently turns the per-row fold into
    // an unbounded nested loop)
    val e = intercept[IllegalArgumentException] {
      Decontam.semanticOverlap(corpus, corpus, "id", "emb",
        maxBenchValues = 5L)
    }
    assert(e.getMessage.contains("SemDedup"), e.getMessage)
    // an explicitly raised budget is a deliberate decision and works
    assert(Decontam.semanticOverlap(corpus, corpus, "id", "emb",
      maxBenchValues = 6L).count() == 3)
    // the default budget admits real eval-suite sizes untouched
    assert(Decontam.semanticOverlap(corpus, bench, "id", "emb").count() == 3)
  }
}
