package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

class SpansSpec extends SparkSpec {
  import spark.implicits._

  test("duplicate spans are counted across and within documents") {
    // w=3: doc 1 and doc 2 share the window "a b c"; doc 3 repeats its
    // own "x y x" window via "x y x y x"; doc 4 is all-unique.
    val df = Seq(
      (1L, "a b c d"),
      (2L, "z a b c"),
      (3L, "x y x y x"),
      (4L, "p q r s t"),
      (5L, "short")
    ).toDF("doc_id", "text")
    val out = Spans.dupSpanStats(df, "text", "doc_id", w = 3)
      .collect().map(r => r.getLong(0) -> r).toMap

    def stats(r: Row) = (r.getLong(1), r.getLong(2), r.getDouble(3))
    // doc 1: spans {a b c, b c d} -> 1 dup
    assert(stats(out(1L)) == ((2L, 1L, 0.5)))
    // doc 2: spans {z a b, a b c} -> 1 dup
    assert(stats(out(2L)) == ((2L, 1L, 0.5)))
    // doc 3: spans {x y x, y x y, x y x} -> "x y x" twice = 2 dup positions
    assert(stats(out(3L)) == ((3L, 2L, 2.0 / 3)))
    // doc 4: all unique
    assert(stats(out(4L)) == ((3L, 0L, 0.0)))
    // doc 5: shorter than w -> zero spans, fraction 0
    assert(stats(out(5L)) == ((0L, 0L, 0.0)))
  }

  test("every document survives, even span-less ones (row parity with input)") {
    val df = Seq((1L, ""), (2L, "only two")).toDF("doc_id", "text")
    assert(Spans.dupSpanStats(df, "text", "doc_id", w = 5).count() == 2)
  }

  test("removeDupSpans: hand-computed rewrites — canonical occurrence survives, " +
      "every other occurrence's tokens drop") {
    val df = Seq(
      (1L, "a b c d"),      // holds the canonical "a b c" (min doc, offset)
      (2L, "z a b c"),      // its "a b c" at offset 1 is the duplicate
      (3L, "x y x y x"),    // intra-doc repeat: "x y x" at 0 (canonical) and 2
      (4L, "p q r s t"),    // untouched
      (5L, "short")         // shorter than w: no spans, survives verbatim
    ).toDF("doc_id", "text")
    val out = Spans.removeDupSpans(df, "text", "doc_id", w = 3)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 4L, "a b c d")))
    assert(out(2L) == ((2L, 4L, 1L, "z")), "tokens 1..3 covered by the removed span")
    assert(out(3L) == ((3L, 5L, 2L, "x y")), "the pos-2 repeat drops tokens 2..4")
    assert(out(4L) == ((4L, 5L, 5L, "p q r s t")))
    assert(out(5L) == ((5L, 1L, 1L, "short")))
  }

  test("removeDupSpans: identical documents keep exactly one full copy") {
    val df = Seq(
      (7L, "one two three four five six"),
      (8L, "one two three four five six"),
      (9L, "one two three four five six")
    ).toDF("doc_id", "text")
    val out = Spans.removeDupSpans(df, "text", "doc_id", w = 3)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(7L)._4 == "one two three four five six", "min doc is canonical")
    assert(out(8L)._4 == "" && out(9L)._4 == "", "later copies fully removed")
  }

  test("removeDupSpans composes as a prep-pipeline stage (one declarative plan)") {
    // the q64 shape with span-level removal in front: rewrite -> quality
    // gate over the REWRITTEN text — Catalyst sees one plan end-to-end
    val docs = graft.Tables.load(spark, sf(), "documents")
    val rewritten = Spans.removeDupSpans(docs, "text", "doc_id", w = 10)
      .withColumnRenamed("clean_text", "text")
      .filter($"n_kept" > 0)
    val gated = Quality.filter(rewritten, "text")
    assert(gated.count() > 0)
    // span-dedup must not INVENT text: kept token counts never grow
    assert(rewritten.filter($"n_kept" > $"n_tokens").count() == 0)
  }

  test("plan: occurrence counts partial-aggregate before their exchange") {
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = Spans.dupSpanStats(df, "text", "doc_id", w = 3)
      .queryExecution.executedPlan
    val partialAggs = collectPlan(plan) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if a.aggregateExpressions.exists(_.mode ==
          org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => a
    }
    assert(partialAggs.nonEmpty, s"expected map-side combine under the fp shuffle:\n$plan")
  }

  test("removeCorpusSpans scrubs shipped windows only; novel text untouched") {
    import spark.implicits._
    val para = (0 until 12).map(i => s"ship$i").mkString(" ")
    val corpus = Seq((1L, s"corpus preamble words here $para corpus tail")).toDF("doc_id", "text")
    val batch = Seq(
      // re-ships the corpus paragraph between its own fresh pre/post
      (10L, s"fresh intro alpha beta gamma $para fresh outro one two"),
      // entirely novel
      (20L, "totally new material nothing shipped before in any window"),
      // entirely made of the shipped paragraph
      (30L, para)).toDF("doc_id", "text")
    val store = Spans.spanStore(corpus, "text", w = 10)
    val out = Spans.removeCorpusSpans(batch, store, "text", "doc_id", w = 10)
      .select($"doc_id", $"n_tokens", $"n_kept", $"clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // doc 10: the 12 shipped-para tokens sit inside matched windows and
    // vanish along with neighbors covered by those windows; fresh pre
    // and post tokens outside every matched window survive
    assert(out(10L)._3 < out(10L)._2 && out(10L)._3 > 0)
    assert(!out(10L)._4.contains("ship"), s"shipped tokens must go: ${out(10L)._4}")
    assert(out(10L)._4.contains("fresh intro"), "novel prefix survives")
    assert(out(20L)._3 == out(20L)._2, "novel doc passes intact")
    assert(out(30L)._3 == 0L && out(30L)._4.isEmpty,
      "a pure re-ship is scrubbed to empty")
  }

  test("removeCorpusSpans: bloom pre-screen is invisible in the result") {
    import spark.implicits._
    val d = graft.Tables.load(spark, sf(), "documents")
    val store = Spans.spanStore(d.filter($"doc_id" % 10 =!= 0), "text")
    val batch = d.filter($"doc_id" % 10 === 0)
    def run(bits: Int) =
      Spans.removeCorpusSpans(batch, store, "text", "doc_id", w = 10,
          bloomBits = bits)
        .select($"doc_id", $"n_kept", $"clean_text")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(run(0) == run(1 << 16),
      "a bloom false positive joins and misses; it can never remove a novel span")
  }

  test("span-store commit: shipped snapshot's windows scrub on re-ingest; double-commit == single") {
    import spark.implicits._
    val para = (0 until 12).map(i => s"ship$i").mkString(" ")
    val corpus = Seq((1L, s"corpus preamble words here $para corpus tail"))
      .toDF("doc_id", "text")
    Spans.writeSpanStore(corpus, "text", "span_store_rounds", buckets = 4)
    try {
      val snap = Seq(
        (10L, "a freshly ingested paragraph with twelve brand new tokens " +
          "never shipped before today"))
        .toDF("doc_id", "text")
      val shipped = Spans.removeCorpusSpans(snap,
        spark.table("span_store_rounds"), "text", "doc_id")
      assert(shipped.select($"n_kept").as[Long].head() ==
        shipped.select($"n_tokens").as[Long].head(), "novel snapshot intact")
      val cleanShipped = shipped
        .select($"doc_id", $"clean_text".as("text")).localCheckpoint()
      Spans.appendToSpanStore(cleanShipped, "text", "span_store_rounds")
      val once = spark.table("span_store_rounds").count()
      // crash-retry: the same commit runs again — store stays distinct
      Spans.appendToSpanStore(cleanShipped, "text", "span_store_rounds")
      val st = spark.table("span_store_rounds")
      assert(st.count() == once && st.count() == st.distinct().count(),
        "double-commit must not seed duplicate fingerprints")
      // re-ingesting the committed snapshot scrubs to empty
      val replay = Spans.removeCorpusSpans(snap,
        spark.table("span_store_rounds"), "text", "doc_id")
      assert(replay.select($"n_kept").as[Long].head() == 0L,
        "committed spans reject their own re-delivery")
    } finally spark.sql("DROP TABLE IF EXISTS span_store_rounds")
  }
}
