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
}
