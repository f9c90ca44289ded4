package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple banana banana banana"),
    (4L, "cherry"),
    (5L, "")
  ).toDF("doc_id", "text")

  private def postings(r: Row): Seq[(Long, Double)] =
    r.getSeq[Row](r.fieldIndex("postings")).map(p => (p.getLong(0), p.getDouble(1)))

  test("df/cf/postings match hand computation; rank tf desc then id asc") {
    val out = InvertedIndex.build(corpus, "text", "doc_id", k = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("apple", "banana", "cherry"))
    // apple: docs 1 (tf 2), 3 (tf 1)
    assert(out("apple").getLong(1) == 2 && out("apple").getLong(2) == 3)
    assert(postings(out("apple")) == Seq((1L, 2.0), (3L, 1.0)))
    // banana: doc 3 (tf 3), doc 1 (tf 1), doc 2 (tf 1) -> k=2 keeps 3, then 1 (id tie-break)
    assert(out("banana").getLong(1) == 3 && out("banana").getLong(2) == 5)
    assert(postings(out("banana")) == Seq((3L, 3.0), (1L, 1.0)))
    // cherry: docs 2 and 4, tf 1 each -> id order
    assert(postings(out("cherry")) == Seq((2L, 1.0), (4L, 1.0)))
  }

  test("build fails fast on a non-numeric id column (postings key by long)") {
    val stringIds = corpus.withColumn("doc_id", concat(lit("doc-"), $"doc_id"))
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.build(stringIds, "text", "doc_id", k = 3)
    }
    assert(e.getMessage.contains("numeric"),
      s"expected the numeric-id contract error, got: ${e.getMessage}")
  }

  test("minDf prunes the hapax tail") {
    val df = Seq((1L, "common rare"), (2L, "common")).toDF("doc_id", "text")
    val tokens = InvertedIndex.build(df, "text", "doc_id", k = 3, minDf = 2L)
      .select($"token").as[String].collect().toSet
    assert(tokens == Set("common"))
  }

  test("empty and token-less docs contribute nothing; empty corpus -> empty index") {
    val out = InvertedIndex.build(corpus.filter($"doc_id" === 5L), "text", "doc_id", k = 2)
    assert(out.count() == 0)
  }

  test("plan: two shuffles, no window/sort of the posting candidates") {
    val df = InvertedIndex.build(corpus, "text", "doc_id", k = 2)
    val plan = df.queryExecution.executedPlan
    val shuffles = collectPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size == 2, s"expected exactly two shuffles:\n$plan")
    val windows = collectPlan(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"posting cut must be the heap aggregate, not a window:\n$plan")
    // partial aggregation must sit below each exchange (map-side combine/trim)
    val partialAggs = collectPlan(plan) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if a.aggregateExpressions.exists(_.mode ==
          org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => a
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
        if a.aggregateExpressions.exists(_.mode ==
          org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => a
    }
    assert(partialAggs.size >= 2, s"expected partial aggregation before each exchange:\n$plan")
  }
}
