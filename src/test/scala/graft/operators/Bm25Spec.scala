package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple banana banana banana"),
    (4L, ""))
    .toDF("doc_id", "text")

  test("weights match a hand computation (N and avgdl include token-less docs)") {
    // N=4, avgdl = (3+2+4+0)/4 = 2.25
    val out = Bm25.weights(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap

    def expected(tf: Long, dl: Long, df: Long): Double = {
      val idf = math.log((4.0 - df + 0.5) / (df + 0.5) + 1)
      val w = idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 2.25))
      BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    // apple in doc 1: tf=2, dl=3, df=2
    assert(out((1L, "apple")).getDouble(5) == expected(2, 3, 2))
    // banana in doc 3: tf=3, dl=4, df=3
    assert(out((3L, "banana")).getDouble(5) == expected(3, 4, 3))
    // cherry in doc 2: tf=1, dl=2, df=1 (rarest term scores the highest idf)
    assert(out((2L, "cherry")).getDouble(5) == expected(1, 2, 1))
    // token-less doc 4 yields no rows
    assert(!out.keys.exists(_._1 == 4L))
    assert(out.size == 6)
  }

  test("null text counts as a token-less doc in N/avgdl (not -1 into avgdl)") {
    // with ANSI off, size(null) = -1: an uncoalesced token column would
    // put dl = -1 into avgdl. A null-text doc must behave exactly like
    // an empty-text doc: counted in N and avgdl (as 0), no weight rows.
    val withNull = corpus.unionByName(
      Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val withEmpty = corpus.unionByName(
      Seq((5L, "")).toDF("doc_id", "text"))
    val a = Bm25.weights(withNull, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    val b = Bm25.weights(withEmpty, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(a == b, "null text and empty text must weight identically")
    assert(!a.keys.exists(_._1 == 5L))
  }

  test("rarer terms outweigh common ones at equal tf/dl") {
    val out = Bm25.weights(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    // doc 2: cherry (df=1) vs banana (df=3), both tf=1, same dl
    assert(out((2L, "cherry")) > out((2L, "banana")))
  }

  test("plan: df table and scalar stats join broadcast — no corpus re-shuffle") {
    val df = Bm25.weights(corpus, "text", "doc_id")
    val plan = df.queryExecution.executedPlan
    val broadcasts = collectPlan(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(broadcasts.size == 2, s"expected both joins broadcast:\n$plan")
    val sortMergeJoins = collectPlan(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(sortMergeJoins.isEmpty, s"corpus must not re-shuffle for the joins:\n$plan")
  }
}
