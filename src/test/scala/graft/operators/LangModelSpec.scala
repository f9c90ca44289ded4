package graft.operators

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("interpolated scores match the hand-built Jelinek-Mercer model") {
    // tokens: doc1 [a b a b], doc2 [a a] -> uni a=4 b=2, N=6
    // bigrams: doc1 "a b"x2 "b a"x1, doc2 "a a"x1
    val df = Seq((1L, "a b a b"), (2L, "a a")).toDF("doc_id", "text")
    val out = LangModel.interpolatedLogProb(df, "text", "doc_id", lambda = 0.7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val lpAB = math.log(0.7 * (2.0 / 4) + (1.0 - 0.7) * (2.0 / 6))
    val lpBA = math.log(0.7 * (1.0 / 2) + (1.0 - 0.7) * (4.0 / 6))
    val lpAA = math.log(0.7 * (1.0 / 4) + (1.0 - 0.7) * (4.0 / 6))
    assert(out(1L) == ((3L, r6((lpAB * 2 + lpBA) / 3))))
    assert(out(2L) == ((1L, r6(lpAA))))
  }

  test("scores match the hand-built add-one bigram model") {
    // unigrams: a=3 b=2 solo=1 -> V=3
    // bigrams:  "a b"=1, "b a"=2
    // lp(a b) = ln((1+1)/(3+3)); lp(b a) = ln((2+1)/(2+3))
    val df = Seq((1L, "a b a"), (2L, "b a"), (3L, "solo")).toDF("doc_id", "text")
    val out = LangModel.bigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val lpAB = math.log(2.0 / 6)
    val lpBA = math.log(3.0 / 5)
    assert(out(1L) == ((2L, Some(r6((lpAB + lpBA) / 2)))))
    assert(out(2L) == ((1L, Some(r6(lpBA)))))
    assert(out(3L) == ((0L, None)), "no bigram evidence -> null score")
  }

  test("repetitive high-probability text outscores one-off sequences") {
    val df = Seq(
      (1L, "x y x y x y x y x y"),
      (2L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val out = LangModel.bigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L))
  }

  test("plan: the model joins the bigram stream broadcast") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = LangModel.bigramLogProb(df, "text", "doc_id")
      .queryExecution.executedPlan
    val broadcasts = collectPlan(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(broadcasts.nonEmpty, s"expected the LM table broadcast:\n$plan")
  }
}
