package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MRR / nDCG@k: hand-computed values, the @k cut, no-relevance zeros,
  * and perfect-ranking identity. */
class RankEvalSpec extends SparkSpec {

  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("hand-computed mrr and ndcg, relevant-below-k earns nothing") {
    // q1: ranked a,b,c,d; relevant {b, d, z}; k=3 -> only b@2 counts
    val ranked = Seq(
      ("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3), ("q1", "d", 4),
      ("q2", "x", 1), ("q2", "y", 2), ("q2", "w", 3),
      ("q3", "m", 1), ("q3", "n", 2)
    ).toDF("q", "id", "rank")
    val rel = Seq(
      ("q1", "b"), ("q1", "d"), ("q1", "z"),
      ("q2", "x"), ("q2", "y")
      // q3: nothing relevant
    ).toDF("q", "id")
    val got = RankEval.metrics(ranked, rel, "q", "id", "rank", k = 3)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val (_, n1, mrr1, ndcg1) = got("q1")
    assert(n1 === 3L && mrr1 === 0.5)
    val dcg1 = 1.0 / log2(3.0)
    val idcg1 = 1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(math.abs(ndcg1 - dcg1 / idcg1) < 1e-12)
    // q2 is a PERFECT ranking of its 2 relevant docs: ndcg exactly 1
    // (dcg and idcg are the same fold over the same ranks)
    val (_, n2, mrr2, ndcg2) = got("q2")
    assert(n2 === 2L && mrr2 === 1.0 && ndcg2 === 1.0)
    val (_, n3, mrr3, ndcg3) = got("q3")
    assert(n3 === 0L && mrr3 === 0.0 && ndcg3 === 0.0)
  }

  test("duplicate relevance pairs do not double-count") {
    val ranked = Seq(("q", "a", 1), ("q", "b", 2)).toDF("q", "id", "rank")
    val rel = Seq(("q", "a"), ("q", "a"), ("q", "a")).toDF("q", "id")
    val got = RankEval.metrics(ranked, rel, "q", "id", "rank", k = 5)
      .as[(String, Long, Double, Double)].head()
    assert(got._2 === 1L && got._3 === 1.0 && got._4 === 1.0)
  }

  test("metrics are deterministic across reruns (bit-identical doubles)") {
    val ranked = (1 to 50).map(i => ("q" + i % 7, "d" + i, i / 7 + 1))
      .toDF("q", "id", "rank")
    val rel = (1 to 50).filter(_ % 3 == 0)
      .map(i => ("q" + i % 7, "d" + i)).toDF("q", "id")
    def run() = RankEval.metrics(ranked, rel, "q", "id", "rank", k = 5)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(run() === run())
  }

  test("gradedMetrics: hand-computed AP and graded nDCG") {
    // q1 ranked a,b,c,d; judged gains: b=3, d=1, z=2 (z unranked); k=3
    //   hits at k=3: b@2 (gain 3) only
    //   DCG  = (2^3-1)/log2(3) = 7/log2(3)
    //   IDCG = gains desc [3,2,1] cut at 3:
    //          7/log2(2) + 3/log2(3) + 1/log2(4)
    //   AP   = (1/2) / min(3,3) = (1/2)/3
    val ranked = Seq(
      ("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3), ("q1", "d", 4),
      ("q2", "x", 1), ("q2", "y", 2)
    ).toDF("q", "id", "rank")
    val rel = Seq(
      ("q1", "b", 3), ("q1", "d", 1), ("q1", "z", 2),
      ("q2", "x", 2), ("q2", "y", 1),
      ("q_empty", "e", 2) // judged but never retrieved
    ).toDF("q", "id", "gain")
    val got = RankEval.gradedMetrics(ranked, rel, "q", "id", "rank",
        "gain", k = 3)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set("q1", "q2", "q_empty"))
    val (_, n1, ap1, ndcg1) = got("q1")
    assert(n1 === 3L)
    assert(math.abs(ap1 - (1.0 / 2.0) / 3.0) < 1e-12)
    val dcg1 = 7.0 / log2(3.0)
    val idcg1 = 7.0 / log2(2.0) + 3.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(math.abs(ndcg1 - dcg1 / idcg1) < 1e-12)
    // q2 ranks its judged docs in ideal (gain-descending) order: ndcg 1,
    // AP = (1/1 + 2/2) / min(2,3) = 1
    val (_, n2, ap2, ndcg2) = got("q2")
    assert(n2 === 2L && ap2 === 1.0 && ndcg2 === 1.0)
    // judged-but-unretrieved: present, zero
    val (_, ne, ape, ndcge) = got("q_empty")
    assert(ne === 1L && ape === 0.0 && ndcge === 0.0)
    // duplicates keep the max gain; gain <= 0 rows are non-relevance
    val rel2 = Seq(("q2", "x", 1), ("q2", "x", 2), ("q2", "y", 1),
      ("q2", "junk", 0)).toDF("q", "id", "gain")
    val again = RankEval.gradedMetrics(ranked, rel2, "q", "id", "rank",
        "gain", k = 3)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(again("q2") === got("q2"))
    // binary gains reduce graded nDCG to the binary metric
    val relBin = Seq(("q1", "b", 1), ("q1", "d", 1), ("q1", "z", 1))
      .toDF("q", "id", "gain")
    val g = RankEval.gradedMetrics(ranked, relBin, "q", "id", "rank",
        "gain", k = 3)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val b = RankEval.metrics(ranked,
        relBin.select($"q", $"id"), "q", "id", "rank", k = 3)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(g("q1")._4 === b("q1")._4,
      "gain-1 graded nDCG must equal binary nDCG exactly")
  }

  test("property: seeded random rankings — all metrics in [0,1]; " +
      "promoting a relevant doc past a non-relevant one never hurts") {
    // deterministic LCG (the MarginMineSpec discipline — no Math.random)
    var seed = 20260814L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 11) % bound + bound) % bound).toInt
    }
    val k = 5
    for (round <- 1 to 5) {
      val nDocs = 8 + nextInt(8)
      val docs = (0 until nDocs).map(i => s"d$i")
      val ranked = docs.zipWithIndex.map { case (d, i) => ("q", d, i + 1) }
        .toDF("q", "id", "rank")
      val rel = docs.filter(_ => nextInt(3) == 0)
        .map(d => ("q", d, 1 + nextInt(3))).toDF("q", "id", "gain")
      val rows = RankEval.gradedMetrics(ranked, rel, "q", "id", "rank",
          "gain", k)
        .as[(String, Long, Double, Double)].collect()
      rows.foreach { case (_, _, ap, ndcg) =>
        assert(ap >= 0.0 && ap <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0,
          s"round $round: metrics must be in [0,1]: ap=$ap ndcg=$ndcg")
      }
      // promote the worst-ranked relevant doc one position past a
      // non-relevant neighbor: ap and ndcg must not decrease
      val relSet = rel.select($"id").as[String].collect().toSet
      val order = docs.toArray
      val idx = order.lastIndexWhere(relSet.contains)
      if (idx > 0 && !relSet.contains(order(idx - 1))) {
        val swapped = order.clone()
        val t = swapped(idx); swapped(idx) = swapped(idx - 1); swapped(idx - 1) = t
        val ranked2 = swapped.zipWithIndex.toSeq
          .map { case (d, i) => ("q", d, i + 1) }.toDF("q", "id", "rank")
        def m(r: org.apache.spark.sql.DataFrame) =
          RankEval.gradedMetrics(r, rel, "q", "id", "rank", "gain", k)
            .as[(String, Long, Double, Double)].head()
        val before = m(ranked); val after = m(ranked2)
        assert(after._3 >= before._3 - 1e-12 && after._4 >= before._4 - 1e-12,
          s"round $round: promoting a relevant doc must never hurt " +
            s"(ap ${before._3}->${after._3}, ndcg ${before._4}->${after._4})")
      }
    }
  }

  test("a judged query the retriever returned NOTHING for scores 0, " +
      "not dropped (averaged metrics must see the failure)") {
    val ranked = Seq(("q1", "a", 1)).toDF("q", "id", "rank")
    val rel = Seq(("q1", "a"), ("q_empty", "b")).toDF("q", "id")
    val got = RankEval.metrics(ranked, rel, "q", "id", "rank", k = 5)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set("q1", "q_empty"))
    val (_, ne, mrre, ndcge) = got("q_empty")
    assert(ne === 1L && mrre === 0.0 && ndcge === 0.0)
    // same contract on the GRADED path (the q190 surface): evaluation
    // keys are ranked ∪ judged there too — an empty retrieval scores 0
    // in AP and graded nDCG instead of vanishing from the average
    val grel = Seq(("q1", "a", 2), ("q_empty", "b", 3)).toDF("q", "id", "gain")
    val graded = RankEval.gradedMetrics(ranked, grel, "q", "id", "rank",
        "gain", k = 5)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(graded.keySet === Set("q1", "q_empty"),
      "gradedMetrics must key on ranked ∪ judged")
    val (_, gne, gap, gndcg) = graded("q_empty")
    assert(gne === 1L && gap === 0.0 && gndcg === 0.0)
  }
}
