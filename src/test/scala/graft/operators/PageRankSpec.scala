package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def rankMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("path graph 1-2-3 undirected matches the hand-computed iteration") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = rankMap(PageRank.ranks(edges, "a", "b", iters = 1, undirected = true))
    // deg: 1->1, 2->2, 3->1; r0 = 1/3
    val r1mid = 0.15 / 3 + 0.85 * (1.0 / 3 + 1.0 / 3)
    val r1end = 0.15 / 3 + 0.85 * (1.0 / 3 / 2)
    assert(math.abs(got(1L) - r1end) < 1e-12)
    assert(math.abs(got(2L) - r1mid) < 1e-12)
    assert(math.abs(got(3L) - r1end) < 1e-12)
  }

  test("undirected graphs conserve total rank across iterations") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("a", "b")
    for (it <- Seq(1, 3, 5)) {
      val total = rankMap(PageRank.ranks(edges, "a", "b", iters = it,
        undirected = true)).values.sum
      assert(math.abs(total - 1.0) < 1e-9, s"iters=$it total=$total")
    }
  }

  test("a directed cycle is a uniform fixpoint") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val got = rankMap(PageRank.ranks(edges, "a", "b", iters = 4))
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("star center outranks its leaves") {
    val edges = (2L to 6L).map(i => (1L, i)).toDF("a", "b")
    val got = rankMap(PageRank.ranks(edges, "a", "b", iters = 3, undirected = true))
    (2L to 6L).foreach(leaf => assert(got(1L) > got(leaf)))
  }

  test("directed dangling nodes leak mass (documented variant)") {
    val edges = Seq((1L, 2L)).toDF("a", "b") // 2 has no out-edges
    val total = rankMap(PageRank.ranks(edges, "a", "b", iters = 2)).values.sum
    assert(total < 1.0)
  }

  test("plan: per-round checkpoint keeps the result lineage flat") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val ranks = PageRank.ranks(edges, "a", "b", iters = 5, undirected = true)
    val exchanges = collectPlan(ranks.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      "a checkpointed rank frame should replay no join/agg lineage")
  }
}
