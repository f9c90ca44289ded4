package graft.operators

import graft.SparkSpec

class HybridSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (Long, Long)*) =
    rows.toSeq.toDF("id", "rank")

  test("rrf matches the hand-computed fusion of two systems") {
    // system A ranks 10,20,30; system B ranks 20,40
    val fused = Hybrid.rrf(
      Seq(ranking(10L -> 1L, 20L -> 2L, 30L -> 3L),
        ranking(20L -> 1L, 40L -> 2L)), k0 = 60, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))

    def c(r: Long): Double = 1.0 / (60.0 + r)
    def rd(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 20 is in both systems and must win
    assert(fused.head == ((20L, rd(c(2) + c(1)), 2L, 1L)))
    assert(fused.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L))
    assert(fused.map(_._4).toSeq == Seq(1L, 2L, 3L, 4L))
    // single-system docs carry n_systems = 1 and only their own term
    assert(fused.find(_._1 == 40L).get._2 == rd(c(2)))
    assert(fused.find(_._1 == 40L).get._3 == 1L)
  }

  test("rrf ties break by id and k caps the output") {
    // two docs with identical contributions: rank order must be by id
    val fused = Hybrid.rrf(
      Seq(ranking(7L -> 1L, 3L -> 1L, 9L -> 2L)), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(fused.toSeq == Seq(3L -> 1L, 7L -> 2L))
  }

  test("rrf summation order is the system order (3+ systems, fixed fold)") {
    val a = ranking(1L -> 1L)
    val fused = Hybrid.rrf(Seq(a, a, a), k0 = 60, k = 1).collect().head
    // exactly ((1/61 + 1/61) + 1/61), rounded — the left-reduce order
    val expected = BigDecimal(1.0 / 61.0 + 1.0 / 61.0 + 1.0 / 61.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fused.getDouble(1) == expected)
    assert(fused.getLong(2) == 3L)
  }

  test("recallAtK: identical lists give 1.0, disjoint give 0.0, partial counts") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L), (3L, 11L))
      .toDF("q_id", "vec_id")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 99L), (2L, 98L), (3L, 11L), (3L, 97L))
      .toDF("q_id", "vec_id")
    val out = Similarity.recallAtK(exact, approx, "vec_id", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((2L, 1.0)))
    assert(out(2L) == ((0L, 0.0)))
    assert(out(3L) == ((1L, 0.5)))
  }

  test("recallAtK keeps queries the approx frame never ranked") {
    val exact = Seq((1L, 10L), (2L, 10L)).toDF("q_id", "vec_id")
    val approx = Seq((1L, 10L)).toDF("q_id", "vec_id")
    val out = Similarity.recallAtK(exact, approx, "vec_id", k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(1L -> 1.0, 2L -> 0.0))
  }
}
