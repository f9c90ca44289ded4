package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR re-ranking: hand-computed greedy selection where diversity beats
  * raw relevance, multi-query independence, tie order, the null-score
  * drop, early exhaustion, and the fail-fast matrix. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // q1: a (rel 0.9) and its near-duplicate b (rel 0.85, almost the same
  // direction), an orthogonal c (rel 0.5), a diagonal d (rel 0.4).
  // Relevance order a,b,c,d; MMR at λ=0.5 must pick a, then c (b's
  // similarity to a kills it), then b.
  private val fix = Seq(
    (1L, 10L, 0.9, Array(1f, 0f)),
    (1L, 11L, 0.85, Array(0.9988f, 0.05f)),
    (1L, 12L, 0.5, Array(0f, 1f)),
    (1L, 13L, 0.4, Array(0.7071f, 0.7071f)),
    // q2: an independent query with its own candidates
    (2L, 20L, 0.7, Array(0f, 1f)),
    (2L, 21L, 0.6, Array(1f, 0f))
  ).toDF("q_id", "vec_id", "score", "emb")

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, r) => p.toDouble * r.toDouble }.sum
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("greedy selection: diversity beats raw relevance, hand-computed " +
      "mmr scores, independent queries in one pass") {
    val out = Mmr.rerank(fix, "q_id", "vec_id", "score", "emb", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(4)) ->
        (r.getLong(1), r.getDouble(3))).toMap
    // q1 selection order a, c, b — NOT the relevance order a, b, c
    assert(out((1L, 1))._1 === 10L)
    assert(out((1L, 2))._1 === 12L)
    assert(out((1L, 3))._1 === 11L)
    // hand-computed objective values (λ = 0.5 exactly, as in the op)
    assert(math.abs(out((1L, 1))._2 - 0.45) < 1e-12) // 0.5*0.9 - 0
    assert(math.abs(out((1L, 2))._2 - 0.25) < 1e-12) // c vs a: cos 0
    val bMax = math.max(
      cosine(Array(0.9988f, 0.05f), Array(1f, 0f)),
      cosine(Array(0.9988f, 0.05f), Array(0f, 1f)))
    assert(math.abs(out((1L, 3))._2 - (0.5 * 0.85 - 0.5 * bMax)) < 1e-9)
    // q2 advanced in the same pass: rel pick first, then the other
    assert(out((2L, 1))._1 === 20L && out((2L, 2))._1 === 21L)
    // q2 exhausted at 2 candidates: no rank-3 row
    assert(!out.contains((2L, 3)))
  }

  test("ties on the objective break by ascending id") {
    val tied = Seq(
      (1L, 5L, 0.8, Array(1f, 0f)),
      (1L, 3L, 0.8, Array(0f, 1f))).toDF("q_id", "vec_id", "score", "emb")
    val first = Mmr.rerank(tied, "q_id", "vec_id", "score", "emb", k = 1)
      .head()
    assert(first.getLong(1) === 3L)
  }

  test("null scores and null vectors are dropped up front — unscored " +
      "candidates must not win by a null-ordering accident") {
    val withNulls = Seq(
      (1L, Some(1L), Option(0.9), Option(Array(1f, 0f))),
      (1L, Some(2L), Option.empty[Double], Option(Array(0f, 1f))),
      (1L, Some(3L), Option(0.1), Option.empty[Array[Float]])
    ).toDF("q_id", "vec_id", "score", "emb")
    val got = Mmr.rerank(withNulls, "q_id", "vec_id", "score", "emb", k = 3)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("empty input returns an empty, correctly-shaped frame") {
    val empty = Mmr.rerank(fix.limit(0), "q_id", "vec_id", "score", "emb", 2)
    assert(empty.columns.toSeq ===
      Seq("q_id", "vec_id", "score", "mmr_score", "mmr_rank"))
    assert(empty.isEmpty)
  }

  test("lambda = 1 is pure relevance order; lambda = 0 is pure " +
      "diversity after the relevance seed") {
    val rel = Mmr.rerank(fix.filter($"q_id" === 1), "q_id", "vec_id",
      "score", "emb", k = 4, lambda = 1.0)
      .orderBy($"mmr_rank").select($"vec_id").as[Long].collect().toSeq
    assert(rel === Seq(10L, 11L, 12L, 13L))
    val div = Mmr.rerank(fix.filter($"q_id" === 1), "q_id", "vec_id",
      "score", "emb", k = 2, lambda = 0.0)
      .orderBy($"mmr_rank").select($"vec_id").as[Long].collect().toSeq
    // seed = relevance argmax is NOT true at λ=0 (all objectives 0,
    // ties break by id): seed is min-id, then the least-similar
    assert(div === Seq(10L, 12L))
  }

  test("fail-fast matrix: bad k, bad lambda, missing column") {
    intercept[IllegalArgumentException](
      Mmr.rerank(fix, "q_id", "vec_id", "score", "emb", k = 0))
    intercept[IllegalArgumentException](
      Mmr.rerank(fix, "q_id", "vec_id", "score", "emb", 2, lambda = 1.5))
    val e = intercept[IllegalArgumentException](
      Mmr.rerank(fix, "q_id", "vec_id", "nope", "emb", 2))
    assert(e.getMessage.contains("'nope'"))
  }
}
