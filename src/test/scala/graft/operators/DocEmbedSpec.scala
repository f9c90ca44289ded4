package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-free document embeddings: geometry sanity, empty-doc contract,
  * determinism, and the single-shuffle plan pin. */
class DocEmbedSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "")
  ).toDF("doc_id", "text")

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("near-identical docs embed close; disjoint vocabularies embed far") {
    val e = DocEmbed.hashedProjection(docs, "text", "doc_id",
        dim = 256, outDim = 16)
      .as[(Long, Seq[Double])].collect().toMap
    assert(e(1L).length === 16)
    val near = cos(e(1L), e(2L))
    val far = cos(e(1L), e(3L))
    assert(near > 0.85, s"9/10 shared tokens must embed close, got $near")
    assert(far < near - 0.2, s"disjoint vocab must embed farther: $far vs $near")
  }

  test("token-less documents embed as the zero vector (documented contract)") {
    val e = DocEmbed.hashedProjection(docs, "text", "doc_id",
        dim = 64, outDim = 16)
      .as[(Long, Seq[Double])].collect().toMap
    assert(e(4L).forall(_ == 0.0))
  }

  test("embeddings are bit-identical across runs and partitionings") {
    def run(parts: Int) = DocEmbed.hashedProjection(
        docs.repartition(parts), "text", "doc_id", dim = 128, outDim = 16)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(run(1) === run(7))
  }

  test("pruneNearDups: reworded near-copy falls, distinct survivor stays") {
    // doc 2 is doc 1 REORDERED (identical token bag -> identical BoW
    // vector -> cosine exactly 1), the case shingle-based near-dup is
    // weakest on; doc 3 shares nothing
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "kappa iota theta eta zeta epsilon delta gamma beta alpha"),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val kept = DocEmbed.pruneNearDups(df, "text", "doc_id", minCos = 0.95)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L), s"min-id wins the twin cluster: $kept")
  }

  test("autoOutDim sizes the width for AutoBits' geometry") {
    // 500 docs: 2 tables x ceil(log2(500/64)) = 6 bits -> floor 16
    assert(DocEmbed.autoOutDim(500) === 16)
    // 500k docs: 2 x 13 = 26 bits -> 64
    assert(DocEmbed.autoOutDim(500000) === 64)
    // 10^11 docs: 2 x 31 = 62 bits -> 64 still carries it
    assert(DocEmbed.autoOutDim(100000000000L) === 64)
    // 4 tables x 31 = 124 -> next power of four
    assert(DocEmbed.autoOutDim(100000000000L, tables = 4) === 256)
  }

  test("plan: one exchange (the BoW pack), projection is narrow") {
    val plan = DocEmbed.hashedProjection(docs, "text", "doc_id",
      dim = 128, outDim = 16).queryExecution.executedPlan
    val exchanges = collectPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // denseBow's pack: the (id, bucket) combine and the per-id regroup
    // share one hash partitioning on doc_id-compatible keys; allow <= 2
    assert(exchanges.size <= 2,
      s"embedding derivation must not add shuffles beyond the BoW pack: ${exchanges.size}")
  }
}
