package graft.operators

import graft.{SparkSpec, Tables}

/** LSH parameter auto-tuning: the S-curve band solve and the corpus-
  * sized knnGraph geometry default (the KnnScale contract: bits grow
  * with log₂ n, so expected bucket population — and with it candidate
  * pairs per vector — stays constant as the corpus scales). */
class LshTuneSpec extends SparkSpec {

  test("tuneBands puts the S-curve knee at the target Jaccard") {
    // knees over a 16-draw budget: (16,1)=.0625 (8,2)=.354 (4,4)=.707
    // (2,8)=.917 (1,16)=1.0
    assert(Dedup.tuneBands(0.1, 16) == (16, 1))
    assert(Dedup.tuneBands(0.5, 16) == (8, 2))
    assert(Dedup.tuneBands(0.7, 16) == (4, 4))
    assert(Dedup.tuneBands(0.9, 16) == (2, 8))
    // knee is monotone in tau for a fixed budget
    val rows = Seq(0.05, 0.3, 0.6, 0.8, 0.95)
      .map(t => Dedup.tuneBands(t, 64)._2)
    assert(rows == rows.sorted, s"rows-per-band must grow with tau: $rows")
    // budget is always spent exactly
    for (t <- Seq(0.2, 0.5, 0.8); d <- Seq(4, 12, 20, 64)) {
      val (b, r) = Dedup.tuneBands(t, d)
      assert(b * r == d)
    }
  }

  test("autoBits grows with log2 n and clamps to the embedding dim") {
    // the measured r11 wall: 8 fixture bits at 200k vectors; auto gives 12
    assert(Similarity.autoBits(200000, 64, 2) == 12)
    assert(Similarity.autoBits(500, 64, 2) == 3)
    assert(Similarity.autoBits(2000, 64, 2) == 5)
    // tiny corpora floor at 1 bit; huge ones clamp to dim/tables
    assert(Similarity.autoBits(10, 64, 2) == 1)
    assert(Similarity.autoBits(1L << 40, 64, 2) == 32)
    // strict growth across decades (no plateau before the clamp)
    val bs = Seq(1L << 10, 1L << 14, 1L << 18, 1L << 22)
      .map(Similarity.autoBits(_, 4096, 2))
    assert(bs == bs.sorted && bs.distinct.size == bs.size, bs.toString)
  }

  test("default knnGraph geometry is the auto-sized one") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val auto = Similarity.knnGraphAuto(emb, "vec_id", "embedding", k = 5)
    val dflt = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5)
    assert(dflt.exceptAll(auto).isEmpty && auto.exceptAll(dflt).isEmpty,
      "knnGraph's default must route through the corpus-sized geometry")
  }
}
