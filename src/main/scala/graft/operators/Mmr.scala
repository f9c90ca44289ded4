package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity half of the retrieval family: a top-k searcher returns
  * near-duplicates of one good hit ranked 1..k, and a training-data
  * retrieval loop (hard-negative mining, RAG context assembly, dedup'd
  * eval pools) wants k DIFFERENT good hits instead. Greedy selection:
  * pick argmax of `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` k
  * times, where sim is embedding cosine (the [[Vectors.dot]] kernel, so
  * the fold is engine-reproducible) and the first pick (empty selected
  * set: the max-sim term is 0) is plain relevance.
  *
  * Distributed shape: ALL queries advance together — each of the k
  * greedy steps is one per-query window argmax plus one query-keyed
  * join that folds the newly selected vector into each survivor's
  * running `max sim` (greatest-so-far, so step i only compares against
  * selection i, never re-scans the selected set). The loop is
  * DRIVER-SIDE but k-bounded (the PageRank/k-means precedent), and the
  * frames are queries × candidates rows where candidates are k-bounded
  * per query BY CONTRACT — they come from a top-k searcher
  * ([[Similarity.cosineTopK]], BM25, hybrid RRF), so cost is
  * independent of corpus size. Each step localCheckpoints (the
  * iterate-on-a-frame discipline: plans stay flat instead of doubling
  * per iteration).
  *
  * Determinism contract: ties on the MMR objective break by ascending
  * `idCol`; `lambda` and its complement are both computed HERE (pass
  * 0.5 for the bit-exact cross-engine default — `1 − λ` is exact in
  * binary for 0.5, not for 0.7, and the oracle must write the same
  * constant). Rows with a NULL score or NULL vector are dropped up
  * front (the [[Mix.selectByTokenBudget]] null contract: unscored
  * candidates must not win selection by a null-ordering accident).
  *
  * Returns one row per selection: `(queryCol, idCol, scoreCol,
  * mmr_score, mmr_rank)` with `mmr_rank` 1..k in selection order; a
  * query with fewer than k candidates just exhausts early.
  */
object Mmr {

  def rerank(cands: DataFrame, queryCol: String, idCol: String,
             scoreCol: String, vecCol: String, k: Int,
             lambda: Double = 0.5): DataFrame = {
    require(k >= 1, s"Mmr.rerank: k >= 1, got $k")
    require(lambda >= 0 && lambda <= 1,
      s"Mmr.rerank: lambda in [0, 1], got $lambda")
    Seq(queryCol, idCol, scoreCol, vecCol).foreach(c =>
      require(cands.columns.contains(c),
        s"Mmr.rerank: column '$c' not in the frame " +
          s"(has: ${cands.columns.sorted.mkString(", ")})"))
    graft.functions.VecDot.ensureRegistered(cands.sparkSession)
    val lam = lambda
    val oneMinusLam = 1.0 - lambda // computed once, mirrored by oracles
    val q = col(queryCol)
    val id = col(idCol)

    var remaining = cands
      .select(q, id, col(scoreCol), col(vecCol))
      .filter(col(scoreCol).isNotNull && col(vecCol).isNotNull)
      .withColumn("__maxsim", lit(0.0))
      .localCheckpoint()
    var selected = List.empty[DataFrame]
    val w = Window.partitionBy(q).orderBy(col("__mmr").desc, id.asc)
    var step = 1
    while (step <= k && !remaining.isEmpty) {
      val scoredStep = remaining
        .withColumn("__mmr",
          lit(lam) * col(scoreCol) - lit(oneMinusLam) * col("__maxsim"))
      val picked = scoredStep
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
        .localCheckpoint()
      selected ::= picked.select(q, id, col(scoreCol),
        col("__mmr").as("mmr_score"), lit(step).as("mmr_rank"))
      // fold the new selection into each survivor's running max-sim;
      // the inner join retires queries that just exhausted
      remaining = remaining
        .join(picked.select(q, id.as("__sel_id"),
          col(vecCol).as("__sel_vec")), Seq(queryCol))
        .filter(id =!= col("__sel_id"))
        .withColumn("__maxsim", greatest(col("__maxsim"),
          Vectors.cosine(col(vecCol), col("__sel_vec"))))
        .drop("__sel_id", "__sel_vec")
        .localCheckpoint()
      step += 1
    }
    if (selected.isEmpty) // empty/all-null input: empty result, same shape
      cands.select(q, id, col(scoreCol), lit(0.0).as("mmr_score"),
        lit(1).as("mmr_rank")).limit(0)
    else selected.reverse.reduceLeft(_ unionByName _)
  }
}
