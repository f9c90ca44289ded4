package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking-quality metrics — the evaluation half of the retrieval
  * family beside [[Similarity.recallAtK]]: per-query MRR (reciprocal
  * rank of the first relevant hit) and binary-relevance nDCG@k
  * (Järvelin & Kekäläinen 2002), over a ranked result frame and a
  * (query, id) relevance frame. What a retrieval stack alerts on when
  * an index/scoring change ships.
  *
  * Inputs are k-bounded per query BY CONTRACT (rankings come from the
  * top-k searchers — [[Bm25]]/[[SearchStore]]/[[Similarity]] heads), so
  * every join and fold here is evaluation-sized regardless of corpus
  * size; the corpus-scale work happened upstream (the recallAtK
  * posture).
  *
  * Reproducibility: both metrics are ordered folds over each query's
  * sorted hit ranks (1/log₂(r+1) discount terms summed rank-ascending;
  * the ideal DCG folds 1..min(k, n_rel) the same way), so values are
  * bit-identical across runs and engines up to the shared libm log —
  * absorbed by the caller's 6-dp round (the q87 precedent). */
object RankEval {

  /** Per-query metrics: `qCol, n_rel, mrr, ndcg`.
    *
    * `ranked`: (qCol, idCol, rankCol) with 1-based ranks, distinct per
    * query (ties already broken upstream — rankings are deterministic
    * in this library). `rel`: binary-relevant (qCol, idCol) pairs
    * (duplicates tolerated). Queries present in `ranked` but with no
    * relevant documents anywhere score mrr = ndcg = 0 with n_rel = 0;
    * queries with judgments but NO ranked rows (a retriever returning
    * nothing) still appear, scoring mrr = ndcg = 0 — they must drag the
    * averaged metric down, not silently vanish from it; relevant
    * documents ranked below `k` (or unranked) earn nothing — that is
    * what @k means. */
  def metrics(ranked: DataFrame, rel: DataFrame, qCol: String,
              idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"RankEval: k must be positive: $k")
    val relD = rel.select(col(qCol), col(idCol)).distinct()
    val hits = ranked.filter(col(rankCol) <= k)
      .join(relD, Seq(qCol, idCol))
      .groupBy(col(qCol))
      .agg(sort_array(collect_list(col(rankCol).cast("long"))).as("__rs"))
      .select(col(qCol),
        (lit(1.0) / element_at(col("__rs"), 1).cast("double")).as("__mrr"),
        aggregate(col("__rs"), lit(0.0),
          (acc, r) => acc + lit(1.0) / log2(r.cast("double") + lit(1.0)))
          .as("__dcg"))
    val nRel = relD.groupBy(col(qCol)).agg(count(lit(1)).as("n_rel"))
    val idcg = aggregate(
      sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
      lit(0.0),
      (acc, r) => acc + lit(1.0) / log2(r.cast("double") + lit(1.0)))
    // evaluation keys = ranked ∪ judged queries: a query the retriever
    // returned nothing for scores 0, it does not vanish from the average
    ranked.select(col(qCol)).unionByName(relD.select(col(qCol))).distinct()
      .join(nRel, Seq(qCol), "left")
      .join(hits, Seq(qCol), "left")
      .select(col(qCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("__mrr"), lit(0.0)).as("mrr"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          coalesce(col("__dcg"), lit(0.0)) / idcg)
          .otherwise(lit(0.0)).as("ndcg"))
  }
}
