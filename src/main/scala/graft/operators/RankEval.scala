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

  /** GRADED-relevance metrics: `qCol, n_rel, ap, ndcg` — standard-gains
    * nDCG@k ((2^gain − 1)/log₂(rank+1), ideal = judged gains sorted
    * descending, cut at k) and average precision@k (AP; its mean over
    * queries is MAP). What a search owner asks for once binary
    * judgments stop discriminating ([[metrics]] is the binary special
    * case: gain 1 everywhere makes the nDCG columns coincide).
    *
    * `rel`: (qCol, idCol, gainCol) graded judgments — duplicates keep
    * the max gain, rows with gain <= 0 are explicit non-relevance (they
    * earn nothing and don't count toward n_rel). AP@k =
    * (Σ over the i-th relevant hit at rank rᵢ ≤ k of i/rᵢ) /
    * min(n_rel, k) — the TREC cutoff normalization, so a retriever
    * surfacing all of min(n_rel, k) relevant docs first scores 1.
    *
    * Same contracts as [[metrics]]: k-bounded inputs by construction,
    * queries keyed on ranked ∪ judged (an empty retrieval scores 0,
    * never vanishes), every sum a strict rank-ascending (position-
    * ascending for the ideal) fold so values are bit-identical across
    * runs and engines up to libm log/pow, absorbed by the caller's 6-dp
    * round. */
  def gradedMetrics(ranked: DataFrame, rel: DataFrame, qCol: String,
                    idCol: String, rankCol: String, gainCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"RankEval: k must be positive: $k")
    val relG = rel.groupBy(col(qCol), col(idCol))
      .agg(max(col(gainCol)).cast("double").as("__gain"))
      .filter(col("__gain") > 0)
    val hits = ranked.filter(col(rankCol) <= k)
      .join(relG, Seq(qCol, idCol))
      .groupBy(col(qCol))
      .agg(sort_array(collect_list(struct(
        col(rankCol).cast("long").as("r"), col("__gain").as("g")))).as("__h"))
      .select(col(qCol),
        aggregate(col("__h"), lit(0.0), (acc, x) =>
          acc + (pow(lit(2.0), x("g")) - lit(1.0)) /
            log2(x("r").cast("double") + lit(1.0))).as("__dcg"),
        // i-th relevant hit (1-based, rank-ascending) at rank r earns
        // precision i/r — the AP numerator
        aggregate(zip_with(col("__h"),
            sequence(lit(1L), size(col("__h")).cast("long")),
            (x, i) => i.cast("double") / x("r").cast("double")),
          lit(0.0), (acc, p) => acc + p).as("__apnum"))
    val nRel = relG.groupBy(col(qCol))
      .agg(count(lit(1)).as("n_rel"),
        reverse(sort_array(collect_list(col("__gain")))).as("__gd"))
      .select(col(qCol), col("n_rel"),
        aggregate(zip_with(slice(col("__gd"), 1, k),
            sequence(lit(1L), least(size(col("__gd")), lit(k)).cast("long")),
            (g, i) => (pow(lit(2.0), g) - lit(1.0)) /
              log2(i.cast("double") + lit(1.0))),
          lit(0.0), (acc, t) => acc + t).as("__idcg"))
    ranked.select(col(qCol)).unionByName(relG.select(col(qCol))).distinct()
      .join(nRel, Seq(qCol), "left")
      .join(hits, Seq(qCol), "left")
      .select(col(qCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          coalesce(col("__apnum"), lit(0.0)) /
            least(col("n_rel"), lit(k.toLong)).cast("double"))
          .otherwise(lit(0.0)).as("ap"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          coalesce(col("__dcg"), lit(0.0)) / col("__idcg"))
          .otherwise(lit(0.0)).as("ndcg"))
  }
}
