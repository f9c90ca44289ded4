package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion — the standard way to combine heterogeneous
  * retrieval systems (sparse BM25, dense ANN, ...) whose raw scores are
  * not comparable: each system contributes `1 / (k0 + rank)` for every
  * document it ranked, and documents are re-ranked by the summed
  * contribution (Cormack et al., SIGIR 2009). `k0 = 60` is the
  * published default; rank is 1-based.
  *
  * The reference tool has no retrieval surface at all — this extends
  * the engine's search family (SURVEY §2.3) the same way [[Bm25]] and
  * [[Similarity.cosineTopK]] do, and fuses exactly those two in the
  * registered q133.
  *
  * Shape at 100 TB: fusion runs over the systems' TOP-K OUTPUTS, never
  * their inputs — each ranking frame is already k-bounded per query by
  * construction ([[SearchStore.searchFrames]], [[Similarity.cosineTopK]]
  * heaps), so every join here is over tiny frames regardless of corpus
  * size; the corpus-scale work happened inside the upstream systems.
  * Determinism: contributions are exact rationals evaluated in double,
  * and the fold order over systems is fixed by the left-reduce below,
  * so fused scores are bit-identical across engines and reruns.
  */
object Hybrid {

  /** Fuse ranking frames, each `(idCol, rankCol)` with 1-based ranks
    * (any other columns are ignored). Returns the fused top `k` as
    * `(id, rrf, n_systems, rank)` ordered by (rrf desc, id asc) — the
    * deterministic tie-break every ranking query in the engine uses.
    * A document absent from a system simply gets no contribution from
    * it (the RRF convention); `n_systems` counts the systems that
    * ranked it, the usual fusion-diagnostics column. */
  def rrf(rankings: Seq[DataFrame], idCol: String = "id",
          rankCol: String = "rank", k0: Int = 60, k: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "Hybrid.rrf: need at least one ranking")
    require(k0 >= 0, s"Hybrid.rrf: k0 must be non-negative: $k0")
    require(k >= 1, s"Hybrid.rrf: k must be positive: $k")
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol).as("id"),
        (lit(1.0) / (lit(k0.toDouble) + col(rankCol).cast("double")))
          .as(s"__c$i"))
    }
    // full-outer left-reduce, NOT union+groupBy: the reduce fixes the
    // floating-point summation order (system 0 + system 1 + ...) so two
    // engines cannot disagree in the last ulp on 3+ systems
    val joined = contribs.reduceLeft((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = contribs.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0))).reduceLeft(_ + _)
    val nSys = contribs.indices
      .map(i => col(s"__c$i").isNotNull.cast("long")).reduceLeft(_ + _)
    val top = joined
      .select(col("id"), round(score, 6).as("rrf"), nSys.as("n_systems"))
      .orderBy(col("rrf").desc, col("id").asc) // TakeOrdered heap, k rows
      .limit(k)
    // rank runs over the k already-collected rows — via the
    // collect/sort/posexplode form, so the plan carries no
    // empty-partition-spec Window (Ranks.byScoreDesc: identical
    // row_number values and output order over the same total order)
    Ranks.byScoreDesc(top, "rrf", "id")
  }
}
