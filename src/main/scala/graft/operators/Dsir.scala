package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * pick raw-corpus documents that LOOK LIKE a small high-quality target
  * (wiki/books) by importance weight under two hashed-token generative
  * models. The feature space is the [[FeatureHash]] bucket space
  * (hash collisions are part of the method — the paper's hashed n-gram
  * model), so both distributions are `dim`-bounded no matter the
  * vocabulary:
  *
  *   w(x) = log p_target(x)/p_raw(x)
  *        = Σ_tokens ln((tc_b+1)/(rc_b+1)) + n_tokens · ln((R+dim)/(T+dim))
  *
  * with add-one smoothing; tc/rc are target/raw bucket counts, T/R the
  * token totals. Every ln argument is a ratio of exact integers, so the
  * per-bucket log-ratios are bit-identical across engines (the q87
  * precedent) and ride the plan as one `dim`-length literal.
  *
  * Shape at 100 TB: two bucket-count aggregates (map-side combined into
  * ≤ `dim` groups — the collected maps are `dim`-bounded driver state,
  * the kmeans/codebook precedent), then ONE narrow pass over the raw
  * corpus: the weight is an in-order `aggregate` fold over each
  * document's tokens against the ratio literal — no explode, no join,
  * no shuffle. Selection ([[gumbelTopK]]) is a distributed top-k heap
  * (`orderBy.limit` = TakeOrdered), never a global sort.
  */
object Dsir {

  /** The hashed feature stream of a token array: the tokens themselves
    * plus every word n-gram up to `maxNgram` (the paper's hashed n-gram
    * model — bigrams catch word ORDER unigram bags cannot), all drawn
    * from the same `dim`-bucket space. */
  private def featureStream(tk: org.apache.spark.sql.Column,
                            maxNgram: Int): org.apache.spark.sql.Column =
    if (maxNgram <= 1) tk
    else concat(tk +: (2 to maxNgram).map(n =>
      coalesce(Text.shinglesNative(tk, n), array().cast("array<string>"))): _*)

  /** (idCol, n_tokens, dsir_weight) for every `raw` row — weight > 0
    * leans target-like, < 0 raw-like; token-less documents score 0.
    * `n_tokens` counts the FEATURES the weight folds over (== tokens at
    * the default `maxNgram = 1`; + (n-1)-, …-grams above it). Weights
    * are rounded to 6 dp (summation-order ulps). */
  def importanceWeights(raw: DataFrame, target: DataFrame, textCol: String,
                        idCol: String, dim: Int = 1024,
                        maxNgram: Int = 1): DataFrame = {
    require(dim >= 1, s"dim must be positive: $dim")
    // the ratio array rides EVERY task's serialized plan (8 bytes/bucket)
    // — the measured q101 oversized-literal lesson; past ~2 MB the plan
    // tax dominates, so fail loudly instead of silently degrading
    require(dim <= (1 << 18),
      s"dim = $dim embeds a ${dim * 8L / (1 << 20)} MB ratio literal in " +
        "every task's plan — keep the hashed space <= 2^18 buckets " +
        "(collisions are the method's accepted trade)")
    require(maxNgram >= 1, s"maxNgram must be positive: $maxNgram")
    def bucketCounts(df: DataFrame): (Map[Long, Long], Long) = {
      val rows = df
        .select(explode(
          featureStream(Text.tokens(col(textCol)), maxNgram)).as("__t"))
        .select(graft.operators.FeatureHash.bucket(col("__t"), dim).as("__b"))
        .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      (rows.toMap, rows.map(_._2).sum)
    }
    val (tc, tTot) = bucketCounts(target)
    val (rc, rTot) = bucketCounts(raw)
    val ratios: Seq[Double] = (0 until dim).map { b =>
      math.log((tc.getOrElse(b.toLong, 0L) + 1).toDouble /
        (rc.getOrElse(b.toLong, 0L) + 1))
    }
    val constTerm = math.log((rTot + dim).toDouble / (tTot + dim))
    val rlit = typedlit(ratios)
    raw
      .select(col(idCol),
        featureStream(
          coalesce(Text.tokens(col(textCol)), array().cast("array<string>")),
          maxNgram).as("__tk"))
      .select(col(idCol), size(col("__tk")).cast("long").as("n_tokens"),
        round(
          aggregate(col("__tk"), lit(0.0), (acc, t) =>
            acc + element_at(rlit,
              (graft.operators.FeatureHash.bucket(t, dim) + 1).cast("int"))) +
            size(col("__tk")) * lit(constTerm),
          6).as("dsir_weight"))
  }

  /** The RESAMPLING half: Gumbel-top-k over the weights — equivalent to
    * sampling k documents without replacement ∝ exp(weight/`scale`),
    * made deterministic the library way (content-addressed noise): the
    * Gumbel variate comes from the md5 of (id, salt), so the same seed
    * re-selects the same set on any cluster, any partitioning, any
    * engine. `scale` trades fidelity (small → argmax-like top-k) for
    * diversity (large → closer to uniform); the paper resamples at
    * scale 1. Perturbed scores are rounded to 6 dp with an id tiebreak
    * so the selected SET is stable across engines. Distributed top-k
    * heap — no global sort. */
  def gumbelTopK(weights: DataFrame, idCol: String, weightCol: String,
                 k: Int, salt: String = "", scale: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(scale > 0, s"scale must be positive: $scale")
    // u in (0,1): a 32-bit md5 slice + 0.5, over 2^32 — an exact dyadic
    // rational, so ln(-ln(u)) sees bit-identical inputs everywhere
    val u = (conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
      lit(salt))), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    weights
      .withColumn("gumbel_score",
        round(col(weightCol) / lit(scale) - log(-log(u)), 6))
      .orderBy(col("gumbel_score").desc, col(idCol))
      .limit(k)
  }
}
