package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Linear (logistic) document scoring over hashed bag-of-words features —
  * the quality-classifier INFERENCE stage of a curation pipeline
  * (fastText-style quality gates: train a small linear model offline on
  * labeled good/bad documents, then score the whole corpus and keep
  * what clears a threshold). Training is out of scope by design — at
  * 100 TB the model is always trained on a small labeled set elsewhere;
  * what must scale is applying it to every document.
  *
  * score(doc) = sigmoid(bias + (Σ_t w[bucket(t)]) / n_tokens): each
  * token hashes to its [[FeatureHash.bucket]] (stable across engines
  * and reruns), looks up a weight in the broadcast-as-literal weight
  * map, and the mean token weight passes through the logistic link —
  * the fastText mean-of-embeddings shape with dim-1 "embeddings".
  *
  * Shape at 100 TB: completely narrow — the weight map rides the
  * expression tree (dim entries, driver-bounded like the k-means
  * centroids), the fold runs per row, no explode, no shuffle. Token-less
  * and null-text documents score sigmoid(bias) (no evidence = prior). */
object Classifier {

  /** The score as a pure COLUMN over a text column — one narrow
    * expression, usable mid-pipeline in batch AND streaming plans. */
  def scoreCol(text: Column, weights: Map[Int, Double], bias: Double,
               dim: Int): Column = {
    require(dim >= 1, s"dim must be positive: $dim")
    require(weights.keys.forall(b => b >= 0 && b < dim),
      s"weight buckets must lie in [0, $dim)")
    val wlit = typedlit(weights)
    val toks = coalesce(Text.tokens(text), array().cast("array<string>"))
    val z = aggregate(toks, lit(0.0), (acc, t) =>
      acc + coalesce(
        element_at(wlit, FeatureHash.bucket(t, dim).cast("int")), lit(0.0)))
    val n = size(toks)
    round(sigmoid(when(n > 0, lit(bias) + z / n).otherwise(lit(bias))), 6)
  }

  /** (idCol, n_tokens, score) for every document; `gate` additionally
    * keeps only rows clearing `tau`. */
  def score(df: DataFrame, textCol: String, idCol: String,
            weights: Map[Int, Double], bias: Double, dim: Int): DataFrame =
    df.select(col(idCol),
      // coalesce the ARRAY, not the size: with ANSI off size(null) = -1
      size(coalesce(Text.tokens(col(textCol)), array().cast("array<string>")))
        .cast("long").as("n_tokens"),
      scoreCol(col(textCol), weights, bias, dim).as("score"))

  /** The gate: documents whose score clears `tau` — a narrow filter
    * DIRECTLY on the score expression (no temp column, so a caller's own
    * `__score`-named column is never clobbered or dropped; no join), so
    * it is valid mid-stream and keeps every payload column untouched. */
  def gate(df: DataFrame, textCol: String, idCol: String,
           weights: Map[Int, Double], bias: Double, dim: Int,
           tau: Double): DataFrame =
    df.filter(scoreCol(col(textCol), weights, bias, dim) >= tau)

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))
}
