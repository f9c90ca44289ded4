package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus bigram language-model scoring — the perplexity-style quality
  * gate (CCNet/RefinedWeb lineage): train add-one-smoothed bigram
  * probabilities on the corpus, score each document by its mean bigram
  * log-probability. Gibberish and boilerplate separate from fluent text
  * at the two ends of the score; thresholding is the quality filter.
  *
  * `P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)` — self-trained, so every
  * document bigram exists in the model (no backoff needed; held-out
  * scoring would add unseen-bigram smoothing at the join).
  *
  * Shape at 100 TB: unigram/bigram count tables are vocabulary-sized
  * groupBys (map-side combined); the model joins back onto the document
  * bigram stream BROADCAST (the model is the small side; a trillion-gram
  * corpus would bucket-join instead — the seam is the one join below),
  * and the per-doc score is one final groupBy(id). The vocabulary size
  * rides a one-row cross join, not a driver collect.
  */
object LangModel {

  /** (id, n_bigrams, avg_lp): mean ln P over the doc's bigrams, 6-dp
    * rounded; docs with fewer than 2 tokens keep n_bigrams = 0 and a
    * null score (no bigram evidence — let the gate decide the policy). */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val toks = df.select(col(idCol),
      explode(Text.tokens(col(textCol))).as("__t"))
    val uni = toks.groupBy(col("__t")).agg(count(lit(1)).as("__c1"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val bis = df.select(col(idCol),
      explode(Text.shinglesNative(Text.tokens(col(textCol)), 2)).as("__bg"))
    val lm = bis.select(col("__bg")).groupBy(col("__bg"))
      .agg(count(lit(1)).as("__c2"))
      .join(uni.withColumnRenamed("__t", "__w1"),
        substring_index(col("__bg"), " ", 1) === col("__w1"))
      .crossJoin(broadcast(vocab))
      .select(col("__bg"),
        log((col("__c2") + 1).cast("double") / (col("__c1") + col("__v")))
          .as("__lp"))
    val per = bis.join(broadcast(lm), Seq("__bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("__lp")), 6).as("avg_lp"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_lp"))
  }
}
