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

  /** Jelinek–Mercer interpolated bigram scoring — the smoothing the
    * held-out/deployment case needs where [[bigramLogProb]]'s add-one
    * device suffices only self-trained: ln(λ·P_ML(w2|w1) +
    * (1−λ)·P_uni(w2)), P_ML = c(w1w2)/c(w1), P_uni = c(w2)/N. The
    * unigram floor keeps rare continuations from collapsing to the
    * add-one cliff, and λ is the single interpolation knob (0.7 default,
    * the textbook setting). Same plan shape as [[bigramLogProb]]:
    * vocabulary-sized groupBys, model broadcast onto the bigram stream,
    * one per-doc groupBy; every probability is a ratio of exact integer
    * counts and λ enters as a double literal, so scores are
    * bit-identical cross-engine before the shared 6-dp mean round. */
  def interpolatedLogProb(df: DataFrame, textCol: String, idCol: String,
                          lambda: Double = 0.7): DataFrame = {
    require(lambda > 0 && lambda < 1, s"interpolatedLogProb: lambda in (0,1)")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val toks = df.select(col(idCol),
      explode(Text.tokens(col(textCol))).as("__t"))
    val uni = toks.groupBy(col("__t")).agg(count(lit(1)).as("__c1"))
    val total = uni.agg(sum(col("__c1")).as("__n"))
    val bis = df.select(col(idCol),
      explode(Text.shinglesNative(Text.tokens(col(textCol)), 2)).as("__bg"))
    val lm = bis.select(col("__bg")).groupBy(col("__bg"))
      .agg(count(lit(1)).as("__c2"))
      .join(uni.withColumnRenamed("__t", "__w1"),
        substring_index(col("__bg"), " ", 1) === col("__w1"))
      .join(uni.select(col("__t").as("__w2"), col("__c1").as("__cu")),
        substring_index(col("__bg"), " ", -1) === col("__w2"))
      .crossJoin(broadcast(total))
      .select(col("__bg"),
        log(lit(lambda) * (col("__c2").cast("double") / col("__c1")) +
          lit(1.0 - lambda) * (col("__cu").cast("double") / col("__n")))
          .as("__lp"))
    val per = bis.join(broadcast(lm), Seq("__bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__lp")), 6).as("avg_lp_jm"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_lp_jm"))
  }
}
