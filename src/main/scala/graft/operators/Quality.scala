package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The prep pipeline's quality gate — ONE definition of the signals and
  * thresholds, shared by the batch pipeline (q64) and the streaming form
  * (streaming.DocPrep) so the two can never silently diverge: the q64
  * oracle mirrors exactly this arithmetic. Stateless row-at-a-time
  * codegen; valid in batch and streaming plans alike.
  */
object Quality {

  /** Keep rows whose `textCol` has at least `minTokens` whitespace tokens
    * and a type-token ratio of at least `minTtr`; adds `n_tokens`. */
  def filter(df: DataFrame, textCol: String,
             minTokens: Int = 10, minTtr: Double = 0.2): DataFrame =
    // staged + graft_once: 3 refs below, and the gate otherwise pushes
    // below this projection re-inlining the tokenizer per predicate
    df.withColumn("__tk", graft.functions.Once.once(Text.tokens(col(textCol))))
      .withColumn("n_tokens", size(col("__tk")).cast("long"))
      .withColumn("__ttr",
        size(array_distinct(col("__tk"))).cast("double") / size(col("__tk")))
      .where(col("n_tokens") >= minTokens && col("__ttr") >= minTtr)
      .drop("__tk", "__ttr")

  /** Quantile bucketing of a per-document score — the CCNet shape
    * (Wenzek et al. 2020): language-model score the corpus, cut it into
    * equal-mass quality buckets, then mix/filter by bucket. Adds a
    * `bucket` column in [1, nBuckets] (1 = lowest scores); a null score
    * keeps a null bucket (no evidence — same policy as the null
    * [[LangModel.bigramLogProb]] score it usually wraps).
    *
    * Scale shape: NOT a global ntile (a single-partition window over
    * the corpus). Thresholds are the exact (nBuckets−1) interior
    * quantiles via [[Percentiles.quantileContScan]] — the two-pass
    * rank scan, no single-task window, driver state = nBuckets−1
    * doubles — and the
    * assignment is a narrow codegen'd comparison fold, so the corpus
    * itself never funnels through one task. Equal-valued scores land in
    * the same bucket (score == threshold stays below it), so bucket
    * masses are equal only up to ties — the threshold contract, not
    * ntile's forced-equal-counts contract. */
  def scoreBuckets(df: DataFrame, scoreCol: String,
                   nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"scoreBuckets: need >= 2 buckets: $nBuckets")
    val thresholds = Percentiles.globalQuantiles(df, scoreCol,
      (1 until nBuckets).map(_.toDouble / nBuckets))
    assignBuckets(df, scoreCol, thresholds)
  }

  /** [[scoreBuckets]] with SKETCH-based thresholds — the 100 TB form:
    * the exact variant's threshold pass is a full distributed sort of
    * the score column (spill-safe, but a real shuffle of every row);
    * this one is a single mergeable `percentile_approx` aggregate
    * (KLL-style, map-side combined — threshold rank error bounded by
    * 1/accuracy), so threshold estimation costs one narrow pass.
    * Assignment semantics are IDENTICAL (same comparison fold, ties
    * below their threshold); only the thresholds are approximate, so
    * bucket masses are equal within the sketch's rank-error bound.
    * Engine-specific sketch ⇒ not oracle-pinned; QualityBucketsSpec
    * pins it against the exact form instead. */
  def scoreBucketsApprox(df: DataFrame, scoreCol: String,
                         nBuckets: Int = 10, accuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, s"scoreBucketsApprox: need >= 2 buckets: $nBuckets")
    require(accuracy >= nBuckets,
      s"scoreBucketsApprox: accuracy $accuracy below nBuckets $nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val row = df.agg(percentile_approx(col(scoreCol),
      typedlit(ps), lit(accuracy))).head()
    require(!row.isNullAt(0),
      s"scoreBucketsApprox: no non-null '$scoreCol' values to bucket")
    assignBuckets(df, scoreCol, row.getSeq[Double](0))
  }

  /** PER-GROUP [[scoreBuckets]] — the full CCNet contract (Wenzek et
    * al. 2020 §4.3 cut their LM-score terciles PER LANGUAGE, because a
    * well-scored Tamil document and a well-scored English document live
    * on different score scales): thresholds are exact per-group
    * quantiles, assignment is the same comparison fold, so "head" means
    * top-of-ITS-language everywhere.
    *
    * Scale shape: group keys here are languages/sources — few groups,
    * each corpus-sized — exactly the funnel case the per-group window
    * quantile dies on, so thresholds come from
    * [[Percentiles.quantileContScanGrouped]] (range-partition rank scan,
    * giant groups spread across partitions, bit-identical interpolation)
    * and land as a |groups|-row broadcast join; the assignment itself is
    * a narrow codegen'd fold, so the corpus never funnels through one
    * task and never shuffles for the bucketing at all.
    *
    * Null policy: a null score keeps a null bucket (as [[scoreBuckets]]);
    * a group whose scores are ALL null gets null buckets rather than
    * failing the whole corpus (the global form's fail-fast guards a
    * single degenerate threshold set; per-group, one empty language must
    * not kill the run — count the nulls downstream with a Checks gate). */
  def scoreBucketsBy(df: DataFrame, scoreCol: String, byCols: Seq[String],
                     nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"scoreBucketsBy: need >= 2 buckets: $nBuckets")
    require(byCols.nonEmpty, "scoreBucketsBy: empty byCols — use scoreBuckets")
    val names = (1 until nBuckets).map(i => s"__graft_bt_$i")
    val ps = names.zip((1 until nBuckets).map(_.toDouble / nBuckets))
    val th = Percentiles.quantileContScanGrouped(df, byCols, scoreCol, ps)
    val d = df.as("__graft_d")
    val t = broadcast(th.as("__graft_t"))
    val cond = byCols.map(c => col(s"__graft_d.`$c`") <=> col(s"__graft_t.`$c`"))
      .reduce(_ && _)
    val score = col(s"__graft_d.`$scoreCol`")
    val b = names.map(n => (score > col(s"__graft_t.`$n`")).cast("int"))
      .reduceLeft(_ + _)
    d.join(t, cond)
      .select(df.columns.map(c => col(s"__graft_d.`$c`")) :+
        when(score.isNotNull, (b + 1).cast("long")).as("bucket"): _*)
  }

  /** The shared narrow assignment fold: bucket = 1 + |thresholds below
    * the score|; null scores keep a null bucket. */
  private def assignBuckets(df: DataFrame, scoreCol: String,
                            thresholds: Seq[Double]): DataFrame = {
    val b = thresholds
      .map(t => (col(scoreCol) > lit(t)).cast("int")).reduceLeft(_ + _)
    df.withColumn("bucket", (b + 1).cast("long"))
  }

  /** The Gopher rule set's stopword witness list (Rae et al. 2021,
    * §A1.1.2: "contains at least 2 of the following English words"). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")

  /** Gopher-style document quality rules (Rae et al. 2021, §A1.1.2 — the
    * published MassiveWeb heuristics, parameterized): per-document word
    * count bounds, mean word length bounds, symbol-to-word ratio ('#'
    * characters + '...' occurrences), alphabetic-word fraction, and a
    * stopword-count floor. Emits every signal plus the combined `keep`
    * verdict rather than silently filtering — downstream callers can
    * audit WHICH rule fired (the Dolma-style attribute discipline) or
    * gate on `keep`.
    *
    * Complements [[filter]] (token count + type-token ratio) and
    * [[Repetition]] (dup-n-gram ceilings): together they are the
    * rule-based third of the quality triad beside the trained classifier
    * gate ([[Classifier]]) and the LM scorers ([[LangModel]]).
    *
    * Scale posture: a single narrow codegen'd projection — no shuffle,
    * no state; every signal is an integer-exact fold over the token
    * array, so the emitted doubles are bit-reproducible (oracle-safe). */
  def gopherFlags(df: DataFrame, textCol: String,
                  minWords: Int = 10, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
                  minStop: Int = 2,
                  stopwords: Seq[String] = GopherStopwords): DataFrame = {
    val t = col(textCol)
    df.withColumn("__tk", Text.tokens(t)) // staged: 5 refs below
      .withColumn("n_words", size(col("__tk")).cast("long"))
      .withColumn("mean_word_len",
        aggregate(col("__tk"), lit(0L), (a, w) => a + length(w))
          .cast("double") / col("n_words"))
      .withColumn("symbol_ratio",
        ((length(t) - length(translate(t, "#", ""))) +
          (size(split(t, "\\.\\.\\.", -1)) - 1)).cast("double") / col("n_words"))
      .withColumn("alpha_frac",
        size(org.apache.spark.sql.functions.filter(col("__tk"),
          w => w.rlike("[A-Za-z]"))).cast("double") / col("n_words"))
      .withColumn("n_stop",
        size(org.apache.spark.sql.functions.filter(col("__tk"),
          w => w.isin(stopwords: _*))).cast("long"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanLen &&
          col("mean_word_len") <= maxMeanLen &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("alpha_frac") >= minAlphaFrac &&
          col("n_stop") >= minStop)
      .drop("__tk")
  }
}
