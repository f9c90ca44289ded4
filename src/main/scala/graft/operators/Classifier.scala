package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Linear (logistic) document scoring over hashed bag-of-words features —
  * the quality-classifier stage of a curation pipeline (fastText-style
  * quality gates: train a small linear model on labeled good/bad
  * documents, then score the whole corpus and keep what clears a
  * threshold). Inference is the 100 TB surface (every document, fully
  * narrow); [[train]] is the distributed fixed-iteration trainer over
  * the labeled set — which may itself be millions of rows, hence
  * gradient-as-aggregate rather than a driver-side solver.
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

  /** A trained model: the (sparse) weight map and bias feed straight
    * into [[scoreCol]] / [[score]] / [[gate]]. */
  case class Trained(weights: Map[Int, Double], bias: Double)

  /** Per-document hashed features in TRAINING form: (`__id`, `__y`,
    * `__bs` bucket ids sorted ascending, `__xs` aligned normalized
    * counts cnt/n_tokens). Token-less documents keep empty arrays (they
    * still carry a label, so they still move the bias). The arrays are
    * SORTED so every later fold over them has one defined order — the
    * reproducibility backbone of [[train]]. */
  private def features(df: DataFrame, textCol: String, labelCol: String,
                       idCol: String, dim: Int,
                       tok: Column => Column = Text.tokens): DataFrame = {
    val y0 = col(labelCol).cast("double")
    // the Audit null-id discipline: a bad label corrupts every gradient
    // silently — fail at run time with a clear message instead
    val y = when(y0 === 0.0 || y0 === 1.0, y0)
      .otherwise(raise_error(lit(
        s"Classifier.train: '$labelCol' must be 0 or 1")).cast("double"))
    df.select(col(idCol).as("__id"), y.as("__y"))
      .join(featureArrays(df, textCol, idCol, dim, tok), Seq("__id"))
  }

  /** Label-free feature arrays — (`__id`, `__bs`, `__xs`) — shared by
    * [[features]] and the one-vs-rest [[LangId]] trainer (which builds
    * them ONCE and attaches a different 0/1 label per language, instead
    * of re-tokenizing the labeled set per class). */
  private[operators] def featureArrays(df: DataFrame, textCol: String,
                                       idCol: String, dim: Int,
                                       tok: Column => Column = Text.tokens)
      : DataFrame = {
    val toks = coalesce(tok(col(textCol)), array().cast("array<string>"))
    // kernel floor (Par.widen): tokenization + hashing run inside the
    // input's scan stage; a one-file input serializes them on one core
    val base = Par.widen(df).select(col(idCol).as("__id"), toks.as("__toks"))
    val packed = base
      .select(col("__id"), size(col("__toks")).as("__n"),
        explode(col("__toks")).as("__t"))
      .select(col("__id"), col("__n"),
        FeatureHash.bucket(col("__t"), dim).cast("int").as("__b"))
      .groupBy(col("__id"), col("__n"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("__id"))
      .agg(array_sort(collect_list(struct(col("__b"), col("__c"), col("__n"))))
        .as("__bcn"))
      .select(col("__id"),
        transform(col("__bcn"), s => s.getField("__b")).as("__bs"),
        transform(col("__bcn"), s =>
          s.getField("__c").cast("double") / s.getField("__n").cast("double"))
          .as("__xs"))
    base.select(col("__id")).join(packed, Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("__bs"), array().cast("array<int>")).as("__bs"),
        coalesce(col("__xs"), array().cast("array<double>")).as("__xs"))
  }

  /** [[featureArrays]] specialized to char-n-gram features through the
    * FUSED [[graft.functions.CharBowExpr]] kernel: the gram transform →
    * explode → md5 bucket → two shuffled groupBys → sorted pack
    * pipeline as ONE codegen'd call per row — a pure NARROW projection,
    * zero shuffles (the generic path shuffles every gram twice). Values
    * are bit-identical to `featureArrays(df, …, Text.charNgrams(_, n))`
    * (ClassifierSpec differential); at 100 TB this is the difference
    * between feature extraction riding the scan and feature extraction
    * being a corpus-sized shuffle. */
  private[operators] def featureArraysCharBow(df: DataFrame, textCol: String,
                                              idCol: String, dim: Int,
                                              n: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    // kernel floor: the fused char-BoW kernel is the heaviest per-row
    // call in the trainer path — don't let it ride a one-task scan
    Par.widen(df).select(col(idCol).as("__id"),
        call_function(graft.functions.CharBowExpr.name,
          col(textCol), lit(n), lit(dim)).as("__bow"))
      .select(col("__id"),
        coalesce(col("__bow.bs"), array().cast("array<int>")).as("__bs"),
        coalesce(col("__bow.xs"), array().cast("array<double>")).as("__xs"))
  }

  /** The margin z = bias + Σ w[b]·x as a left fold over the doc's
    * bucket-sorted feature arrays — the SAME term order on any engine,
    * any partitioning (absent buckets contribute an exact +0.0). */
  private def zCol(weights: Map[Int, Double], bias: Double): Column = {
    if (weights.isEmpty) lit(bias)
    else {
      val wlit = typedlit(weights)
      lit(bias) + aggregate(
        zip_with(col("__bs"), col("__xs"),
          (b, x) => coalesce(element_at(wlit, b), lit(0.0)) * x),
        lit(0.0), (acc, v) => acc + v)
    }
  }

  /** Distributed full-batch logistic-regression training over hashed
    * bag-of-words features — the missing half of the quality gate:
    * `iterations` rounds of gradient descent with deterministic
    * all-zeros init, mean log-loss gradient, fixed learning rate.
    *
    * Each iteration is ONE narrow scoring pass over the materialized
    * feature frame (the weight map rides the plan as a literal, the
    * k-means-centroid contract) followed by one bucket-keyed aggregate
    * for the weight gradient and one global aggregate for the bias
    * gradient; driver state is the dim-bounded weight map. The labeled
    * set never re-derives its features (one `localCheckpoint` up
    * front — the q108 stage-boundary lesson, here amortized across all
    * iterations).
    *
    * Reproducible by construction, not by luck: every floating sum in
    * the gradient is an ORDERED fold (docs by id, buckets ascending —
    * the q92 codebook lesson: a bare SUM adds doubles in
    * thread-dependent order, so two runs of the same job disagree in
    * the last ulp). Per-bucket aggregate state is O(labeled docs
    * containing that bucket) — the trainer is sized for labeled sets
    * (up to millions of rows), not for scoring corpora; inference
    * ([[score]]/[[gate]]) is the surface that scales to the corpus.
    *
    * Cite: fastText-style linear gate (Joulin et al. 2016); the
    * reference tool has no classifier — this extends the curation
    * surface (SURVEY §2.3). */
  def train(df: DataFrame, textCol: String, labelCol: String, idCol: String,
            dim: Int, iterations: Int = 10, lr: Double = 0.5,
            tok: Column => Column = Text.tokens): Trained = {
    require(dim >= 1, s"dim must be positive: $dim")
    // lazy pin: materializes inside trainOnFeatures' first action (the
    // count) instead of paying its own job — each iteration still reads
    // the cached frame
    val feats = features(df, textCol, labelCol, idCol, dim, tok)
      .localCheckpoint(false)
    trainOnFeatures(feats, iterations, lr)
  }

  /** The GD loop over an already-materialized (`__id`, `__y`, `__bs`,
    * `__xs`) feature frame — callers (train, the one-vs-rest LangId)
    * checkpoint the frame first so iterations never re-derive
    * features. */
  private[operators] def trainOnFeatures(feats: DataFrame, iterations: Int,
                                         lr: Double): Trained = {
    require(iterations >= 1, s"iterations must be positive: $iterations")
    require(lr > 0, s"lr must be positive: $lr")
    val m = feats.count().toDouble
    require(m > 0, "Classifier.train: empty training set")
    var weights = Map.empty[Int, Double]
    var bias = 0.0
    (1 to iterations).foreach { _ =>
      val scored = feats.withColumn("__r",
        sigmoid(zCol(weights, bias)) - col("__y"))
      val biasGrad = scored
        .agg(graft.functions.OrderedSum.orderedSumBy(col("__id"), col("__r"),
          feats.schema("__id").dataType))
        .head.getDouble(0) / m
      val grad = scored
        .select(col("__id"), col("__r"),
          explode(arrays_zip(col("__bs"), col("__xs"))).as("__e"))
        .select(col("__e.__bs").as("__b"), col("__id"),
          (col("__r") * col("__e.__xs")).as("__g"))
        .groupBy(col("__b"))
        .agg(graft.functions.OrderedSum.orderedSumBy(col("__id"), col("__g"),
          feats.schema("__id").dataType).as("__gs"))
        .collect()
        .map(r => r.getInt(0) -> r.getDouble(1) / m).toMap
      weights = (weights.keySet ++ grad.keySet).iterator.map { b =>
        b -> (weights.getOrElse(b, 0.0) - lr * grad.getOrElse(b, 0.0))
      }.toMap
      bias -= lr * biasGrad
    }
    Trained(weights, bias)
  }

  /** (idCol, label, predicted) for every document under a trained
    * model, scoring with the SAME bucket-sorted fold arithmetic the
    * trainer used — the engine-portable form of [[score]] (whose
    * token-order fold is equivalent up to summation order). Prediction
    * is the sign of the margin (score ≥ ½ ⇔ z ≥ 0), a discrete output
    * stable under last-ulp noise — the q92 assignments-not-doubles
    * oracle contract. */
  def predict(df: DataFrame, textCol: String, labelCol: String,
              idCol: String, model: Trained, dim: Int,
              tok: Column => Column = Text.tokens): DataFrame =
    predictOnFeatures(features(df, textCol, labelCol, idCol, dim, tok),
      idCol, model)

  private def predictOnFeatures(feats: DataFrame, idCol: String,
                                model: Trained): DataFrame =
    feats.select(col("__id").as(idCol), col("__y").cast("long").as("label"),
      (zCol(model.weights, model.bias) >= 0).cast("long").as("predicted"))

  /** [[train]] followed by [[predict]] over the SAME labeled frame,
    * deriving (and pinning) the hashed feature frame ONCE — the
    * train-then-score-the-training-set evaluation loop otherwise pays
    * the CPU-dense tokenize+hash kernel twice (measured q120: two
    * identical ~8 s-CPU feature stages per run). Identical output to
    * `predict(df, …, train(df, …), …)` by construction: same feature
    * rows, same weight trajectory, same margin arithmetic. */
  def trainPredict(df: DataFrame, textCol: String, labelCol: String,
                   idCol: String, dim: Int, iterations: Int = 10,
                   lr: Double = 0.5,
                   tok: Column => Column = Text.tokens): DataFrame = {
    require(dim >= 1, s"dim must be positive: $dim")
    val feats = features(df, textCol, labelCol, idCol, dim, tok)
      .localCheckpoint(false)
    predictOnFeatures(feats, idCol, trainOnFeatures(feats, iterations, lr))
  }

  /** The margin of a trained model over [[featureArrays]] columns —
    * exposed for multi-model consumers ([[LangId]]'s per-language
    * argmax) so N models score ONE shared feature pass. */
  private[operators] def zColOf(model: Trained): Column =
    zCol(model.weights, model.bias)
}
