package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** TRAINED language identification — char-n-gram one-vs-rest logistic
  * regression, the fastText langid recipe (Joulin et al. 2016) built
  * from the pieces already in the library: [[graft.functions.Text.charNgrams]] features
  * through [[FeatureHash.bucket]], one [[Classifier]] gradient-descent
  * model per language, prediction by margin argmax. The q26 marker-word
  * heuristic stays as the zero-training baseline; this is what the
  * multilingual curation stages (Mix/UniMax language keys, per-language
  * quality gates) actually need — languages sharing a vocabulary are
  * inseparable by word counts but separable by character statistics.
  *
  * Training: the labeled set's feature arrays are built ONCE through
  * the FUSED [[graft.functions.CharBowExpr]] kernel
  * ([[Classifier.featureArraysCharBow]] — a pure narrow projection,
  * zero shuffles, localCheckpoint'd), then the GD loop runs VECTORIZED
  * across classes (see [[train]]). Labeled sets are bounded (the
  * trainer posture); inference is the corpus-scale surface.
  *
  * Inference: ONE narrow kernel pass per document scores ALL
  * per-language margins (each model's weight map rides the plan as a
  * literal — the k-means-centroid contract), and the argmax is a
  * chained-when in `langs` order (first listed language wins exact
  * ties) — the same deterministic CASE the oracle runs. ZERO shuffles
  * end to end; at 100 TB language ID costs what the scan costs.
  *
  * Reproducibility: gradients and margins are ordered folds throughout
  * (the [[Classifier]] contract), so trained weights — and therefore
  * every prediction — are bit-identical across runs, partitionings, and
  * engines (q184's DuckDB oracle re-derives the full unrolled training).
  */
object LangId {

  /** A trained multi-class model: per-language binary models plus the
    * geometry needed to score ([[predict]]) consistently. */
  case class Model(langs: Seq[String], dim: Int, n: Int,
                   models: Map[String, Classifier.Trained])

  /** One-vs-rest training over `langCol`-labeled documents. `langs`
    * fixes both the class set (labels outside it become all-zeros rows
    * for every binary model) and the argmax tie order.
    *
    * VECTORIZED across classes: all |langs| residual columns ride one
    * narrow projection, and each iteration runs ONE bias aggregate and
    * ONE bucket-keyed gradient aggregate carrying |langs| ordered folds
    * — 2 jobs per iteration instead of 2·|langs| (5-language training
    * at sf0.1 measured 22 s sequential → the shared-job form trades
    * job-launch overhead for per-job arithmetic). Per language the fold
    * order and arithmetic are EXACTLY Classifier.trainOnFeatures' —
    * LangIdSpec pins the vectorized weights bit-identical to |langs|
    * standalone binary trainings. */
  def train(df: DataFrame, textCol: String, langCol: String, idCol: String,
            langs: Seq[String], dim: Int, n: Int = 3,
            iterations: Int = 3, lr: Double = 0.5): Model = {
    require(langs.nonEmpty, "LangId.train: need at least one language")
    require(langs.distinct == langs, s"LangId.train: duplicate langs: $langs")
    require(iterations >= 1, s"iterations must be positive: $iterations")
    require(lr > 0, s"lr must be positive: $lr")
    val feats = Classifier
      .featureArraysCharBow(df, textCol, idCol, dim, n)
      .join(df.select(col(idCol).as("__id"), col(langCol).as("__lang")),
        Seq("__id"))
      // EAGER pin (measured r19: the lazy form cost q184 ~0.3 s steady
      // — the one-vs-rest loop's first actions pay the inline
      // materialization worse than one dedicated parallel pin job)
      .localCheckpoint()
    val m = feats.count().toDouble
    require(m > 0, "LangId.train: empty training set")
    val idx = langs.indices
    var weights = langs.map(_ -> Map.empty[Int, Double]).toMap
    var biases = langs.map(_ -> 0.0).toMap
    def orderedFold(gCol: String) = graft.functions.OrderedSum.orderedSumBy(
      col("__id"), col(gCol), feats.schema("__id").dataType)
    (1 to iterations).foreach { _ =>
      val scored = feats.select(
        Seq(col("__id"), col("__bs"), col("__xs")) ++ idx.map { i =>
          val l = langs(i)
          (sigmoid(Classifier.zColOf(Classifier.Trained(weights(l), biases(l))))
            - (col("__lang") === l).cast("double")).as(s"__r$i")
        }: _*)
      val biasRow = scored
        .agg(orderedFold("__r0").as("__bg0"),
          idx.tail.map(i => orderedFold(s"__r$i").as(s"__bg$i")): _*)
        .head()
      val biasGrads = idx.map(i => biasRow.getDouble(i) / m)
      val grad = scored
        .select(Seq(col("__id"),
          explode(arrays_zip(col("__bs"), col("__xs"))).as("__e")) ++
          idx.map(i => col(s"__r$i")): _*)
        .select(Seq(col("__e.__bs").as("__b"), col("__id")) ++
          idx.map(i => (col(s"__r$i") * col("__e.__xs")).as(s"__g$i")): _*)
        .groupBy(col("__b"))
        .agg(orderedFold("__g0").as("__gs0"),
          idx.tail.map(i => orderedFold(s"__g$i").as(s"__gs$i")): _*)
        .collect()
      weights = langs.zipWithIndex.map { case (l, i) =>
        val g = grad.map(r => r.getInt(0) -> r.getDouble(i + 1) / m).toMap
        l -> (weights(l).keySet ++ g.keySet).iterator.map { b =>
          b -> (weights(l).getOrElse(b, 0.0) - lr * g.getOrElse(b, 0.0))
        }.toMap
      }.toMap
      biases = langs.zipWithIndex.map { case (l, i) =>
        l -> (biases(l) - lr * biasGrads(i))
      }.toMap
    }
    Model(langs, dim, n,
      langs.map(l => l -> Classifier.Trained(weights(l), biases(l))).toMap)
  }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** (idCol, pred) for every document: margin argmax over one shared
    * feature pass, ties to the earliest language in `model.langs`. */
  def predict(df: DataFrame, textCol: String, idCol: String,
              model: Model): DataFrame =
    Classifier.featureArraysCharBow(df, textCol, idCol, model.dim, model.n)
      .select(col("__id").as(idCol), predFromZ(model).as("pred"))

  /** The chained-when argmax over per-language margins — language i wins
    * when its margin is >= every later language's (earlier winners have
    * already been taken by earlier branches). */
  private def predFromZ(model: Model): Column = {
    val zs = model.langs.map(l => Classifier.zColOf(model.models(l)))
    val last = model.langs.size - 1
    model.langs.zipWithIndex.init.foldRight(lit(model.langs(last)): Column) {
      case ((l, i), rest) =>
        when((i + 1 until model.langs.size)
          .map(j => zs(i) >= zs(j)).reduce(_ && _), l)
          .otherwise(rest)
    }
  }
}
