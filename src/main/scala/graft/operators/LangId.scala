package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** TRAINED language identification — char-n-gram one-vs-rest logistic
  * regression, the fastText langid recipe (Joulin et al. 2016) built
  * from the pieces already in the library: [[Text.charNgrams]] features
  * through [[FeatureHash.bucket]], one [[Classifier]] gradient-descent
  * model per language, prediction by margin argmax. The q26 marker-word
  * heuristic stays as the zero-training baseline; this is what the
  * multilingual curation stages (Mix/UniMax language keys, per-language
  * quality gates) actually need — languages sharing a vocabulary are
  * inseparable by word counts but separable by character statistics.
  *
  * Training: the labeled set's feature arrays are built ONCE
  * ([[Classifier.featureArrays]], localCheckpoint'd), then each language
  * attaches its own 0/1 label and runs [[Classifier.trainOnFeatures]] —
  * |langs| GD loops over one shared tokenize/hash/pack pass. Labeled
  * sets are bounded (the trainer posture); inference is the corpus-scale
  * surface.
  *
  * Inference: ONE feature pass per document scores ALL per-language
  * margins (each model's weight map rides the plan as a literal — the
  * k-means-centroid contract), and the argmax is a chained-when in
  * `langs` order (first listed language wins exact ties) — the same
  * deterministic CASE the oracle runs. No shuffle beyond the feature
  * pack's one groupBy; at 100 TB the cost is the char-n-gram explode,
  * linear in corpus bytes.
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
    * for every binary model) and the argmax tie order. */
  def train(df: DataFrame, textCol: String, langCol: String, idCol: String,
            langs: Seq[String], dim: Int, n: Int = 3,
            iterations: Int = 3, lr: Double = 0.5): Model = {
    require(langs.nonEmpty, "LangId.train: need at least one language")
    require(langs.distinct == langs, s"LangId.train: duplicate langs: $langs")
    val feats = Classifier
      .featureArrays(df, textCol, idCol, dim, Text.charNgrams(_, n))
      .join(df.select(col(idCol).as("__id"), col(langCol).as("__lang")),
        Seq("__id"))
      .localCheckpoint()
    val models = langs.map { l =>
      l -> Classifier.trainOnFeatures(
        feats.withColumn("__y", (col("__lang") === l).cast("double")),
        iterations, lr)
    }.toMap
    Model(langs, dim, n, models)
  }

  /** (idCol, pred) for every document: margin argmax over one shared
    * feature pass, ties to the earliest language in `model.langs`. */
  def predict(df: DataFrame, textCol: String, idCol: String,
              model: Model): DataFrame =
    Classifier.featureArrays(df, textCol, idCol, model.dim,
        Text.charNgrams(_, model.n))
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
