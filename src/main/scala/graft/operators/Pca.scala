package graft.operators

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine PCA (top principal component) via distributed power
  * iteration — the dimension-reduction member of the train-in-engine
  * family ([[Similarity.kmeans]] centroids, [[Similarity.pqTrain]]
  * codebooks, [[Classifier.train]] weights, [[UnigramLm.train]]
  * vocabularies): embedding corpora get centered and projected onto
  * their dominant variance direction for visualization, drift
  * monitoring, and cheap 1-D bucketing/stratification of a vector
  * corpus.
  *
  * v ← normalize(Σ_i x̃_i (x̃_iᵀ v)) with x̃ = x − mean: the covariance
  * matrix is never materialized — each iteration is one narrow scoring
  * pass (v rides the plan as a literal, the k-means-centroid contract)
  * plus one dim-keyed aggregate, so driver state is d doubles, never
  * d², and never corpus-sized.
  *
  * Reproducible by construction (the [[Classifier.train]] discipline):
  * every floating sum is an ORDERED fold — per-row dots fold dimensions
  * ascending, per-dimension sums fold rows by id ascending, the norm
  * folds squares in dimension order on the driver — so two runs, or two
  * engines, walk bit-identical v trajectories. Deterministic init
  * v₀ = 1/√d (no RNG); the returned component is sign-fixed so its
  * first coordinate is non-negative.
  *
  * The TRAINER is sized for a sample (one `localCheckpoint`ed centered
  * copy of the input, iterated over); [[project]] is the corpus-scale
  * surface — a narrow codegen'd dot per row against literal (mean ·
  * component) constants, zero shuffles, streaming-safe. */
object Pca {

  /** `mean` and the unit `component`, both `d`-long; feed [[project]]. */
  case class Model(mean: Seq[Double], component: Seq[Double])

  private def orderedSum(id: Column, v: Column): Column =
    aggregate(array_sort(collect_list(struct(id.as("__o"), v.as("__s")))),
      lit(0.0), (acc, s) => acc + s.getField("__s"))

  /** Train on `df`'s `embCol` (`array<float|double>`, all rows the same
    * non-zero length, no nulls — checked, fail-fast). `idCol` orders the
    * reproducibility folds; `iterations` fixed rounds (power iteration
    * converges geometrically in λ₂/λ₁ — a handful suffices). */
  def topComponent(df: DataFrame, embCol: String, idCol: String,
                   iterations: Int = 3, maxDim: Int = 4096): Model = {
    require(iterations >= 1, s"Pca: iterations must be positive: $iterations")
    val xs = df.select(col(idCol).as("__id"),
      col(embCol).cast("array<double>").as("__x"))
    // size(null) = -1 with ANSI off, so one min/max pass catches nulls,
    // empties, and ragged lengths together
    val s0 = xs.agg(min(size(col("__x"))).as("lo"), max(size(col("__x"))).as("hi"),
      count(lit(1)).as("n")).head()
    val n = s0.getLong(2)
    require(n > 0, "Pca: empty input") // before getInt: min/max are null here
    val (lo, hi) = (s0.getInt(0), s0.getInt(1))
    require(lo == hi && lo >= 1,
      s"Pca: embeddings must be non-null, non-empty, equal length (got $lo..$hi)")
    require(lo <= maxDim, s"Pca: dim $lo exceeds maxDim $maxDim " +
      "(driver state and plan literals are O(dim))")
    val d = lo

    val pos = xs
      .select(col("__id"), posexplode_outer(col("__x")).as(Seq("__j", "__v")))
      .filter(col("__v").isNotNull)
    val mean: Seq[Double] = pos.groupBy(col("__j"))
      .agg(orderedSum(col("__id"), col("__v")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1) / n).toMap
      .pipe(m => (0 until d).map(m(_)))

    val mlit = typedlit(mean)
    val centered = xs
      .select(col("__id"), zip_with(col("__x"), mlit, (x, m) => x - m).as("__x"))
      .localCheckpoint()

    var v: Seq[Double] = Seq.fill(d)(1.0 / math.sqrt(d.toDouble))
    (1 to iterations).foreach { _ =>
      val vlit = typedlit(v)
      val contrib = centered
        .select(col("__id"), col("__x"),
          aggregate(zip_with(col("__x"), vlit, (x, vj) => x * vj),
            lit(0.0), (acc, t) => acc + t).as("__c"))
        // the generator arg is a bare attribute, so the non-outer
        // explode's InferFiltersFromGenerate rewrite has nothing
        // expensive to inline (the Chunk.split caveat doesn't bite)
        .select(col("__id"), col("__c"),
          posexplode(col("__x")).as(Seq("__j", "__xj")))
      val u: Seq[Double] = contrib
        .groupBy(col("__j"))
        .agg(orderedSum(col("__id"), col("__c") * col("__xj")).as("__s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        .pipe(m => (0 until d).map(m(_)))
      val norm = math.sqrt(u.foldLeft(0.0)((acc, x) => acc + x * x))
      require(norm > 0, "Pca: degenerate direction (zero variance along v)")
      v = u.map(_ / norm)
    }
    val signed = if (v.head < 0) v.map(x => -x) else v
    Model(mean, signed)
  }

  /** `(idCol, proj)`: the centered projection `(x − mean) · component`,
    * computed as `x·component − mean·component` (the linear identity)
    * so the hot path is ONE codegen'd [[graft.functions.Vectors.dot]]
    * against a plan-literal vector plus a literal subtraction — fully
    * narrow, no centering array ever materializes. 6-dp rounded. */
  def project(df: DataFrame, embCol: String, idCol: String,
              model: Model): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val vlit = typedlit(model.component)
    val c0 = model.mean.zip(model.component)
      .foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    df.select(col(idCol),
      round(graft.functions.Vectors.dot(col(embCol).cast("array<double>"), vlit)
        - lit(c0), 6).as("proj"))
  }
}
