package graft.operators

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** In-engine PCA (top principal components) via distributed power
  * iteration with deflation — the dimension-reduction member of the
  * train-in-engine family ([[Similarity.kmeans]] centroids,
  * [[Similarity.pqTrain]] codebooks, [[Classifier.train]] weights,
  * [[UnigramLm.train]] vocabularies): embedding corpora get centered
  * and projected onto their dominant variance directions for
  * visualization, drift monitoring, and cheap low-D
  * bucketing/stratification of a vector corpus.
  *
  * Per component, v ← normalize(Σ_i x̃_i (x̃_iᵀ v)) with x̃ = x − mean:
  * the covariance matrix is never materialized — each iteration is one
  * narrow scoring pass (v rides the plan as a literal, the
  * k-means-centroid contract) plus one dim-keyed aggregate, so driver
  * state is components × d doubles, never d², and never corpus-sized.
  * Further components deflate the centered copy (x̃ ← x̃ − (x̃·v)v — a
  * narrow two-stage projection, re-checkpointed) and repeat; deflation
  * is exactly sign-invariant in IEEE arithmetic (negation is exact), so
  * the sign-fixed component can be used directly.
  *
  * Reproducible by construction (the [[Classifier.train]] discipline):
  * every floating sum is an ORDERED fold — per-row dots fold dimensions
  * ascending, per-dimension sums fold rows by id ascending, the norm
  * folds squares in dimension order on the driver — so two runs, or two
  * engines, walk bit-identical v trajectories. Deterministic init
  * v₀ = 1/√d (no RNG); each returned component is sign-fixed so its
  * first coordinate is non-negative.
  *
  * The TRAINER is sized for a sample (one `localCheckpoint`ed centered
  * copy per deflation level, iterated over); [[project]]/[[projectK]]
  * are the corpus-scale surface — narrow codegen'd dots per row against
  * literal (mean · component) constants, zero shuffles, streaming-safe. */
object Pca {

  /** `mean` and the unit `component`, both `d`-long; feed [[project]]. */
  case class Model(mean: Seq[Double], component: Seq[Double])

  /** `mean` plus `components` (each `d`-long, variance-descending);
    * feed [[projectK]]. */
  case class MultiModel(mean: Seq[Double], components: Seq[Seq[Double]])

  private def orderedSum(id: Column, v: Column, idType: DataType): Column =
    graft.functions.OrderedSum.orderedSumBy(id, v, idType)

  /** Per-row dot of the `__x` array against a literal vector — a left
    * fold in dimension order (the reproducibility contract). */
  private def rowDot(vlit: Column): Column =
    aggregate(zip_with(col("__x"), vlit, (x, vj) => x * vj),
      lit(0.0), (acc, t) => acc + t)

  /** Train the top component — [[topComponents]] with k = 1. */
  def topComponent(df: DataFrame, embCol: String, idCol: String,
                   iterations: Int = 3, maxDim: Int = 4096): Model = {
    val m = topComponents(df, embCol, idCol, nComponents = 1, iterations, maxDim)
    Model(m.mean, m.components.head)
  }

  /** Train the top `nComponents` principal components on `df`'s
    * `embCol` (`array<float|double>`, all rows the same non-zero
    * length, no nulls — checked, fail-fast). `idCol` orders the
    * reproducibility folds; `iterations` fixed rounds per component
    * (power iteration converges geometrically in λ₂/λ₁). */
  def topComponents(df: DataFrame, embCol: String, idCol: String,
                    nComponents: Int, iterations: Int = 3,
                    maxDim: Int = 4096): MultiModel = {
    require(nComponents >= 1, s"Pca: nComponents must be positive: $nComponents")
    require(iterations >= 1, s"Pca: iterations must be positive: $iterations")
    // NO kernel floor here (measured r19): widening this frame to
    // session parallelism regressed q137 1.04 -> 1.5 s steady — the
    // training loop is many tiny sequential jobs, so per-job task
    // scheduling dominates and extra tasks make it worse; the per-task
    // CPU is milliseconds, not the seconds/MB the floor exists for.
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
    require(nComponents <= d,
      s"Pca: nComponents $nComponents exceeds dim $d")

    val pos = xs
      .select(col("__id"), posexplode_outer(col("__x")).as(Seq("__j", "__v")))
      .filter(col("__v").isNotNull)
    val mean: Seq[Double] = pos.groupBy(col("__j"))
      .agg(orderedSum(col("__id"), col("__v"), xs.schema("__id").dataType).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1) / n).toMap
      .pipe(m => (0 until d).map(m(_)))

    val mlit = typedlit(mean)
    var centered = xs
      .select(col("__id"), zip_with(col("__x"), mlit, (x, m) => x - m).as("__x"))
      .localCheckpoint()

    val components = (1 to nComponents).map { c =>
      var v: Seq[Double] = Seq.fill(d)(1.0 / math.sqrt(d.toDouble))
      (1 to iterations).foreach { _ =>
        val vlit = typedlit(v)
        val contrib = centered
          .select(col("__id"), col("__x"), rowDot(vlit).as("__c"))
          // the generator arg is a bare attribute, so the non-outer
          // explode's InferFiltersFromGenerate rewrite has nothing
          // expensive to inline (the Chunk.split caveat doesn't bite)
          .select(col("__id"), col("__c"),
            posexplode(col("__x")).as(Seq("__j", "__xj")))
        val u: Seq[Double] = contrib
          .groupBy(col("__j"))
          .agg(orderedSum(col("__id"), col("__c") * col("__xj"),
            xs.schema("__id").dataType).as("__s"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
          .pipe(m => (0 until d).map(m(_)))
        val norm = math.sqrt(u.foldLeft(0.0)((acc, x) => acc + x * x))
        require(norm > 0,
          s"Pca: degenerate direction (zero variance along v, component $c)")
        v = u.map(_ / norm)
      }
      val signed = if (v.head < 0) v.map(x => -x) else v
      if (c < nComponents) {
        // deflate: x̃ ← x̃ − (x̃·v)v, staged so the per-row dot is
        // computed once; re-checkpoint to reset lineage per level
        val vlit = typedlit(signed)
        centered = centered
          .select(col("__id"), col("__x"), rowDot(vlit).as("__c"))
          .select(col("__id"),
            zip_with(col("__x"), vlit, (x, vj) => x - col("__c") * vj).as("__x"))
          .localCheckpoint()
      }
      signed
    }
    MultiModel(mean, components)
  }

  /** `(idCol, proj)`: the centered projection `(x − mean) · component`,
    * computed as `x·component − mean·component` (the linear identity)
    * so the hot path is ONE codegen'd [[graft.functions.Vectors.dot]]
    * against a plan-literal vector plus a literal subtraction — fully
    * narrow, no centering array ever materializes. 6-dp rounded. */
  def project(df: DataFrame, embCol: String, idCol: String,
              model: Model): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(col(idCol), projCol(embCol, model.mean, model.component).as("proj"))
  }

  /** `(idCol, p1..pk)`: [[project]] for every component of a
    * [[MultiModel]] — k narrow dots per row, still zero shuffles. */
  def projectK(df: DataFrame, embCol: String, idCol: String,
               model: MultiModel): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val cols = model.components.zipWithIndex.map { case (comp, i) =>
      projCol(embCol, model.mean, comp).as(s"p${i + 1}")
    }
    df.select(col(idCol) +: cols: _*)
  }

  private def projCol(embCol: String, mean: Seq[Double],
                      component: Seq[Double]): Column = {
    val vlit = typedlit(component)
    val c0 = mean.zip(component).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    round(graft.functions.Vectors.dot(col(embCol).cast("array<double>"), vlit)
      - lit(c0), 6)
  }
}
