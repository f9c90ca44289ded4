package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-free document embeddings — hashed bag of words through the
  * sign random projection: text → [[FeatureHash.denseBow]] counts over
  * `dim` md5 buckets → [[graft.functions.RandProj]] to an
  * `outDim`-component double vector. No external model, no network:
  * every text corpus gets an `embedding` column that unlocks the whole
  * embedding family ([[Similarity.knnGraph]]/stores, [[SemDedup]],
  * margin mining, IVF search) on raw text, approximating BoW cosine by
  * the JL guarantee (Achlioptas 2003 — the q98 projection). Cosine is
  * scale-invariant under the linear projection, so raw counts project
  * directly (no per-document normalization pass).
  *
  * Scale posture: one corpus shuffle (the denseBow pack, map-side
  * combined, per-group state bounded by `dim`) + one codegen'd kernel
  * call per row; the sign matrix rides the plan as a reference object.
  * Token-less documents embed as the zero vector — their cosine is
  * NaN/null against everything, the same contract as a zero embedding
  * from any encoder; gate empties upstream.
  *
  * Reproducibility: md5 buckets and the md5 sign matrix are
  * content-addressed (engine/rerun/cluster-size stable); count×(±scale)
  * products are exact (integer × power of two), summed in index order
  * by both the kernel and the oracle. */
object DocEmbed {

  /** (idCol, embedding array<double> of `outDim`). `outDim` must be a
    * power of four (the RandProj exact-scale contract). */
  def hashedProjection(df: DataFrame, textCol: String, idCol: String,
                       dim: Int = 128, outDim: Int = 16): DataFrame = {
    require(dim >= 1, s"DocEmbed: dim must be positive: $dim")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    FeatureHash.denseBow(df, textCol, idCol, dim)
      .select(col(idCol),
        graft.functions.RandProj.randProj(
          col("features").cast("array<double>"), dim, outDim).as("embedding"))
  }
}
