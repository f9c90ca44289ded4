package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Hashing-trick featurization (hashed bag-of-words): token -> fixed
  * bucket via md5, counts per (doc, bucket) — the embedding-free feature
  * vector for cheap classifiers/cluster seeds over corpora whose
  * vocabulary is unbounded (the point of the trick: the feature space is
  * `dim` no matter how many distinct tokens exist, collisions are the
  * accepted trade).
  *
  * Buckets reuse the [[Splits]] construction (leading 32 md5 bits), so
  * assignments are stable across reruns, engines, and cluster sizes.
  * Sparse form is ONE corpus shuffle (groupBy (id, bucket), map-side
  * combined). Dense form adds a doc-sized regroup that packs the ≤ dim
  * buckets into an `array<long>` ready for the Vectors/Similarity ops —
  * per-group state is bounded by `dim`, never by vocabulary.
  */
object FeatureHash {

  /** Stable bucket 0..dim-1 of a token (leading 32 md5 bits, mod dim). */
  def bucket(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % dim

  /** Sparse hashed BoW: (id, bucket, cnt), nonzero buckets only. */
  def sparseBow(df: DataFrame, textCol: String, idCol: String,
                dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be positive: $dim")
    df.select(col(idCol), explode(Text.tokens(col(textCol))).as("__t"))
      .select(col(idCol), bucket(col("__t"), dim).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Dense hashed BoW: (id, features array<long> of length `dim`).
    * Token-less documents keep an all-zero vector. */
  def denseBow(df: DataFrame, textCol: String, idCol: String,
               dim: Int): DataFrame = {
    val packed = sparseBow(df, textCol, idCol, dim)
      .groupBy(col(idCol))
      .agg(map_from_arrays(collect_list(col("bucket")),
        collect_list(col("cnt"))).as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("__m"), i), lit(0L))).as("features"))
    df.select(col(idCol)).join(packed, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("features"),
          array_repeat(lit(0L), dim)).as("features"))
  }
}
