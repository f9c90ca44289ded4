package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** SemDeDup (Abbas et al. 2023): semantic deduplication over embeddings —
  * cluster the corpus, and within each cluster drop every vector that has
  * a more-preferred near-twin (cosine ≥ `tau`). Catches paraphrases and
  * re-encodings that survive every lexical dedup stage.
  *
  * The quadratic comparison is confined INSIDE clusters — that is the
  * algorithm's point: assignment is the narrow [[Similarity.ivfAssign]]
  * fold (zero shuffles), and the pair join shuffles on the cluster id
  * with per-cluster group sizes bounded by the clustering granularity
  * (at scale, k grows with n to hold cluster sizes ~constant, keeping
  * the per-cluster all-pairs affordable — the paper's regime). Keep
  * preference is deterministic: the smaller id of a qualifying pair
  * survives, so reruns mark identical losers.
  */
object SemDedup {

  /** (id, cluster, kept) for every corpus row: `kept` is false iff some
    * same-cluster vector with a smaller id sits within cosine ≥ `tau`. */
  def mark(corpus: DataFrame, centroids: DataFrame, idCol: String,
           embCol: String, centroidIdCol: String, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1]: $tau")
    val assigned = Similarity
      .ivfAssign(corpus, centroids, idCol, embCol, centroidIdCol)
      .select(col(idCol), col("centroid").as("cluster"))
      .join(corpus.select(col(idCol), col(embCol)), Seq(idCol))
    val x = assigned.select(col(idCol).as("__ida"), col("cluster"),
      col(embCol).as("__ea"))
    val y = assigned.select(col(idCol).as("__idb"), col("cluster"),
      col(embCol).as("__eb"))
    val losers = x.join(y, Seq("cluster"))
      .filter(col("__ida") < col("__idb"))
      .filter(Vectors.cosine(col("__ea"), col("__eb")) >= tau)
      .select(col("__idb").as(idCol))
      .distinct()
    assigned.select(col(idCol), col("cluster"))
      .join(losers.withColumn("__lost", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(!col("__lost"), lit(true)).as("kept"))
  }
}
