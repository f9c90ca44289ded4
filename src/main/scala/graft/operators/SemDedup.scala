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

  /** The semantic STORE of a shipped corpus — (cluster, id, embedding)
    * under a FIXED centroid set: everything incremental semantic dedup
    * needs to remember. Unlike the text stores ([[Dedup
    * .fingerprintStore]] / [[Dedup.signatureStore]]) the embeddings
    * themselves are the irreducible comparison state, but they are the
    * SMALL representation (kilobytes per document of text), and
    * persisting them clustered means a probe only ever reads the
    * clusters the batch lands in. Persist with [[writeSemanticStore]]
    * (bucketed on `cluster`) for exchange-free probes. */
  def semanticStore(corpus: DataFrame, centroids: DataFrame, idCol: String,
                    embCol: String, centroidIdCol: String): DataFrame =
    Similarity.ivfAssign(corpus, centroids, idCol, embCol, centroidIdCol)
      .select(col(idCol), col("centroid").as("cluster"))
      .join(corpus.select(col(idCol), col(embCol)), Seq(idCol))
      .select(col("cluster"), col(idCol), col(embCol))

  /** Persists [[semanticStore]] bucketed on the cluster id. */
  def writeSemanticStore(corpus: DataFrame, centroids: DataFrame,
                         idCol: String, embCol: String, centroidIdCol: String,
                         table: String, buckets: Int): Unit =
    graft.sinks.Bucketing.writeBucketed(
      semanticStore(corpus, centroids, idCol, embCol, centroidIdCol),
      table, Seq("cluster"), buckets)

  /** The commit step for the semantic store (the
    * [[graft.operators.Dedup.appendToFingerprintStore]] discipline):
    * appends an admitted snapshot's (cluster, id, embedding) rows under
    * the SAME centroids, pre-partitioned on the table's bucket spec.
    * After this, re-ingesting the snapshot (or anything within tau of
    * it) admits nothing through [[againstCorpus]]. Admitted rows are new
    * against the store by construction, but the append still anti-joins
    * the store on (cluster, `idCol`) first — the sibling stores'
    * crash-retry rule — so a double-COMMIT of the same snapshot cannot
    * seed duplicate (cluster, id, embedding) rows (duplicates could not
    * flip any-match admission verdicts, but every future probe of the
    * cluster would pay the duplicate comparisons forever). */
  def appendToSemanticStore(admitted: DataFrame, centroids: DataFrame,
                            idCol: String, embCol: String,
                            centroidIdCol: String, table: String): Unit = {
    val spark = admitted.sparkSession
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val buckets = meta.bucketSpec
      .getOrElse(throw new IllegalArgumentException(
        s"'$table' is not a bucketed store table")).numBuckets
    semanticStore(admitted, centroids, idCol, embCol, centroidIdCol)
      .join(spark.table(table).select(col("cluster"), col(idCol)),
        Seq("cluster", idCol), "left_anti")
      .repartition(buckets, col("cluster"))
      .write.mode("append").insertInto(table)
  }

  /** Prototypicality ranking (the SSL-Prototypes / D4 curation stage
    * that composes after [[mark]]): every vector's cosine to its OWN
    * assigned centroid, ranked within its cluster (rank 1 = most
    * prototypical — closest to the cluster's center of mass, the
    * easy/redundant examples the D4 recipe prunes first; high ranks =
    * the cluster's diverse tail). Returns (id, cluster, proto, rk).
    * Callers act by filtering on either end: drop low ranks to cut
    * prototype redundancy, drop `proto` below a floor to cut outliers.
    *
    * Scale: assignment + the cosine are one narrow fold per row (zero
    * shuffles — proto IS the assignment score); only the within-cluster
    * rank shuffles, keyed on the cluster id with cluster-bounded groups
    * (spillable window sort, the bounded-cluster regime again). */
  def prototypicality(corpus: DataFrame, centroids: DataFrame, idCol: String,
                      embCol: String, centroidIdCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("proto").desc, col(idCol))
    Similarity.ivfAssign(corpus, centroids, idCol, embCol, centroidIdCol)
      .select(col(idCol), col("centroid").as("cluster"),
        round(col("cos"), 6).as("proto"))
      .withColumn("rk", row_number().over(w).cast("long"))
  }

  /** Incremental SEMANTIC dedup — the embedding member of the
    * cross-snapshot family ([[Dedup.againstCorpus]] = exact text,
    * [[Dedup.nearDupsAgainstCorpus]] = text shapes, this = meaning): a
    * batch vector is dropped when its own cluster in the shipped
    * `store` holds ANY vector within cosine ≥ `tau` (the SemDeDup
    * criterion, corpus side immutable — old vectors always win); the
    * surviving batch then twin-drops against ITSELF under the same
    * centroids ([[mark]], smaller id wins). Returns admitted batch
    * rows, all columns intact.
    *
    * Scale: batch assignment is the narrow ivfAssign fold (zero
    * shuffles); the probe join is keyed on the cluster id — exchange-
    * free on the store side when it is the [[writeSemanticStore]]
    * bucketed table — and compares batch × |that cluster| only, the
    * paper's bounded-cluster regime. The stage boundary materializes
    * once (batch-sized) before the in-batch mark, the
    * [[Dedup.nearDupsAgainstCorpus]] discipline. */
  def againstCorpus(batch: DataFrame, store: DataFrame, centroids: DataFrame,
                    idCol: String, embCol: String, centroidIdCol: String,
                    tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1]: $tau")
    val assigned = Similarity
      .ivfAssign(batch, centroids, idCol, embCol, centroidIdCol)
      .select(col(idCol), col("centroid").as("cluster"))
      .join(batch.select(col(idCol), col(embCol)), Seq(idCol))
    val hit = assigned
      .join(store.select(col("cluster"), col(embCol).as("__ce")), Seq("cluster"))
      .filter(graft.functions.Vectors.cosine(col(embCol), col("__ce")) >= tau)
      .select(col(idCol)).distinct()
    val novel = batch.join(hit, Seq(idCol), "left_anti").localCheckpoint()
    novel.join(
      mark(novel, centroids, idCol, embCol, centroidIdCol, tau)
        .filter(!col("kept")).select(col(idCol)),
      Seq(idCol), "left_anti")
  }
}
