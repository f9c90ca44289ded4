package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixing — the "data mixture" step of a training
  * pipeline: down-sample each source to its target rate and union, with
  * membership decided by a content-addressed hash (the same device as
  * [[Splits]]): a document's keep/drop fate depends only on its id and
  * the source's salt, so mixtures are reproducible across reruns,
  * cluster sizes, and partitionings, and never need a global count or
  * shuffle — sampling is a map-side filter.
  */
object Mix {

  /** 0..9999 bucket from the salted id hash (0.01% rate resolution). */
  def bucket(id: Column, salt: String): Column =
    bucketSalted(id, lit(salt))

  /** [[bucket]] with a per-ROW salt column (e.g. the source name). */
  def bucketSalted(id: Column, salt: Column): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":"), salt)), 1, 8), 16, 10)
      .cast("long") % 10000

  /** Keep ~`rate` of rows, deterministically by id. */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double,
                   salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.where(bucket(col(idCol), salt) < lit((rate * 10000).round))
  }

  /** Temperature-balanced source mixing at α = 0.5 (the multilingual
    * corpus-balancing rule: sampling mass ∝ size^α, so each source keeps
    * `sqrt(min_size / size)` of its documents — big sources shrink
    * toward the smallest, which survives whole). α = 0.5 on purpose:
    * `sqrt` is IEEE-correctly-rounded, so thresholds derived from exact
    * integer counts are bit-identical in any engine — a general-α `pow`
    * is not, and a last-ulp difference flips keep/drop decisions at the
    * threshold. No float summation anywhere: the rule needs only each
    * source's count and the global min, both exact integers.
    *
    * Shape at 100 TB: one source-cardinality count (map-side combined),
    * a one-row min, thresholds broadcast back onto the corpus, then the
    * same map-side content-addressed filter as [[sampleByHash]] — the
    * corpus never shuffles. */
  def balanceSources(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__min_n"))
    val thresholds = counts.crossJoin(broadcast(minN))
      .select(col(sourceCol),
        round(sqrt(col("__min_n").cast("double") / col("__n")) * 10000)
          .cast("long").as("__thr"))
    df.join(broadcast(thresholds), Seq(sourceCol))
      .where(bucketSalted(col(idCol), col(sourceCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Mix `(name, source, rate)` corpora: each source sampled at its rate
    * (salted by its name, so the same id draws independently per source)
    * and tagged with a `source` column. */
  def corpora(sources: Seq[(String, DataFrame, Double)], idCol: String): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    sources.map { case (name, df, rate) =>
      sampleByHash(df, idCol, rate, salt = name)
        .withColumn("source", lit(name))
    }.reduce(_.unionByName(_))
  }
}
