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
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % 10000

  /** Keep ~`rate` of rows, deterministically by id. */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double,
                   salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.where(bucket(col(idCol), salt) < lit((rate * 10000).round))
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
