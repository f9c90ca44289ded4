package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table catalog: one parquet file per table under a scale-factor
  * directory (TESTDATA.md). Mirrors the reference's index-pattern table
  * resolution (S1, reference dump-es-parquet:341-350): a name resolves to a
  * concrete path; `resolve` expands a glob pattern over the known names the
  * way the reference expands an index pattern via `indices.get_settings`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** S1 analog: glob pattern -> matching table names ("*" wildcard only,
    * like ES index patterns). */
  def resolve(pattern: String): Seq[String] = {
    val rx = ("^" + java.util.regex.Pattern.quote(pattern)
      .replace("*", "\\E.*\\Q") + "$").r
    names.filter(n => rx.findFirstIn(n).isDefined)
  }
}
