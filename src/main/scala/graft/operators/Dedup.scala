package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Library-facing deduplication operators — the packaged `df => df` forms
  * of the oracle-checked query shapes (q20–q23, q29). All shuffle exactly
  * once on their dedup key and never join the corpus against itself.
  */
object Dedup {

  /** Exact dedup by normalized-text fingerprint: keeps the lowest `idCol`
    * per duplicate group (deterministic winner). One shuffle on the
    * fingerprint. */
  def exactByText(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = Text.fingerprint(col(textCol)).as("__fp")
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    df.withColumn("__fp", fp)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Exact dedup by arbitrary key columns (`dropDuplicates` with a
    * deterministic winner instead of an arbitrary one). */
  def exactByKey(df: DataFrame, keys: Seq[String], orderBy: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderBy))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Near-duplicate candidate pairs via banded MinHash LSH (native
    * codegen'd signatures): returns (`idCol`_a, `idCol`_b) with a < b.
    * One signature pass, one shuffle on (band, sig), in-bucket pair
    * expansion — never a corpus self-join. */
  def nearDupCandidates(df: DataFrame, textCol: String, idCol: String,
                        shingle: Int = 5, bands: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val a = s"${idCol}_a"
    val b = s"${idCol}_b"
    df.select(col(idCol), Text.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), posexplode(Text.minhashBandsNative(col("__tk"), shingle, bands)))
      .select(col(idCol), col("pos").as("__band"), col("col").as("__sig"))
      .filter(col("__sig").isNotNull)
      .groupBy(col("__band"), col("__sig"))
      .agg(sort_array(collect_list(col(idCol))).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(explode(flatten(transform(col("__ids"), (x, i) =>
        transform(slice(col("__ids"), i + 2, size(col("__ids"))),
          y => struct(x.as(a), y.as(b)))))).as("__p"))
      .select(col(s"__p.$a"), col(s"__p.$b"))
      .distinct()
  }

  /** Per-document SimHash fingerprints (native codegen'd): near-identical
    * documents land within small Hamming distance; equal values are
    * near-dup candidates at one shuffle via groupBy(simhash). */
  def simhashes(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(col(idCol), Text.simhashNative(Text.tokens(col(textCol))).as("simhash"))
  }
}
