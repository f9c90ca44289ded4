package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic uniform sampling — the inspection/eval primitive a
  * curation pipeline needs ("show me k random documents per domain /
  * per split / per cluster") in a form that is stable across reruns,
  * engines, and cluster sizes.
  *
  * Rank rows by `md5(id:salt)` — a uniform draw on [0, 2^32) that any
  * engine reproduces bit-for-bit (the [[Splits]] construction) — and
  * keep each group's k SMALLEST via the k-bounded heap aggregate
  * ([[graft.functions.TopKByScore]]). The shuffle therefore carries
  * groups × k rows, never the population: the `ORDER BY rand() LIMIT k`
  * anti-pattern this replaces shuffles and sorts every candidate row
  * per group onto one task, and `rand()` changes under reruns, retries,
  * and repartitioning. Changing `salt` redraws an independent sample.
  */
object Sample {

  /** Deterministic global corpus permutation — the "shuffle the corpus
    * before sharding" step of a training-data pipeline, reproducible
    * across reruns, engines, and cluster sizes (unlike
    * `orderBy(rand())`): every row gets `pos` = its 1-based rank in
    * md5(id:salt) order. At scale this is a range-partitioned sort plus
    * the [[Prefix.cumsum]] two-pass position assignment — no global
    * window, no single-task sort; the only unpartitioned state is one
    * row per partition. `salt` redraws the permutation; md5 keys are
    * unique per id short of a digest collision, so the order is total.
    * Output: (`idCol`, pos). */
  def permute(df: DataFrame, idCol: String, salt: String = ""): DataFrame = {
    val key = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    Prefix.cumsum(
      df.select(col(idCol), key.as("__key"), lit(1L).as("__one")),
      "__key", "__one", "pos")
      .select(col(idCol), col("pos"))
  }

  /** k-row uniform sample per group (fewer when the group is smaller):
    * (groupCols..., `idCol`). Ties (equal 32-bit hash prefixes) break
    * toward the smaller id — fully deterministic. */
  def bottomK(df: DataFrame, groupCols: Seq[String], idCol: String, k: Int,
              salt: String = ""): DataFrame = {
    require(k >= 1, s"sample size must be positive: $k")
    require(groupCols.nonEmpty, "bottomK needs at least one group column")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val h = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long").cast("double")
    df.select(groupCols.map(col) :+ col(idCol) :+ h.as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      // negated score: the max-heap keeps the smallest hashes
      .agg(graft.functions.TopKByScore.topk(-col("__h"), col(idCol), k).as("__s"))
      .select(groupCols.map(col) :+ explode(col("__s")).as("__e"): _*)
      .select(groupCols.map(col) :+ col("__e.id").as(idCol): _*)
  }
}
