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

  /** WEIGHTED sampling without replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): each row draws the
    * exponential key `-ln(u) / w` from its deterministic uniform
    * `u = (h + 1) / 2^32` (the md5(id:salt) draw, +1 keeps u in (0, 1]
    * so the log is finite) and the n SMALLEST keys win — exactly the
    * distribution of sequential weighted draws without replacement, so
    * a quality-weighted corpus subsample ("keep 1M documents, prefer
    * high-scoring ones, but keep diversity") falls out of one
    * expression plus a top-n. Deterministic across engines (the md5
    * arithmetic is the [[Splits]] construction; IEEE log/divide
    * reproduce bit-for-bit), rerun- and layout-stable, and `salt`
    * redraws independently.
    *
    * Scale shape: the key is a narrow codegen'd column; the n smallest
    * rows come from the heap-aggregate top-k ([[bottomK]]'s machinery,
    * one global group) — each partition keeps its own n candidates
    * map-side, ONE reduce task merges heaps of size n, the corpus never
    * sorts globally and never moves. Rows with NULL, zero, or negative
    * weight are excluded up front (a weightless row must not win by
    * numeric accident — the [[graft.operators.Mix]] null contract).
    * Output: (`idCol`, sample_key), n rows (fewer when the corpus is
    * smaller); winners re-join the source for their payload. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, n: Int,
                     salt: String = ""): DataFrame = {
    require(n >= 1, s"sample size must be positive: $n")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val h = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long").cast("double")
    val u = (h + 1.0) / 4294967296.0 // (h + 1) / 2^32 ∈ (0, 1]
    val key = -log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), col(weightCol), key.as("sample_key"))
      .groupBy()
      // negated: the max-heap keeps the smallest exponential keys; ties
      // are impossible short of a digest collision, so selection is total
      .agg(graft.functions.TopKByScore.topk(
        -col("sample_key"), col(idCol), n).as("__s"))
      .select(explode(col("__s")).as("__e"))
      .select(col("__e.id").as(idCol), (-col("__e.score")).as("sample_key"))
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
