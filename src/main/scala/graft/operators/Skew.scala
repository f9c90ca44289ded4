package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for low-cardinality / hot-key aggregations.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles skewed
  * JOINS at runtime, but a `groupBy` over a handful of hot keys still
  * funnels every row of a hot key through one reducer. The classic fix is
  * two-phase salted aggregation: phase 1 groups by (key, salt) so each hot
  * key spreads over `salts` reducers and the combine happens in parallel;
  * phase 2 re-aggregates the `n_keys × salts` partials — a trivially small
  * shuffle. Only valid for re-aggregable functions (sum/count/min/max).
  *
  * The salt is derived deterministically from a high-cardinality column
  * (hash % salts) rather than rand(): results are identical either way —
  * re-aggregation is exact for these functions — but deterministic salting
  * keeps task retries idempotent and plans reproducible.
  */
object Skew {

  /** Two-phase salted sum+count per key.
    *
    * @param saltBy high-cardinality column to derive the salt from
    * @param salts  fan-out per key; size to the executor count at scale
    */
  def saltedSumCount(df: DataFrame, keys: Seq[Column], saltBy: Column, salts: Int,
                     value: Column, sumAlias: String, cntAlias: String): DataFrame = {
    require(salts >= 1)
    val salt = pmod(xxhash64(saltBy), lit(salts)).as("__salt")
    df.groupBy((keys :+ salt): _*)
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys: _*)
      .agg(sum(col("__psum")).as(sumAlias), sum(col("__pcnt")).as(cntAlias))
  }
}
