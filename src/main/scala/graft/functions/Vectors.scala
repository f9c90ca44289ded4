package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over ArrayType columns, built from codegen'd built-ins
  * (zip_with/aggregate) — no UDFs, so the similarity operators stay inside
  * whole-stage codegen and scale linearly with partition count.
  *
  * Precision contract: elements are cast to double up front and the fold is
  * a strict left-to-right double sum, so results are bit-reproducible for a
  * given element order (required for DuckDB-oracle hash parity).
  */
object Vectors {

  /** Sequential left-fold dot product of two equal-length numeric arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-pattern LSH bucket over the first `bits` dimensions: a coarse,
    * deterministic partitioner for ANN / near-dup. At scale this turns the
    * O(n^2) all-pairs cosine into per-bucket joins (expected n^2 / 2^bits
    * comparisons) at the cost of recall across bucket boundaries.
    */
  def signBucket(a: Column, bits: Int): Column =
    concat((1 to bits).map(i =>
      when(element_at(a, i) >= 0f, lit("1")).otherwise(lit("0"))): _*)
}
