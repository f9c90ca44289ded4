package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over ArrayType columns — no UDFs; the dot product is
  * a native Catalyst expression with codegen (graft.functions.VecDot), so
  * the similarity operators run as a tight primitive loop inside
  * whole-stage codegen and scale linearly with partition count.
  *
  * Precision contract: elements are widened to double and the fold is a
  * strict left-to-right double sum, so results are bit-reproducible for a
  * given element order (required for DuckDB-oracle hash parity).
  */
object Vectors {

  /** Sequential left-fold dot product of two equal-length numeric arrays
    * (codegen'd VecDot; `dotComposable` is the built-ins-only fallback).
    * Resolves through the function registry — sessions built via
    * GraftSession have it injected; others call VecDot.ensureRegistered. */
  def dot(a: Column, b: Column): Column =
    call_function(VecDot.name, a, b)

  /** Same semantics from composable built-ins (interpreted HOFs) — kept as
    * the portability fallback and as the differential-test witness. Both
    * arrays are sliced to the shorter length first: zip_with pads the
    * shorter side with nulls (which would null the whole fold), whereas
    * VecDot sums over min length — slicing pins the two to each other. */
  def dotComposable(a: Column, b: Column): Column = {
    val n = least(size(a), size(b))
    aggregate(
      zip_with(slice(a, lit(1), n), slice(b, lit(1), n),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)
  }

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

  /** [[signBucket]] over dimensions `offset+1 .. offset+bits` — the t-th
    * hash table of a multi-probe LSH index uses `offset = t * bits`, so
    * the tables read disjoint coordinate slices and their bucket
    * collisions are independent events (the recall-boosting construction
    * behind [[graft.operators.Similarity.knnGraph]]). */
  def signBucketAt(a: Column, bits: Int, offset: Int): Column =
    concat((1 to bits).map(i =>
      when(element_at(a, offset + i) >= 0f, lit("1")).otherwise(lit("0"))): _*)

  /** `a − center`, element-wise, as `array<double>` — the embedding
    * half of the centering pair (the "all-but-the-top" recipe, Mu &
    * Viswanath 2018: subtract the corpus mean so the shared component
    * every skewed-family vector carries stops dominating both the
    * buckets and the scores). Bucketing the RESULT with the plain
    * origin-hyperplane [[signBucketAt]] equals bucketing the input with
    * [[signBucketCenteredAt]] — but cosine over centered vectors is a
    * DIFFERENT (usually better-contrasted) similarity than raw cosine,
    * and sign-LSH through the origin is the locality family of the
    * similarity actually scored, so the metric-consistent construction
    * is: center once (this — one narrow zero-shuffle projection), then
    * run the standard machinery. Per-element subtraction is a single
    * IEEE op on exactly-widened floats — bit-reproducible across
    * engines. */
  def centered(a: Column, center: Seq[Double]): Column =
    zip_with(a, typedlit(center), (x, m) => x.cast("double") - m)

  /** [[signBucketAt]] with the bucketing hyperplanes CENTERED at
    * `center` (one threshold per coordinate, a plan literal — zero extra
    * cost): bit i is `x[offset+i] >= center(offset+i)` instead of
    * `>= 0`. Sign buckets assume each coordinate straddles zero; skewed
    * embedding families (hashed-BoW projections, where common-token mass
    * pushes every document the same way) concentrate on few sign
    * patterns, and centering the comparison at the corpus's own
    * per-coordinate mean ([[graft.operators.Similarity.corpusCenter]])
    * re-balances the buckets — the recall/cost alternative to paying for
    * more bits ([[graft.operators.Similarity.autoBitsSkewAware]]).
    * A zero center vector reproduces [[signBucketAt]] exactly (floats
    * widen to double losslessly, so `x.cast(double) >= 0.0` ≡
    * `x >= 0f`). */
  def signBucketCenteredAt(a: Column, bits: Int, offset: Int,
                           center: Seq[Double]): Column = {
    require(center.length >= offset + bits,
      s"signBucketCenteredAt: center has ${center.length} coordinates, " +
        s"bucketing reads ${offset + bits}")
    concat((1 to bits).map(i =>
      when(element_at(a, offset + i).cast("double") >= lit(center(offset + i - 1)),
        lit("1")).otherwise(lit("0"))): _*)
  }
}
