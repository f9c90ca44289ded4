package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy join by edit distance — the entity-resolution
  * primitive (near-key matching: typo'd titles, re-crawled URLs, OCR'd
  * names): pairs within Levenshtein distance `maxDist`, found WITHOUT
  * the all-pairs cross join.
  *
  * Blocking is by length band (width `bandWidth`): two strings within
  * edit distance d differ in length by at most d, so the right side
  * emits every band its length ±d can fall in (≤ 2d/width + 1 bands —
  * 2 extra rows at the defaults) and the join on the band key is
  * COMPLETE: no true pair is missed, which is what lets q171's oracle
  * use the independent |len difference| ≤ d formulation and still
  * hash-match. Candidates are then verified by the codegen'd BOUNDED
  * `levenshtein(l, r, maxDist)` — the banded form: O(d·L) per pair with
  * early exit once the distance provably exceeds the threshold, instead
  * of the full O(L²) table the 2-arg form fills for every candidate
  * including the overwhelming majority that fail the filter.
  *
  * Skew honesty: a corpus whose strings all share one length band
  * degenerates to the cross join within that band. For such
  * length-concentrated corpora pass `blockOn` — an additional
  * EXACT-match blocking key derived from the text (first character,
  * soundex, first token): candidates must then agree on BOTH keys, which
  * divides the hot band by the key's cardinality. Unlike the length
  * band, a composite key is a RECALL trade — a true pair whose key
  * differs (a typo in the first character, say) is lost — which is why
  * it is opt-in and the default stays complete. */
object FuzzyJoin {

  /** Distinct `(leftId, rightId, dist)` pairs with
    * levenshtein(leftCol, rightCol) <= maxDist.
    *
    * `blockOn`: optional additional blocking key (applied to both text
    * columns; candidates must match exactly on it). See the recall note
    * above — e.g. `Some(t => soundex(t))` or `Some(t => substring(t, 1, 1))`. */
  def byEditDistance(left: DataFrame, right: DataFrame,
                     leftIdCol: String, leftCol: String,
                     rightIdCol: String, rightCol: String,
                     maxDist: Int = 2, bandWidth: Int = 4,
                     blockOn: Option[Column => Column] = None): DataFrame =
    candidates(left, right, leftIdCol, leftCol, rightIdCol, rightCol,
      maxDist, bandWidth, blockOn)
      .select(col("__lid"), col("__rid"),
        // bounded: -1 when the distance exceeds maxDist (early exit);
        // exact distance (== the 2-arg form) for every kept pair
        levenshtein(col("__ltxt"), col("__rtxt"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
      .distinct()
      .select(col("__lid").as(leftIdCol), col("__rid").as(rightIdCol),
        col("dist"))

  /** The banded candidate frame before verification — exposed for the
    * blocking-selectivity audit (how many exact-distance computations a
    * given bandWidth/blockOn buys off). */
  private[graft] def candidates(left: DataFrame, right: DataFrame,
                                leftIdCol: String, leftCol: String,
                                rightIdCol: String, rightCol: String,
                                maxDist: Int, bandWidth: Int,
                                blockOn: Option[Column => Column]): DataFrame = {
    require(maxDist >= 0 && bandWidth >= 1,
      s"need maxDist >= 0, bandWidth >= 1: $maxDist/$bandWidth")
    val joinKeys = if (blockOn.isDefined) Seq("__band", "__bkey") else Seq("__band")
    val l0 = left.select(col(leftIdCol).as("__lid"), col(leftCol).as("__ltxt"))
      .withColumn("__band", (length(col("__ltxt")) / bandWidth).cast("int"))
    val l = blockOn.fold(l0)(k => l0.withColumn("__bkey", k(col("__ltxt"))))
    val r0 = right.select(col(rightIdCol).as("__rid"), col(rightCol).as("__rtxt"))
      .select(col("__rid"), col("__rtxt"),
        explode(array_distinct(transform(
          sequence(lit(-maxDist), lit(maxDist)),
          k => ((length(col("__rtxt")) + k) / bandWidth).cast("int"))))
          .as("__band"))
    val r = blockOn.fold(r0)(k => r0.withColumn("__bkey", k(col("__rtxt"))))
    l.join(r, joinKeys)
  }
}
