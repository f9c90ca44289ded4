package graft.operators

import org.apache.spark.sql.DataFrame
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
  * hash-match. Candidates are then verified by the exact codegen'd
  * `levenshtein` — cost is O(candidates · L²), never O(n²) when the
  * length distribution spreads over bands.
  *
  * Skew honesty: a corpus whose strings all share one length band
  * degenerates to the cross join within that band — the same hot-bucket
  * caveat as every blocked join here; pick `bandWidth` (or compose an
  * additional blocking key: first-token, soundex, length+prefix) to
  * match the key distribution. */
object FuzzyJoin {

  /** Distinct `(leftId, rightId, dist)` pairs with
    * levenshtein(leftCol, rightCol) <= maxDist. */
  def byEditDistance(left: DataFrame, right: DataFrame,
                     leftIdCol: String, leftCol: String,
                     rightIdCol: String, rightCol: String,
                     maxDist: Int = 2, bandWidth: Int = 4): DataFrame = {
    require(maxDist >= 0 && bandWidth >= 1,
      s"need maxDist >= 0, bandWidth >= 1: $maxDist/$bandWidth")
    val l = left.select(col(leftIdCol).as("__lid"), col(leftCol).as("__ltxt"))
      .withColumn("__band", (length(col("__ltxt")) / bandWidth).cast("int"))
    val r = right.select(col(rightIdCol).as("__rid"), col(rightCol).as("__rtxt"))
      .select(col("__rid"), col("__rtxt"),
        explode(array_distinct(transform(
          sequence(lit(-maxDist), lit(maxDist)),
          k => ((length(col("__rtxt")) + k) / bandWidth).cast("int"))))
          .as("__band"))
    l.join(r, Seq("__band"))
      .select(col("__lid"), col("__rid"),
        levenshtein(col("__ltxt"), col("__rtxt")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
      .select(col("__lid").as(leftIdCol), col("__rid").as(rightIdCol),
        col("dist"))
  }
}
