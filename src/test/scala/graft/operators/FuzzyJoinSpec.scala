package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FuzzyJoin: blocked fuzzy join vs brute-force oracle; composite
  * blocking selectivity on a length-concentrated corpus. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "anthracite"), (2L, "graphite"), (3L, "marble"),
    (4L, "basalt"), (5L, "obsidian")).toDF("lid", "lname")
  private val right = Seq(
    (10L, "anthracit"),   // dist 1 to anthracite
    (11L, "grphite"),     // dist 1 to graphite
    (12L, "marbles"),     // dist 1 to marble
    (13L, "bassalt"),     // dist 1 to basalt
    (14L, "granite"),     // dist > 2 to everything here
    (15L, "obsidian")     // dist 0
  ).toDF("rid", "rname")

  private def brute(maxDist: Int) =
    left.crossJoin(right)
      .select($"lid", $"rid", levenshtein($"lname", $"rname").as("dist"))
      .filter($"dist" <= maxDist)
      .select("lid", "rid", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("blocked join equals brute force (bounded levenshtein verifier)") {
    for (d <- Seq(0, 1, 2); bw <- Seq(1, 3, 4)) {
      val got = FuzzyJoin.byEditDistance(left, right, "lid", "lname",
          "rid", "rname", maxDist = d, bandWidth = bw)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute(d), s"maxDist=$d bandWidth=$bw")
    }
  }

  test("composite blocking key cuts candidates on a length-concentrated corpus") {
    // every string is 6 chars -> one length band: the band join alone is
    // the in-band cross join (n*m candidates, modulo the ±d band copies)
    val l6 = (0 until 40).map(i => (i.toLong, f"w${i % 8}%s${i}%03d"))
      .toDF("lid", "lname")
    val r6 = (0 until 40).map(i => (1000L + i, f"w${i % 8}%s${i}%03dx".take(6)))
      .toDF("rid", "rname")
    val firstTwo: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => substring(t, 1, 2)
    val nPlain = FuzzyJoin.candidates(l6, r6, "lid", "lname", "rid", "rname",
      maxDist = 2, bandWidth = 4, blockOn = None).count()
    val nBlocked = FuzzyJoin.candidates(l6, r6, "lid", "lname", "rid", "rname",
      maxDist = 2, bandWidth = 4, blockOn = Some(firstTwo)).count()
    assert(nBlocked < nPlain / 4,
      s"composite key should divide the hot band: $nBlocked vs $nPlain")
    // and when the key agrees on every true pair, the RESULT is unchanged
    val plain = FuzzyJoin.byEditDistance(l6, r6, "lid", "lname", "rid", "rname",
        maxDist = 2, bandWidth = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blocked = FuzzyJoin.byEditDistance(l6, r6, "lid", "lname", "rid", "rname",
        maxDist = 2, bandWidth = 4, blockOn = Some(firstTwo))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // matches here share their first two chars by construction (same w<k> prefix)
    assert(blocked.subsetOf(plain))
    assert(blocked == plain.filter { case (lid, rid, _) =>
      (lid % 8) == ((rid - 1000) % 8) })
  }

  test("recall trade of blockOn is real and documented: divergent key loses the pair") {
    val l = Seq((1L, "zebra")).toDF("lid", "lname")
    val r = Seq((2L, "xebra")).toDF("rid", "rname")  // first char differs
    val firstChar: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => substring(t, 1, 1)
    assert(FuzzyJoin.byEditDistance(l, r, "lid", "lname", "rid", "rname",
      maxDist = 1).count() == 1L)
    assert(FuzzyJoin.byEditDistance(l, r, "lid", "lname", "rid", "rname",
      maxDist = 1, blockOn = Some(firstChar)).count() == 0L)
  }
}
