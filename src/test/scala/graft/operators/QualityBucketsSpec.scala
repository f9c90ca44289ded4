package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityBucketsSpec extends SparkSpec {
  import spark.implicits._

  test("scoreBuckets assigns threshold buckets, lowest scores to bucket 1") {
    // scores 1..10 into 5 buckets: thresholds at p=.2,.4,.6,.8 of (n-1)
    // interpolation over 1..10 are 2.8, 4.6, 6.4, 8.2 -> buckets of 2
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val out = Quality.scoreBuckets(df, "score", nBuckets = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L,
      6L -> 3L, 7L -> 4L, 8L -> 4L, 9L -> 5L, 10L -> 5L))
  }

  test("ties land in one bucket (threshold contract, not ntile's)") {
    // nine equal scores + one higher: every tie compares equal to every
    // interior threshold it doesn't exceed, so all nine share bucket 1
    val df = (1 to 10).map(i => (i.toLong, if (i == 10) 2.0 else 1.0))
      .toDF("id", "score")
    val out = Quality.scoreBuckets(df, "score", nBuckets = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1 to 9).forall(i => out(i.toLong) == 1L))
    assert(out(10L) == 2L)
  }

  test("null scores keep a null bucket; all-null input fails fast") {
    val df = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "score")
    val out = Quality.scoreBuckets(df, "score", nBuckets = 2)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out(2L).isEmpty)
    assert(out(1L).contains(1L) && out(3L).contains(2L))

    val allNull = Seq((1L, Option.empty[Double])).toDF("id", "score")
    val e = intercept[IllegalArgumentException](
      Quality.scoreBuckets(allNull, "score"))
    assert(e.getMessage.contains("no non-null"))
  }

  test("scoreBucketsApprox tracks the exact form; high accuracy converges") {
    val df = (1 to 5000).map(i => (i.toLong, i * 0.25)).toDF("id", "score")
    // at accuracy >= n the sketch is exact rank-wise: identical buckets
    val exact = Quality.scoreBuckets(df, "score", nBuckets = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val approx = Quality.scoreBucketsApprox(df, "score", nBuckets = 10,
        accuracy = 100000)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // thresholds differ by at most interpolation (exact interpolates,
    // the sketch picks a sample member), so disagreement is confined to
    // rows hugging a boundary — bound it tightly instead of pinning
    val diff = exact.count { case (id, b) => approx(id) != b }
    assert(diff <= 10, s"$diff rows moved buckets at near-exact accuracy")
    // masses stay near-equal under the sketch
    val masses = approx.values.groupBy(identity).view.mapValues(_.size)
    assert(masses.values.forall(m => m >= 450 && m <= 550), masses.toMap.toString)
    // assignment is monotone in score (shared fold): spot-check extremes
    assert(approx(1L) == 1L && approx(5000L) == 10L)
  }

  test("bucket masses are equal on distinct uniform scores (10 buckets)") {
    val df = (1 to 200).map(i => (i.toLong, i * 0.5)).toDF("id", "score")
    val sizes = Quality.scoreBuckets(df, "score", nBuckets = 10)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == (1 to 10).map(b => b.toLong -> 20L).toMap)
  }

  test("scoreBucketsBy == scoreBuckets applied to each group alone") {
    // two languages on WILDLY different score scales — the CCNet
    // motivation: a global cut would put all of 'b' in the top bucket
    val rows = (1 to 30).map(i => (i.toLong, "a", i.toDouble)) ++
      (31 to 60).map(i => (i.toLong, "b", 1000.0 + i))
    val df = rows.toDF("id", "lang", "score")
    val grouped = Quality.scoreBucketsBy(df, "score", Seq("lang"), nBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    Seq("a", "b").foreach { l =>
      val alone = Quality.scoreBuckets(df.where($"lang" === l), "score", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      alone.foreach { case (id, b) =>
        assert(grouped(id) == b, s"id=$id lang=$l") }
    }
    // each language fills every bucket (the global cut would not)
    val globalB = Quality.scoreBuckets(df, "score", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert((31 to 60).forall(i => globalB(i.toLong) >= 2L) &&
      (1 to 30).forall(i => globalB(i.toLong) <= 2L),
      "global cut segregates languages by scale instead of by quality")
    assert((31 to 60).map(i => grouped(i.toLong)).toSet == Set(1L, 2L, 3L))
  }

  test("scoreBucketsBy: null score -> null bucket; an all-null group nulls only itself") {
    val df = Seq((1L, "a", Some(1.0)), (2L, "a", Some(2.0)),
      (3L, "a", Option.empty[Double]), (4L, "z", Option.empty[Double]))
      .toDF("id", "lang", "score")
    val out = Quality.scoreBucketsBy(df, "score", Seq("lang"), nBuckets = 2)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out.size == 4, "every row survives, including the all-null group")
    assert(out(1L).contains(1L) && out(2L).contains(2L))
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }
}
