package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Differential spec: the sort-based exact percentile must agree with
  * Spark's buffering built-in (same quantile_cont interpolation) on real
  * fixture data, across interior and boundary percentiles, including
  * null values and a single-row group. */
class PercentilesSpec extends SparkSpec {

  import spark.implicits._

  private val ps = Seq("p0" -> 0.0, "p25" -> 0.25, "p50" -> 0.5,
    "p90" -> 0.9, "p100" -> 1.0)

  test("winsorize clips exactly at the interpolated thresholds, keeps rows") {
    // 1..10: p25 = 3.25, p75 = 7.75 (linear interpolation)
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val w = Percentiles.winsorize(df, "v", lo = 0.25, hi = 0.75)
      .select($"v", $"v_w").as[(Double, Double)].collect().toMap
    assert(w.size == 10, "no rows dropped")
    assert(w(1.0) == 3.25 && w(3.0) == 3.25)
    assert(w(5.0) == 5.0 && w(7.0) == 7.0)
    assert(w(8.0) == 7.75 && w(10.0) == 7.75)
  }

  test("madOutliers: hand-computed robust z; zero MAD fails fast") {
    // values 0,10,20,30,1000: median 20, deviations 20,10,0,10,980 ->
    // MAD 10; z(1000) = 0.6745*980/10 = 66.101 (outlier), z(0) = -1.349
    val df = Seq(0.0, 10.0, 20.0, 30.0, 1000.0).toDF("v")
    val out = Percentiles.madOutliers(df, "v", cut = 3.5)
      .select($"v", $"robust_z", $"is_outlier")
      .as[(Double, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1000.0)._2 == 0.6745 * 980 / 10 && out(1000.0)._3)
    assert(out(0.0)._2 == 0.6745 * -20 / 10 && !out(0.0)._3)
    assert(out(20.0)._2 == 0.0 && !out(20.0)._3)
    val flat = Seq(5.0, 5.0, 5.0, 9.0).toDF("v")
    intercept[IllegalArgumentException] {
      Percentiles.madOutliers(flat, "v")
    }
  }

  test("matches the built-in percentile on lineitem per returnflag") {
    val li = Tables.load(spark, sf(), "lineitem")
    val ours = Percentiles.quantileCont(li, Seq("l_returnflag"), "l_extendedprice", ps)
      .collect().map(r => r.getString(0) -> (1 to 5).map(r.getDouble)).toMap
    val builtin = li.groupBy($"l_returnflag")
      .agg(percentile($"l_extendedprice", array(ps.map(p => lit(p._2)): _*)))
      .as[(String, Seq[Double])].collect().toMap
    assert(ours.keySet == builtin.keySet)
    ours.foreach { case (k, vs) =>
      vs.zip(builtin(k)).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b)),
          s"group $k ${ps(i)._1}: sort-based $a vs builtin $b")
      }
    }
  }

  test("ignores nulls and handles single-row groups") {
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(42.0))).toDF("k", "v")
    val out = Percentiles.quantileCont(df, Seq("k"), "v",
      Seq("p50" -> 0.5, "p100" -> 1.0))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // nulls ignored: a has values (1,3) -> p50 = 2.0 interpolated
    assert(out("a") == ((2.0, 3.0)))
    assert(out("b") == ((42.0, 42.0)))
  }

  test("NULL group keys stay one group; all-null-value groups keep a null row") {
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(3.0)),
      (None, Some(10.0)), (None, Some(20.0)),      // NULL group with values
      (Some("b"), None), (Some("b"), None))        // group with only nulls
      .toDF("k", "v")
    val out = Percentiles.quantileCont(df, Seq("k"), "v", Seq("p50" -> 0.5))
    val builtin = df.groupBy($"k").agg(percentile($"v", lit(0.5)).as("p50"))
    assert(out.count() == 3, "one row per distinct group incl. NULL key")
    assert(out.exceptAll(builtin).isEmpty && builtin.exceptAll(out).isEmpty)
    // multi-column form: same group handling across both value columns
    val df2 = df.withColumn("w", $"v" * 2)
    val multi = Percentiles.quantileContMulti(df2, Seq("k"),
      Seq("v" -> Seq("vp" -> 0.5), "w" -> Seq("wp" -> 0.5)))
    val builtin2 = df2.groupBy($"k")
      .agg(percentile($"v", lit(0.5)).as("vp"), percentile($"w", lit(0.5)).as("wp"))
    assert(multi.exceptAll(builtin2).isEmpty && builtin2.exceptAll(multi).isEmpty)
  }

  test("value column named like an internal scratch column is not clobbered") {
    // regression: a value column literally named "__n" used to be replaced
    // by the group-count window (quantiles came back as the group size)
    val df = Seq(("a", 0), ("a", 1), ("a", 2), ("a", 3), ("a", 3))
      .toDF("k", "__n")
    val out = Percentiles.quantileCont(df, Seq("k"), "__n",
      Seq("p50" -> 0.5, "p90" -> 0.9)).head()
    assert(out.getDouble(1) == 2.0) // p50 of (0,1,2,3,3), not the count 5
    assert(out.getDouble(2) == 3.0)
  }

  test("quantileContHist == sort-based path == built-in on discrete data") {
    val li = Tables.load(spark, sf(), "lineitem")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0)
    val hist = Percentiles.quantileContHist(li, "l_quantity", ps).head()
    val sorted = Percentiles.quantileCont(
      li.withColumn("__g", lit(1)), Seq("__g"), "l_quantity", ps).head()
    val bAggs = ps.map { case (n, p) => percentile($"l_quantity", lit(p)).as(n) }
    val builtin = li.agg(bAggs.head, bAggs.tail: _*).head()
    ps.indices.foreach { i =>
      assert(hist.getDouble(i) == sorted.getDouble(i + 1),
        s"${ps(i)._1}: hist vs sort")
      assert(hist.getDouble(i) == builtin.getDouble(i),
        s"${ps(i)._1}: hist vs builtin")
    }
  }

  test("quantileContScan == sort path == built-in on continuous data") {
    val li = Tables.load(spark, sf(), "lineitem").repartition(8)
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0)
    val scan = Percentiles.quantileContScan(li, "l_extendedprice", ps).head()
    // witness = the library's own sort path: the same lo + frac·(hi−lo)
    // DuckDB-parity formula, so equality must be BIT-exact (the built-in
    // interpolates as (1−frac)·lo + frac·hi — a ulp apart on continuous
    // data, which is exactly why the oracle-parity form exists)
    val sorted = Percentiles.quantileCont(
      li.withColumn("__g", lit(1)), Seq("__g"), "l_extendedprice", ps).head()
    ps.indices.foreach { i =>
      assert(scan.getDouble(i) == sorted.getDouble(i + 1),
        s"${ps(i)._1}: scan vs sort path")
    }
    // and on exact-arithmetic data all three agree, built-in included
    val bAggs = ps.map { case (n, p) => percentile($"l_quantity", lit(p)).as(n) }
    val builtin = li.agg(bAggs.head, bAggs.tail: _*).head()
    val scanQ = Percentiles.quantileContScan(li, "l_quantity", ps).head()
    ps.indices.foreach { i =>
      assert(scanQ.getDouble(i) == builtin.getDouble(i),
        s"${ps(i)._1}: scan vs builtin on exact data")
    }
    // duplicate values across partitions: rank ties pick the same value
    val dup = Seq(1.0, 2.0, 2.0, 2.0, 9.0).toDF("v").repartition(4)
    val d = Percentiles.quantileContScan(dup, "v", Seq("p50" -> 0.5)).head()
    assert(d.getDouble(0) == 2.0)
    val allNull = Seq[Option[Double]](None).toDF("v")
    assert(Percentiles.quantileContScan(allNull, "v", Seq("p50" -> 0.5))
      .head().isNullAt(0))
  }

  test("quantileContScanGrouped == quantileCont BIT-exact per group; " +
    "NULL keys and all-null groups keep the contract") {
    val li = Tables.load(spark, sf(), "lineitem").repartition(8)
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0)
    val scan = Percentiles.quantileContScanGrouped(
      li, Seq("l_returnflag"), "l_extendedprice", ps)
    val sorted = Percentiles.quantileCont(
      li, Seq("l_returnflag"), "l_extendedprice", ps)
    assert(scan.exceptAll(sorted).isEmpty && sorted.exceptAll(scan).isEmpty)
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(3.0)),
      (None, Some(10.0)), (None, Some(20.0)),  // NULL group WITH values
      (Some("b"), None), (Some("b"), None))    // group with only nulls
      .toDF("k", "v")
    val g = Percentiles.quantileContScanGrouped(df, Seq("k"), "v",
      Seq("p50" -> 0.5))
    val w = Percentiles.quantileCont(df, Seq("k"), "v", Seq("p50" -> 0.5))
    assert(g.count() == 3)
    assert(g.exceptAll(w).isEmpty && w.exceptAll(g).isEmpty)
  }

  test("quantileContHist: interpolation between distinct values, nulls, all-null") {
    val df = Seq(Some(1), Some(2), Some(4), None).toDF("v")
    val out = Percentiles.quantileContHist(df, "v", Seq("p50" -> 0.5)).head()
    assert(out.getDouble(0) == 2.0) // 3 non-null values, middle one
    val even = Seq(1, 3).toDF("v")
    assert(Percentiles.quantileContHist(even, "v", Seq("p50" -> 0.5))
      .head().getDouble(0) == 2.0) // frac interpolation across the gap
    val allNull = Seq[Option[Int]](None, None).toDF("v")
    val nr = Percentiles.quantileContHist(allNull, "v", Seq("p50" -> 0.5))
    assert(nr.count() == 1 && nr.head().isNullAt(0))
  }

  test("multi-column form joins one row per group per value column") {
    val li = Tables.load(spark, sf(), "lineitem")
    val out = Percentiles.quantileContMulti(li, Seq("l_returnflag"),
      Seq("l_quantity" -> Seq("q50" -> 0.5), "l_discount" -> Seq("d90" -> 0.9)))
    assert(out.columns.toSeq == Seq("l_returnflag", "q50", "d90"))
    val builtin = li.groupBy($"l_returnflag")
      .agg(percentile($"l_quantity", lit(0.5)).as("q50"),
        percentile($"l_discount", lit(0.9)).as("d90"))
    assert(out.exceptAll(builtin).isEmpty && builtin.exceptAll(out).isEmpty)
  }
}
