package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch (graft_quantile_sketch): exactness below
  * the collapse threshold, the rigorous rank-error guarantee under
  * partition merges, the deterministic error cap, bounded state, and
  * the quantile/estRank helpers. */
class QuantileSketchSpec extends SparkSpec {

  import spark.implicits._

  private def sketchOf(vals: Seq[Double], k: Int, parts: Int) =
    vals.toDF("v").repartition(parts)
      .agg(QuantileSketch.sketch($"v", k).as("sk"))
      .select($"sk.items", $"sk.err", $"sk.n").head()

  test("exact when nothing collapses: err 0, every rank exact") {
    val vals = Seq(5.0, 1.0, 3.0, 2.0, 4.0)
    val r = sketchOf(vals, k = 8, parts = 3)
    assert(r.getLong(1) == 0L && r.getLong(2) == 5L)
    val items = r.getSeq[Row](0).map(x => (x.getDouble(0), x.getLong(1)))
    assert(items == vals.sorted.map(v => (v, 1L)),
      "below 2k items the sketch IS the sorted input at weight 1")
  }

  test("nulls and NaN are ignored") {
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(2.0))
      .toDF("v")
    val r = df.agg(QuantileSketch.sketch($"v", 4).as("sk"))
      .select($"sk.n", size($"sk.items")).head()
    assert(r.getLong(0) == 2L && r.getInt(1) == 2)
  }

  test("rank guarantee and deterministic cap hold across layouts and seeds") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 3000 + trial * 500
      val vals = Seq.fill(n)(rnd.nextDouble() * 100.0)
      Seq(1, 7).foreach { parts =>
        val k = 16
        val r = sketchOf(vals, k, parts)
        val items = r.getSeq[Row](0).map(x => (x.getDouble(0), x.getLong(1)))
        val err = r.getLong(1)
        assert(r.getLong(2) == n.toLong)
        assert(items.map(_._2).sum == n.toLong,
          "total sketch weight must equal n (mass conservation)")
        val nk = n.toDouble / k
        val cap = nk * (math.ceil(math.log(math.max(2.0, nk)) /
          math.log(2.0)) + 2.0)
        assert(err.toDouble <= cap,
          s"err $err over deterministic cap $cap (n=$n parts=$parts)")
        val sorted = vals.sorted
        Seq(0.05, 0.25, 0.5, 0.75, 0.95).foreach { q =>
          val x = sorted((q * (n - 1)).toInt)
          val exact = vals.count(_ <= x).toLong
          val est = items.collect { case (v, w) if v <= x => w }.sum
          assert(math.abs(est - exact) <= err,
            s"rank guarantee broken at q=$q: |$est - $exact| > $err")
        }
      }
    }
  }

  test("state stays bounded: items <= 2k per level") {
    val vals = (1 to 20000).map(_.toDouble)
    val r = sketchOf(vals, k = 8, parts = 4)
    val items = r.getSeq[Row](0)
    // levels <= log2(n/k)+2; each holds < 2k items
    val maxItems = (2 * 8) * (math.ceil(math.log(20000.0 / 8) /
      math.log(2.0)).toInt + 2)
    assert(items.length <= maxItems,
      s"sketch kept ${items.length} items, bound $maxItems")
  }

  test("estRank and quantile helpers: hand-computed, no collapse") {
    val df = Seq(10.0, 20.0, 30.0, 40.0).toDF("v")
      .agg(QuantileSketch.sketch($"v", 8).as("sk"))
    val got = df.select(
      QuantileSketch.estRank($"sk", lit(25.0)).as("r25"),
      QuantileSketch.quantile($"sk", 0.5).as("med"),
      QuantileSketch.quantile($"sk", 1.0).as("mx"),
      QuantileSketch.quantile($"sk", 0.01).as("lo")).head()
    assert(got.getLong(0) == 2L)
    assert(got.getDouble(1) == 20.0) // ceil(0.5*4)=2nd value
    assert(got.getDouble(2) == 40.0)
    assert(got.getDouble(3) == 10.0)
  }

  test("quantile helper stays within the guarantee after collapses") {
    val vals = (1 to 4096).map(_.toDouble)
    val one = vals.toDF("v").repartition(5)
      .agg(QuantileSketch.sketch($"v", 32).as("sk"))
    val r = one.select($"sk.err",
      QuantileSketch.quantile($"sk", 0.5).as("med")).head()
    val err = r.getLong(0)
    val med = r.getDouble(1)
    // est_rank(med) >= 2048 by construction and |est-exact| <= err, so
    // the true rank of med is within err+maxWeight of the target; a
    // loose sanity corridor suffices here (the tight guarantee is the
    // rank test above)
    assert(math.abs(med - 2048.0) <= 2.0 * err + 64,
      s"median estimate $med too far from 2048 (err=$err)")
  }

  test("k validation: odd / tiny rejected") {
    val df = Seq(1.0).toDF("v")
    intercept[Exception] {
      df.agg(QuantileSketch.sketch($"v", 7)).collect()
    }
    intercept[Exception] {
      df.agg(QuantileSketch.sketch($"v", 0)).collect()
    }
  }
}
