package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregations (q37): they have no
  * cross-engine oracle, so correctness is pinned against the exact
  * answers here. */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("approx_count_distinct within 5% of exact per group") {
    val approx = SparkEntry.queries("q37_approx_sketches")(spark, sf("sf0.01"))
      .select($"l_returnflag", $"nd_parts").as[(String, Long)].collect().toMap
    val exact = Tables.load(spark, sf("sf0.01"), "lineitem")
      .groupBy($"l_returnflag")
      .agg(count_distinct($"l_partkey").as("nd"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("approximate median within one quantile step of exact") {
    val approx = SparkEntry.queries("q37_approx_sketches")(spark, sf("sf0.01"))
      .select($"l_returnflag", $"med_qty").as[(String, Double)].collect().toMap
    val exact = Tables.load(spark, sf("sf0.01"), "lineitem")
      .groupBy($"l_returnflag")
      .agg(percentile($"l_quantity", lit(0.5)).as("med"))
      .as[(String, Double)].collect().toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) <= 1.0, s"$k: approx ${approx(k)} vs exact $e")
    }
  }
}
