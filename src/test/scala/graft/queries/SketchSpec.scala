package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregations (q37). The query itself
  * now carries its contract (within-tolerance booleans hash-checked
  * against a TRUE-asserting oracle); this spec pins the same bounds
  * directly against the raw sketch values, independent of the query's
  * projection. */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("q37 output: exact values plus all-true tolerance booleans") {
    val out = SparkEntry.queries("q37_approx_sketches")(spark, sf("sf0.01"))
    val rows = out.collect()
    assert(rows.length == 3)
    Seq("nd_parts_ok", "nd_orders_ok", "med_qty_ok").foreach { c =>
      assert(out.filter(!col(c)).isEmpty, s"$c must hold for every group")
    }
  }

  test("approx_count_distinct within 5% of exact per group") {
    val both = Tables.load(spark, sf("sf0.01"), "lineitem")
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx"),
        count_distinct($"l_partkey").as("exact"))
      .as[(String, Long, Long)].collect()
    assert(both.length == 3)
    both.foreach { case (k, a, e) =>
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("approximate median within one quantile step of exact") {
    val both = Tables.load(spark, sf("sf0.01"), "lineitem")
      .groupBy($"l_returnflag")
      .agg(percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("approx"),
        percentile($"l_quantity", lit(0.5)).as("exact"))
      .as[(String, Double, Double)].collect()
    both.foreach { case (k, a, e) =>
      assert(math.abs(a - e) <= 1.0, s"$k: approx $a vs exact $e")
    }
  }
}
