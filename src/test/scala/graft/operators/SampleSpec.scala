package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Deterministic per-group sampling: rerun-stable, k-bounded, uniform
  * draw redrawn by salt, computed via the heap aggregate (no window
  * sort of the population). */
class SampleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf(), "documents")
    .withColumn("grp", $"doc_id" % 4)

  test("exactly k per group (capped by group size), rerun-identical") {
    val a = Sample.bottomK(docs, Seq("grp"), "doc_id", k = 7)
    val b = Sample.bottomK(docs, Seq("grp"), "doc_id", k = 7)
    val perGroup = a.groupBy($"grp").count().select($"count").as[Long].collect()
    assert(perGroup.length == 4 && perGroup.forall(_ == 7))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "same data, same salt -> same sample")
    // a tiny population returns everything
    val tiny = Sample.bottomK(docs.filter($"doc_id" < 3), Seq("grp"), "doc_id", 10)
    assert(tiny.count() == 3)
  }

  test("heap sample == window-rank sample (two algorithms, same rows)") {
    val viaHeap = Sample.bottomK(docs, Seq("grp"), "doc_id", k = 9, salt = "s1")
    val h = conv(substring(md5(concat($"doc_id".cast("string"), lit(":s1"))), 1, 8), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"__h".asc, $"doc_id".asc)
    val viaWindow = docs.withColumn("__h", h)
      .withColumn("__rn", row_number().over(w))
      .filter($"__rn" <= 9)
      .select($"grp", $"doc_id")
    assert(viaHeap.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaHeap).isEmpty)
  }

  test("different salts draw different samples; each is still uniform-sized") {
    val s1 = Sample.bottomK(docs, Seq("grp"), "doc_id", k = 20, salt = "a")
      .as[(Long, Long)].collect().toSet
    val s2 = Sample.bottomK(docs, Seq("grp"), "doc_id", k = 20, salt = "b")
      .as[(Long, Long)].collect().toSet
    assert(s1.size == 80 && s2.size == 80)
    assert(s1 != s2, "independent salts must redraw the sample")
  }

  test("plan: heap aggregate, no window sort of the population") {
    val plan = Sample.bottomK(docs, Seq("grp"), "doc_id", k = 5)
      .queryExecution.executedPlan
    val windows = collectPlan(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"sampling must not window-sort the population:\n$plan")
    val partialAggs = collectPlan(plan) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
        if a.aggregateExpressions.exists(_.mode ==
          org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => a
    }
    assert(partialAggs.nonEmpty, s"expected map-side heap trim before the exchange:\n$plan")
  }
}
