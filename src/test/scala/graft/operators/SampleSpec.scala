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

  test("weightedSample: == the sort-limit reference algorithm; weights " +
      "BIAS the draw; null/zero weights never win; salt redraws") {
    val weighted = docs.select($"doc_id",
      when($"doc_id" % 10 === 0, 100.0).otherwise(1.0).as("w"))
    val got = Sample.weightedSample(weighted, "doc_id", "w", n = 40)
    // reference algorithm: full sort by the same exponential key
    val h = conv(substring(md5(concat($"doc_id".cast("string"), lit(":"))),
      1, 8), 16, 10).cast("long").cast("double")
    val key = -log((h + 1.0) / 4294967296.0) / $"w"
    val ref = weighted.select($"doc_id", key.as("sample_key"))
      .orderBy($"sample_key").limit(40)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "heap top-n must equal the sort-limit reference")
    // bias: 10% of docs carry 100x weight; they must dominate the draw
    val heavy = got.filter($"doc_id" % 10 === 0).count()
    assert(heavy > 20, s"100x-weighted docs must dominate, got $heavy/40")
    // weightless rows are excluded, not accidental winners
    val withNulls = weighted
      .withColumn("w", when($"doc_id" < 100, lit(null).cast("double"))
        .when($"doc_id" < 200, 0.0).otherwise($"w"))
    val clean = Sample.weightedSample(withNulls, "doc_id", "w", n = 40)
    assert(clean.filter($"doc_id" < 200).isEmpty)
    // salt redraws an independent sample
    val other = Sample.weightedSample(weighted, "doc_id", "w", n = 40,
      salt = "redraw")
    assert(got.select($"doc_id").exceptAll(other.select($"doc_id"))
      .count() > 0)
    // fail fast
    intercept[IllegalArgumentException](
      Sample.weightedSample(weighted, "doc_id", "w", n = 0))
  }

  test("weightedSample: STRING ids take the hashed detour and still equal " +
      "the sort-limit reference; bottomK fails fast on a string id") {
    // a readWarc-shaped corpus: the id is an opaque string record_id.
    // Before the hashed detour this cast to NULL inside the heap and the
    // sample came back EMPTY (the advisor's silent-wrongness finding).
    val weighted = docs.select(
      concat(lit("<urn:rec:"), $"doc_id".cast("string"), lit(">")).as("rid"),
      when($"doc_id" % 10 === 0, 100.0).otherwise(1.0).as("w"))
    val got = Sample.weightedSample(weighted, "rid", "w", n = 40)
    assert(got.count() == 40, "string ids must sample, not silently empty")
    assert(got.schema("rid").dataType ==
      org.apache.spark.sql.types.StringType, "id keeps its own type")
    // reference algorithm: full sort by the same exponential key — the
    // draw hashes the id's STRING form, so both paths rank identically
    val h = conv(substring(md5(concat($"rid", lit(":"))), 1, 8), 16, 10)
      .cast("long").cast("double")
    val key = -log((h + 1.0) / 4294967296.0) / $"w"
    val ref = weighted.select($"rid", key.as("sample_key"))
      .orderBy($"sample_key").limit(40)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "hashed-id heap top-n must equal the sort-limit reference")
    // rerun-stable, and salt redraws
    val again = Sample.weightedSample(weighted, "rid", "w", n = 40)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    val other = Sample.weightedSample(weighted, "rid", "w", n = 40,
      salt = "redraw")
    assert(got.select($"rid").exceptAll(other.select($"rid")).count() > 0)
    // bottomK has no detour: a lossy id must fail fast, not drop rows
    val e = intercept[IllegalArgumentException](
      Sample.bottomK(weighted.withColumn("grp", lit(1)),
        Seq("grp"), "rid", k = 5))
    assert(e.getMessage.contains("integral"))
  }

  test("weightedSampleByGroup: == the per-group window-rank reference; " +
      "weights bias within each group; small groups return whole; " +
      "string ids fail fast") {
    val weighted = docs.select($"grp", $"doc_id",
      when($"doc_id" % 10 === 0, 100.0).otherwise(1.0).as("w"))
    val got = Sample.weightedSampleByGroup(
      weighted, Seq("grp"), "doc_id", "w", n = 12)
    val perGroup = got.groupBy($"grp").count()
      .select($"count").as[Long].collect()
    assert(perGroup.length == 4 && perGroup.forall(_ == 12))
    // reference: the same exponential key ranked by a per-group window
    val h = conv(substring(md5(concat($"doc_id".cast("string"), lit(":"))),
      1, 8), 16, 10).cast("long").cast("double")
    val key = -log((h + 1.0) / 4294967296.0) / $"w"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"__k".asc)
    val ref = weighted.withColumn("__k", key)
      .withColumn("__rn", row_number().over(w)).filter($"__rn" <= 12)
      .select($"grp", $"doc_id", $"__k".as("sample_key"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "per-group heaps must equal the window-rank reference")
    // heavy docs far exceed their unweighted expectation (10% of the
    // population → ~5 of 48 under uniform draw; the 100x weight must
    // multiply that, bounded by each group's own heavy pool)
    assert(got.filter($"doc_id" % 10 === 0).count() > 12,
      "100x-weighted docs must dominate each group's draw")
    // a group smaller than n returns whole
    val tiny = Sample.weightedSampleByGroup(
      weighted.filter($"doc_id" < 6), Seq("grp"), "doc_id", "w", n = 10)
    assert(tiny.count() === 6)
    // integral ids only — fail fast, like bottomK
    assert(intercept[IllegalArgumentException](
      Sample.weightedSampleByGroup(
        weighted.withColumn("rid", concat(lit("r"), $"doc_id")),
        Seq("grp"), "rid", "w", n = 3)).getMessage.contains("integral"))
  }

  test("permute: a bijective, rerun-stable position assignment; salt redraws") {
    val base = Tables.load(spark, sf(), "documents")
    val n = base.count()
    val a = Sample.permute(base, "doc_id", salt = "e0")
    val b = Sample.permute(base, "doc_id", salt = "e0")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "rerun-stable")
    val positions = a.select($"pos").as[Long].collect().sorted.toSeq
    assert(positions == (1L to n).toSeq, "positions are a 1..n bijection")
    // independent witness: global sort order by the same md5 key
    val expect = base
      .select($"doc_id",
        md5(concat($"doc_id".cast("string"), lit(":e0"))).as("k"))
      .orderBy($"k").select($"doc_id").as[Long].collect().toSeq
    val got = a.orderBy($"pos").select($"doc_id").as[Long].collect().toSeq
    assert(got == expect, "rank order must equal the hash-sort order")
    val redrawn = Sample.permute(base, "doc_id", salt = "e1")
    assert(redrawn.exceptAll(a).count() > 0, "new salt, new permutation")
  }

  test("permute plan: no unpartitioned window over the data (only the per-partition offsets)") {
    val plan = Sample.permute(Tables.load(spark, sf(), "documents"), "doc_id")
      .queryExecution.executedPlan
    // the Prefix.cumsum contract, tightened r19: the global (no-group)
    // long-sum form has NO WindowExec at all — the per-partition
    // subtotal prefix folds on the driver and the interior rank is a
    // partition-local mapPartitions fold. Any window that does appear
    // (future layouts) must not be an unpartitioned window over rows.
    val windows = collectPlan(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window reintroduced into permute:\n$w")
    }
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
