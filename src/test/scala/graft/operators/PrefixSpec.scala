package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec

/** Distributed prefix sum: equals the single-task global window, while
  * the executed plan keeps every data-sized window partition-local. */
class PrefixSpec extends SparkSpec {

  import spark.implicits._

  test("cumsum equals the global-window form on fixture data") {
    val docs = Tables.load(spark, sf(), "documents")
      .select($"doc_id", $"n_chars")
    val ours = Prefix.cumsum(docs, "doc_id", "n_chars", "run")
    val w = Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, 0)
    val global = docs.withColumn("run", sum($"n_chars").over(w))
    assert(ours.exceptAll(global).isEmpty && global.exceptAll(ours).isEmpty)
  }

  test("cumsumByGroup restarts per group and equals the grouped window") {
    val docs = Tables.load(spark, sf(), "documents")
      .select($"doc_id", $"lang", $"n_chars").repartition(8)
    val ours = Prefix.cumsumByGroup(docs, Seq("lang"), "doc_id",
      "n_chars", "run")
      .select($"doc_id", $"lang", $"n_chars", $"run") // join reorders cols
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val grouped = docs.withColumn("run", sum($"n_chars").over(w))
    assert(ours.exceptAll(grouped).isEmpty && grouped.exceptAll(ours).isEmpty)
    // per-group restart: each lang's minimum running total is its first
    // doc's own value, not a carry-over from another group
    val firsts = ours.groupBy($"lang").agg(min($"run").as("m"))
      .join(grouped.groupBy($"lang").agg(min($"run").as("m2")), Seq("lang"))
    assert(firsts.filter($"m" =!= $"m2").isEmpty)
    // with a non-empty group key, NO unpartitioned window at all
    val plan = ours.queryExecution.executedPlan
    val globals = collectPlan(plan) {
      case e: WindowExec if e.partitionSpec.isEmpty => e
    }
    assert(globals.isEmpty, "grouped scan must not have a global window")
  }

  test("every data-sized window in the plan is partition-local") {
    val docs = Tables.load(spark, sf(), "documents").select($"doc_id", $"n_chars")
    val plan = Prefix.cumsum(docs, "doc_id", "n_chars", "run")
      .queryExecution.executedPlan
    // the global form carries NO window at all any more: the
    // per-partition subtotal prefix is folded on the driver (one row
    // per partition) instead of through an empty-partition-spec
    // WindowExec, so nothing in the plan can warn "No Partition
    // Defined" — r19's zero-unpartitioned-windows contract
    val windows = collectPlan(plan) { case w: WindowExec => w }
    assert(windows.isEmpty,
      s"global cumsum must be window-free, found: $windows")
  }

  test("no exchange past the checkpoint: every shuffle in the plan is " +
    "subtotal-sized (the round-13 interior-fold rewrite)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = Tables.load(spark, sf(), "documents")
      .select($"doc_id", $"lang", $"n_chars").repartition(8)
    for (groups <- Seq(Nil, Seq("lang"))) {
      val out = Prefix.cumsumByGroup(docs, groups, "doc_id", "n_chars", "run")
      out.collect() // finalize AQE stages before reading the plan
      val plan = out.queryExecution.executedPlan
      val shuffles = collectPlan(plan) { case e: ShuffleExchangeExec => e }
      // the range exchange lives behind the eager checkpoint; the only
      // shuffles in THIS plan must carry the per-partition subtotal
      // frame — their input is a partial aggregate (one row per
      // partition-group stretch, map-side combined), never raw rows.
      // The old interior-window exchange had a bare Project child.
      shuffles.foreach { e =>
        val aggBelow = collectPlan(e.child) {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
        }
        assert(aggBelow.nonEmpty,
          s"full-data exchange past the checkpoint (groups=$groups): $e")
      }
      // and no data-sized window either: the fold replaced it
      val windows = collectPlan(plan) { case w: WindowExec => w }
      windows.foreach { w =>
        assert(w.toString.contains("__psum"),
          s"data-sized window survived the rewrite (groups=$groups): $w")
      }
    }
  }

  test("binary group keys take the window branch and stay correct — " +
      "the fold's value comparison can't see through Array[Byte]") {
    // two binary keys, interleaved in order: on the fold path Array
    // reference equality would reset the accumulator every row and
    // degenerate the running total to offset + own value
    val rows = Seq(
      (1L, Array[Byte](1), 10L), (2L, Array[Byte](2), 100L),
      (3L, Array[Byte](1), 20L), (4L, Array[Byte](2), 200L),
      (5L, Array[Byte](1), 30L)).toDF("ord", "key", "v")
    val ours = Prefix.cumsumByGroup(rows, Seq("key"), "ord", "v", "run")
      .select($"ord", $"run")
    val w = Window.partitionBy($"key").orderBy($"ord")
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = rows.withColumn("run", sum($"v").over(w))
      .select($"ord", $"run")
    assert(ours.exceptAll(expected).isEmpty &&
      expected.exceptAll(ours).isEmpty)
    // the third key-1 row accumulates 10+20+30, not offset + 30
    assert(ours.filter($"ord" === 5).head().getLong(1) === 60L)
  }

  test("cumsum fold handles null values like the window form " +
    "(skip, and NULL until the stretch's first non-null)") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)), (4L, None))
      .toDF("id", "v").repartition(2)
    val got = Prefix.cumsum(df, "id", "v", "run")
      .select($"id", $"run").as[(Long, Option[Long])].collect().toMap
    val w = Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("run", sum($"v").over(w))
      .select($"id", $"run").as[(Long, Option[Long])].collect().toMap
    assert(got == want)
    assert(got == Map(1L -> Some(10L), 2L -> Some(10L), 3L -> Some(15L),
      4L -> Some(15L)))
    // all-null leading stretch: the window form yields NULL there
    val df2 = Seq((1L, None: Option[Long]), (2L, Some(7L))).toDF("id", "v")
    val got2 = Prefix.cumsum(df2, "id", "v", "run")
      .select($"id", $"run").as[(Long, Option[Long])].collect().toMap
    assert(got2 == Map(1L -> None, 2L -> Some(7L)))
  }

  test("cumsum double path: strict in-order fold equals the window sum") {
    // halves are binary-exact, so subtotal association (which differs
    // between the two-pass scan and the global window) cannot drift
    val docs = Tables.load(spark, sf(), "documents")
      .select($"doc_id", ($"n_chars" * 0.5).as("v")).repartition(8)
    val ours = Prefix.cumsum(docs, "doc_id", "v", "run")
    val w = Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, 0)
    val global = docs.withColumn("run", sum($"v").over(w))
    assert(ours.exceptAll(global).isEmpty && global.exceptAll(ours).isEmpty)
  }

  test("cumsumByGroupWithTotals: subtotal-derived group totals equal " +
      "max(run) per group (incl. a NULL group key)") {
    val docs = Tables.load(spark, sf(), "documents")
      .select($"doc_id", when($"doc_id" % 7 === 0, lit(null))
        .otherwise($"lang").as("lang"), lit(1L).as("c"))
      .repartition(8)
    val (out, totals) = Prefix.cumsumByGroupWithTotals(
      docs, Seq("lang"), "doc_id", "c", "run", "n")
    val fromRun = out.groupBy($"lang").agg(max($"run").as("n2"))
    val joined = totals.join(fromRun, totals("lang") <=> fromRun("lang"))
      .select(totals("lang"), $"n", $"n2").collect()
    assert(joined.nonEmpty && joined.length == totals.count())
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"group ${r.get(0)}: subtotal total ${r.getLong(1)} != max run ${r.getLong(2)}")
    }
  }

  test("packIntoShards cuts greedy first-fit shards at the token budget") {
    val df = Seq((1L, 30L), (2L, 50L), (3L, 40L), (4L, 10L), (5L, 100L))
      .toDF("doc_id", "n_tokens")
    val out = Prefix.packIntoShards(df, "doc_id", "n_tokens", budget = 100L)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    // runs start at 0,30,80,120,130 -> shards 0,0,0,1,1
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
  }
}
