package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Plan-shape assertions: the 100 TB properties each headline query
  * relies on (scan pruning, filter pushdown, broadcast vs shuffle joins,
  * bounded shuffle counts) pinned as regression tests. A wrong plan that
  * still returns right answers at sf0.01 is exactly the bug class the
  * oracle can't catch.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan

  private def collectAll[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
    collectPlan(p)(f) // SparkSpec's AQE/stage-aware walk

  private def scans(name: String): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    collectAll(plan(name)) { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }

  test("q01: filter and projection reach the parquet scan") {
    val Seq(scan) = scans("q01_filter_project")
    assert(scan.metadata("PushedFilters").contains("GreaterThan(l_quantity,45.0)"))
    // only the referenced columns are read, not all 11
    assert(scan.requiredSchema.fieldNames.toSet ==
      Set("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"))
  }

  test("q04: all three dimension joins broadcast; no cartesian anywhere") {
    val p = plan("q04_revenue_nation")
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 3, s"expected customer/nation/region to broadcast, got ${bhj.size}")
    assert(collectAll(p) { case c if c.nodeName.contains("CartesianProduct") => c }.isEmpty)
  }

  test("q22: near-dup pairs stay within two shuffles (bucket group + distinct)") {
    val p = plan("q22_neardup_pairs")
    val shuffles = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 2, s"LSH path must not shuffle more than twice, got ${shuffles.size}")
    assert(collectAll(p) { case j if j.nodeName.contains("SortMergeJoin") => j }.isEmpty,
      "pair generation must come from bucket grouping, not a self-join")
  }

  test("q30: corpus is never shuffled — query set broadcasts") {
    val p = plan("q30_cosine_topk")
    assert(collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }.nonEmpty
      || collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty)
    // the only exchange allowed is the window's partition-by-query shuffle
    val shuffles = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 1, s"got ${shuffles.size} shuffles")
  }

  test("q27: the id cap is pushed into both scan sides") {
    val pushed = scans("q27_ngram_jaccard").map(_.metadata("PushedFilters"))
    assert(pushed.nonEmpty && pushed.forall(_.contains("LessThan(doc_id,200)")))
  }

  test("q34: salted aggregation shuffles on (key, salt) first, then key") {
    val p = plan("q34_salted_hotkey_agg")
    // Catalyst renames the salt alias to _groupingexpression, so assert
    // the shape: one exchange on (key, <salt expr>), one on key alone.
    val parts = collectAll(p) { case e: ShuffleExchangeLike =>
      e.outputPartitioning.asInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
        .expressions.size
    }
    assert(parts.sorted == Seq(1, 2), s"expected (key,salt) then (key) exchanges, got $parts")
  }

  test("q57: bucketed fact join has no exchange below the sort-merge join") {
    val p = plan("q57_bucketed_join")
    val smj = collectAll(p) { case j if j.nodeName.contains("SortMergeJoin") => j }
    assert(smj.nonEmpty, "expected a sort-merge join over co-located buckets")
    val shufflesBelowJoin = smj.flatMap(_.collect { case e: ShuffleExchangeLike => e })
    assert(shufflesBelowJoin.isEmpty,
      s"bucketed join must not shuffle its inputs: $shufflesBelowJoin")
  }

  test("q58: exact percentiles run without a buffering aggregate") {
    // the whole point of the sort-based form: no TypedImperativeAggregate
    // holding a group's values in memory (ObjectHashAggregate is the
    // physical home of Spark's buffering `percentile`)
    val p = plan("q58_sort_percentiles")
    val buffering = collectAll(p) { case n if n.nodeName.contains("ObjectHashAggregate") => n }
    assert(buffering.isEmpty, s"sort-based percentiles must not buffer: $buffering")
  }

  test("q59: IVF search broadcasts probes; corpus side has no sort-merge join") {
    val p = plan("q59_ivf_topk")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "candidate generation must be a broadcast join on the list id")
    assert(collectAll(p) { case j if j.nodeName.contains("SortMergeJoin") => j }.isEmpty,
      "the corpus must never shuffle for a join")
    assert(collectAll(p) { case c if c.nodeName.contains("CartesianProduct") => c }.isEmpty)
  }

  test("q63: top-k runs as a bounded aggregate — no window sort, one shuffle") {
    val p = plan("q63_topk_agg")
    assert(collectAll(p) { case w if w.nodeName.contains("Window") => w }.isEmpty,
      "the heap aggregate must replace the window sort")
    val shuffles = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 1, s"expected only the per-query agg exchange, got ${shuffles.size}")
    val aggs = collectAll(p) { case a if a.nodeName.contains("ObjectHashAggregate") => a }
    assert(aggs.size >= 2, "partial + final heap aggregation expected")
  }

  test("q03: aggregation is partial (map-side combine) before its shuffle") {
    val s = plan("q03_agg_pricing").toString
    assert(s.contains("HashAggregate"))
    // partial + final pair means the shuffle carries pre-aggregated rows
    assert("HashAggregate".r.findAllIn(s).size >= 2)
  }

  test("q103: text -> token ids is narrow — no keyed exchange") {
    val p = plan("q103_token_ids")
    // the contract is "no data-DEPENDENT shuffle": nothing keys on
    // tokens or ids, so a petabyte corpus is never clustered to
    // tokenize. Par.widen's round-robin re-deal of the one-file
    // fixture scan (r18 kernel floor — a no-op on any multi-file
    // corpus) is allowed; any hash/range partitioning is not.
    val keyed = collectAll(p) { case e: ShuffleExchangeLike
        if !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning]
        => e }
    assert(keyed.isEmpty,
      "token ids for a petabyte corpus must be a map over the scan")
    val kernels = collectAll(p) {
      case pr if pr.toString.contains("graft_bpe_ids") => pr }
    assert(kernels.nonEmpty, "the id kernel must be in the plan")
  }

  test("q115: DSIR scoring pass is zero-exchange (after the dim-bounded count aggs)") {
    // importanceWeights runs its two bucket-count aggregates eagerly
    // (collected, dim-bounded); the frame it RETURNS — the per-document
    // scoring pass over the raw corpus — must be a pure narrow fold:
    // no shuffle, no join, no explode on the corpus-sized path
    val p = plan("q115_dsir_weights")
    assert(collectAll(p) { case e: ShuffleExchangeLike => e }.isEmpty,
      "DSIR weights for a petabyte corpus must be a map over the scan")
    assert(collectAll(p) {
      case g if g.nodeName.contains("Generate") => g }.isEmpty,
      "the token fold must not explode the corpus")
  }

  test("q116: DSIR selection is a distributed top-k heap, not a global sort") {
    val p = plan("q116_dsir_select")
    val takeOrdered = collectAll(p) {
      case t if t.nodeName.contains("TakeOrdered") => t }
    assert(takeOrdered.nonEmpty,
      s"orderBy.limit must plan as TakeOrderedAndProject: ${p.nodeName}")
  }
}
