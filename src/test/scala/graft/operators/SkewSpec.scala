package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** The two skew mechanisms the engine relies on at scale:
  * deterministic salted two-phase aggregation (hot-key groupBy) and
  * AQE's runtime skew-join splitting (hot-key joins). */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedSumCount is exact: equals the plain aggregation") {
    val li = Tables.load(spark, sf(), "lineitem")
    val salted = Skew.saltedSumCount(li, Seq($"l_returnflag"),
      saltBy = $"l_orderkey", salts = 8,
      value = $"l_quantity", sumAlias = "s", cntAlias = "n")
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("s"), count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed join partition at runtime") {
    // 90% of the left side lands on one key; thresholds are forced down
    // so the sf-small fixture triggers the same runtime re-plan a hot key
    // triggers at 100 TB. Broadcast is disabled to expose the shuffle join.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val left = spark.range(0, 200000)
        .select(when($"id" < 180000, 0L).otherwise($"id").as("k"), $"id".as("v"))
      val right = spark.range(0, 2000).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, "k")
      // Execute THIS AdaptiveSparkPlanExec directly: every Dataset action
      // (write/foreach/count) clones the QueryExecution, so the runtime
      // re-plan would be invisible on `joined` otherwise.
      val aqe = joined.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a
      }.head
      aqe.execute().count()
      val smj = collectPlan(aqe.executedPlan) { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "expected a sort-merge join under AQE")
      assert(smj.exists(_.isSkewJoin),
        s"AQE must mark the hot-key join as skew-split; got ${smj.map(_.isSkewJoin)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
