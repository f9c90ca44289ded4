package graft.sinks

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("hive-partitioned layout gives partition pruning on the partition key") {
    val dir = java.nio.file.Files.createTempDirectory("layout_prune").toString
    val ev = Tables.load(spark, sf(), "events")
      .withColumn("day", to_date($"ts"))
    Sink.write(ev, dir, "events", Sink.Config(partitionBy = Seq("day")))
    val days = spark.read.parquet(dir).select($"day").distinct().count()
    assert(days > 1, "need multiple partitions to demonstrate pruning")
    val pruned = spark.read.parquet(dir).filter($"day" === "2024-01-02")
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("day"),
      "the day predicate must prune at the partition level, not per row")
    assert(pruned.count() == ev.filter(to_date($"ts") === "2024-01-02").count())
  }

  test("co-bucketed fact tables join without any exchange") {
    // bucket both fact tables by the join key at write time
    Bucketing.writeBucketed(Tables.load(spark, sf(), "lineitem"),
      "li_b", Seq("l_orderkey"), buckets = 8)
    Bucketing.writeBucketed(Tables.load(spark, sf(), "orders"),
      "ord_b", Seq("o_orderkey"), buckets = 8)
    try {
      // broadcast would hide the point at this size — force the join path
      val joined = spark.table("li_b").hint("merge")
        .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(round(sum($"l_extendedprice"), 2).as("rev"))
      // correctness vs the plain (shuffling) join
      val plain = Tables.load(spark, sf(), "lineitem")
        .join(Tables.load(spark, sf(), "orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(round(sum($"l_extendedprice"), 2).as("rev"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)

      // the join itself must be exchange-free: the only allowed shuffle is
      // the aggregation's, which sits ABOVE the join
      val smj = collectPlan(joined.queryExecution.executedPlan) {
        case j if j.nodeName.contains("SortMergeJoin") => j }
      assert(smj.nonEmpty, "expected a sort-merge join over buckets")
      val shufflesBelowJoin = smj.flatMap(_.collect { case e: ShuffleExchangeLike => e })
      assert(shufflesBelowJoin.isEmpty,
        s"bucketed join must not shuffle its inputs: $shufflesBelowJoin")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
