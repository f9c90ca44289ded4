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

  test("compaction: append-files collapse to one per bucket; rows, probe plan, props preserved") {
    import graft.operators.Dedup
    val d = Tables.load(spark, sf(), "documents")
    Dedup.writeFingerprintStore(d.filter($"doc_id" % 4 === 0), "text",
      "fp_compact", buckets = 8)
    try {
      // three ingest rounds: each commit appends one file per bucket
      (1 to 3).foreach { r =>
        Dedup.appendToFingerprintStore(
          d.filter($"doc_id" % 4 === lit(r))
            .select($"doc_id", concat($"text", lit(s" round$r")).as("text")),
          "text", "fp_compact")
      }
      val before = Bucketing.bucketFileStats(spark, "fp_compact")
        .select($"files").as[Long].collect()
      assert(before.sum > 8 && before.exists(_ > 1),
        s"appends must have accumulated files: ${before.toSeq}")
      val rowsBefore = spark.table("fp_compact").select($"fp")
        .as[String].collect().sorted.toSeq
      spark.sql("ALTER TABLE fp_compact SET TBLPROPERTIES ('graft.probe' = 'kept')")

      Bucketing.compactBucketed(spark, "fp_compact")

      val after = Bucketing.bucketFileStats(spark, "fp_compact")
        .select($"files").as[Long].collect()
      assert(after.forall(_ == 1L) && after.length <= 8,
        s"compaction must leave one file per occupied bucket: ${after.toSeq}")
      val rowsAfter = spark.table("fp_compact").select($"fp")
        .as[String].collect().sorted.toSeq
      assert(rowsAfter == rowsBefore, "compaction must be a pure layout rewrite")
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("fp_compact"))
      assert(meta.properties.get("graft.probe").contains("kept"),
        "graft table properties must survive the rewrite")
      assert(meta.bucketSpec.exists(_.numBuckets == 8))

      // the zero-exchange probe pin must hold on the compacted table
      val batch = d.filter($"doc_id" % 4 === 0).limit(50)
      val got = Dedup.againstCorpus(batch,
        spark.table("fp_compact").hint("merge"), "text", "doc_id")
      got.collect()
      val joins = collectPlan(got.queryExecution.executedPlan) {
        case j if j.nodeName.contains("SortMergeJoin") => j }
      assert(joins.nonEmpty)
      val storeSide = joins.flatMap(_.children.lastOption)
      val exchanges = storeSide.flatMap(_.collect {
        case e: ShuffleExchangeLike => e })
      assert(exchanges.isEmpty,
        s"compacted store must still probe exchange-free: $exchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS fp_compact")
      spark.sql("DROP TABLE IF EXISTS fp_compact__compacting")
    }
  }

  test("rebucket: rows identical, new count live, one file per bucket, props kept, probe exchange-free") {
    import graft.operators.Dedup
    val d = Tables.load(spark, sf(), "documents")
    Dedup.writeFingerprintStore(d, "text", "fp_rebucket", buckets = 4)
    try {
      spark.sql("ALTER TABLE fp_rebucket SET TBLPROPERTIES ('graft.probe' = 'kept')")
      val rowsBefore = spark.table("fp_rebucket").select($"fp")
        .as[String].collect().sorted.toSeq

      // grow pressure observed via bucketFileStats: rebucket to the count
      // the byte budget asks for (here simply 4 -> 16)
      val statsBefore = Bucketing.bucketFileStats(spark, "fp_rebucket")
      assert(statsBefore.count() > 0)
      Bucketing.rebucketStore(spark, "fp_rebucket", 16)

      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("fp_rebucket"))
      assert(meta.bucketSpec.exists(_.numBuckets == 16),
        s"bucket count must be 16: ${meta.bucketSpec}")
      assert(meta.bucketSpec.exists(_.bucketColumnNames == Seq("fp")),
        "bucket columns preserved")
      assert(meta.properties.get("graft.probe").contains("kept"),
        "graft table properties must survive the rewrite")
      val rowsAfter = spark.table("fp_rebucket").select($"fp")
        .as[String].collect().sorted.toSeq
      assert(rowsAfter == rowsBefore, "rebucket must be a pure layout rewrite")
      val files = Bucketing.bucketFileStats(spark, "fp_rebucket")
        .select($"files").as[Long].collect()
      assert(files.forall(_ == 1L) && files.length <= 16,
        s"one file per occupied bucket at the new count: ${files.toSeq}")

      // the probe joins exchange-free on the store side at the NEW count
      val batch = d.limit(50)
      val got = Dedup.againstCorpus(batch,
        spark.table("fp_rebucket").hint("merge"), "text", "doc_id")
      got.collect()
      val joins = collectPlan(got.queryExecution.executedPlan) {
        case j if j.nodeName.contains("SortMergeJoin") => j }
      assert(joins.nonEmpty)
      val exchanges = joins.flatMap(_.children.lastOption).flatMap(_.collect {
        case e: ShuffleExchangeLike => e })
      assert(exchanges.isEmpty,
        s"rebucketed store must probe exchange-free: $exchanges")

      // shrink path + same-count delegation both converge to one file/bucket
      Bucketing.rebucketStore(spark, "fp_rebucket", 2)
      val meta2 = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("fp_rebucket"))
      assert(meta2.bucketSpec.exists(_.numBuckets == 2))
      assert(spark.table("fp_rebucket").select($"fp")
        .as[String].collect().sorted.toSeq == rowsBefore)
      Bucketing.rebucketStore(spark, "fp_rebucket", 2) // == compact
      assert(Bucketing.bucketFileStats(spark, "fp_rebucket")
        .select($"files").as[Long].collect().forall(_ == 1L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS fp_rebucket")
      spark.sql("DROP TABLE IF EXISTS fp_rebucket__rebucketing")
      spark.sql("DROP TABLE IF EXISTS fp_rebucket__compacting")
    }
  }
}
