package graft.sources

import graft.SparkSpec
import graft.sinks.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** graft-cdc: the streaming change-data-feed over a Snapshots table.
  * The load-bearing row is the batch==stream differential — the stream
  * must emit EXACTLY what Snapshots.changes computes, because getBatch
  * IS that algebra. */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_cdc").toString
    new java.io.File(d).delete()
    d
  }

  /** v1 two appends' worth of rows, v3 upsert, v4 delete, v5 compact,
    * v6 restore — every op class the feed distinguishes. */
  private def buildTable(dir: String): Unit = {
    Snapshots.writeAppend(Seq((1L, "one"), (2L, "two")).toDF("id", "text")
      .repartitionByRange(2, $"id"), dir)                              // v1
    Snapshots.writeAppend(Seq((3L, "three")).toDF("id", "text"), dir)  // v2
    Snapshots.upsert(Seq((2L, "TWO")).toDF("id", "text"), dir, "id")   // v3
    Snapshots.deleteWhere(spark, dir, $"id" === 1)                     // v4
    Snapshots.compact(spark, dir, 512L * 1024 * 1024)                  // v5
    Snapshots.restore(spark, dir, 2)                                   // v6
  }

  private def drain(dir: String, out: String, ckpt: String,
                    options: Map[String, String] = Map.empty): Unit = {
    // no options → the Snapshots.readChangesStream door; with options →
    // the raw format registration (both public surfaces covered)
    val frame =
      if (options.isEmpty) Snapshots.readChangesStream(spark, dir)
      else options.foldLeft(
        spark.readStream.format("graft-cdc").option("path", dir)) {
        case (r, (k, v)) => r.option(k, v)
      }.load()
    val q = frame
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    assert(!q.isActive, "AvailableNow must terminate after draining")
  }

  private def asSet(df: DataFrame): Set[(Long, String, String, Int)] =
    df.select($"id", $"text", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Int)].collect().toSet

  test("differential: the stream emits exactly the batch changes() feed, op-aware") {
    val dir = freshDir()
    buildTable(dir)
    val out = Files.createTempDirectory("cdc_out").toString
    val ckpt = Files.createTempDirectory("cdc_ckpt").toString
    drain(dir, out, ckpt)
    val streamed = asSet(spark.read.parquet(out))
    val batch = asSet(Snapshots.changes(spark, dir, 0))
    assert(streamed == batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
    // sanity on content: compact silent, restore visible as re-insert
    assert(!streamed.exists(_._4 == 5), "compact must not appear in the feed")
    assert(streamed.exists(t => t._4 == 6 && t._3 == "insert"))
  }

  test("admission control: maxVersionsPerTrigger=1 drains one commit per micro-batch") {
    val dir = freshDir()
    buildTable(dir)
    val batches = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Set[Int]]())
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir).option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     _: Long) => {
        batches.add(df.select($"_commit_version").distinct()
          .as[Int].collect().toSet); ()
      })
      .option("checkpointLocation", Files.createTempDirectory("cdc_ck2").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    import scala.jdk.CollectionConverters._
    val seen = batches.asScala.toSeq
    assert(seen.forall(_.size <= 1),
      s"a micro-batch drained more than one commit: $seen")
    // six commits → six metered triggers (empty layout batches included)
    assert(seen.size == 6, s"expected 6 metered batches, got ${seen.size}: $seen")
    assert(seen.flatten.toSet == Set(1, 2, 3, 4, 6), seen.toString)
  }

  test("checkpoint resume: a second run picks up ONLY commits after the cursor") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), dir)
    val out = Files.createTempDirectory("cdc_out3").toString
    val ckpt = Files.createTempDirectory("cdc_ck3").toString
    drain(dir, out, ckpt)
    assert(asSet(spark.read.parquet(out)).map(_._4) == Set(1))
    // table advances while the stream is down
    Snapshots.upsert(Seq((2L, "B")).toDF("id", "text"), dir, "id") // v2
    drain(dir, out, ckpt)
    val all = asSet(spark.read.parquet(out))
    assert(all == asSet(Snapshots.changes(spark, dir, 0)),
      "resumed stream must complete the feed without duplicating v1")
    assert(all.count(_._4 == 1) == 2 && all.count(_._4 == 2) == 2, all.toString)
    // nothing new: a third run emits nothing
    val before = spark.read.parquet(out).count()
    drain(dir, out, ckpt)
    assert(spark.read.parquet(out).count() == before)
  }

  test("table-to-table replication: graft-cdc + applyChanges converges the replica") {
    val src = freshDir(); val rep = freshDir()
    buildTable(src)
    val ckpt = Files.createTempDirectory("cdc_rep_ck").toString
    def sync(): Unit = {
      // 2 versions/trigger → multi-commit batches exercise the
      // net-effect application, not just one-commit replay
      val q = Snapshots.readChangesStream(spark, src, maxVersionsPerTrigger = 2)
        .writeStream
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) => { Snapshots.applyChanges(df, rep, "id"); () })
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    sync()
    def state(dir: String) = Snapshots.read(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(state(rep) == state(src),
      s"replica diverged: ${state(rep)} vs ${state(src)}")
    // source advances while the replica is down; resync converges again
    Snapshots.writeAppend(Seq((9L, "nine")).toDF("id", "text"), src)
    Snapshots.deleteWhere(spark, src, $"id" === 1)
    Snapshots.upsert(Seq((3L, "THREE")).toDF("id", "text"), src, "id")
    sync()
    assert(state(rep) == state(src),
      s"resync diverged: ${state(rep)} vs ${state(src)}")
  }

  test("startingVersion skips history; pre-horizon cursor fails loud at stream time") {
    val dir = freshDir()
    buildTable(dir)
    val out = Files.createTempDirectory("cdc_out4").toString
    drain(dir, out, Files.createTempDirectory("cdc_ck4").toString,
      Map("startingVersion" -> "4"))
    val tail = asSet(spark.read.parquet(out))
    assert(tail == asSet(Snapshots.changes(spark, dir, 4)), tail.toString)
    assert(tail.map(_._4) == Set(6))
    // vacuum past v1, then a from-the-beginning stream must fail naming
    // the retained range, not silently skip
    Snapshots.vacuum(spark, dir, keepVersions = 2)
    val q = spark.readStream.format("graft-cdc").option("path", dir).load()
      .writeStream.format("noop")
      .option("checkpointLocation", Files.createTempDirectory("cdc_ck5").toString)
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(180000)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("retained")), messages(e).toString)
  }
}
