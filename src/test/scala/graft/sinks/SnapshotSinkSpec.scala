package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** graft-snapshot: the streaming sink half of the log's symmetry.
  * Ingest mode = writeAppendBatch (exactly-once by batch id);
  * keyCol mode = applyChanges (CDC apply) — so source + sink by format
  * name IS declarative table-to-table replication. */
class SnapshotSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_snapsink").toString
    new java.io.File(d).delete()
    d
  }

  test("ingest mode: micro-batches commit as append-batch versions, exactly once") {
    val src = Files.createTempDirectory("sink_src").toString
    val table = freshDir()
    val ckpt = Files.createTempDirectory("sink_ckpt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      .write.mode("append").parquet(src)
    def drain(): Unit = {
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema).parquet(src)
        .writeStream.format("graft-snapshot")
        .option("path", table).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    Seq((3L, "c")).toDF("id", "text").write.mode("append").parquet(src)
    drain()
    val ops = Snapshots.versions(spark, table).map(_.op)
    assert(ops == Seq("append-batch-0", "append-batch-1"), ops.toString)
    assert(Snapshots.read(spark, table).count() == 3)
    // the log's replay guard holds behind the sink too
    assert(Snapshots.writeAppendBatch(
      Seq((3L, "c")).toDF("id", "text"), table, 1L).isEmpty)
    // a caught-up drain commits nothing
    drain()
    assert(Snapshots.versions(spark, table).size == 2)
  }

  test("keyCol mode: graft-cdc source -> graft-snapshot sink replicates a table declaratively") {
    val src = freshDir(); val rep = freshDir()
    Snapshots.writeAppend(Seq((1L, "one"), (2L, "two")).toDF("id", "text")
      .repartitionByRange(2, $"id"), src)
    Snapshots.writeAppend(Seq((3L, "three")).toDF("id", "text"), src)
    Snapshots.upsert(Seq((2L, "TWO")).toDF("id", "text"), src, "id")
    Snapshots.deleteWhere(spark, src, $"id" === 1)
    val ckpt = Files.createTempDirectory("sink_ck2").toString
    def sync(): Unit = {
      val q = spark.readStream.format("graft-cdc")
        .option("path", src).option("maxVersionsPerTrigger", "2").load()
        .writeStream.format("graft-snapshot")
        .option("path", rep).option("keyCol", "id")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    sync()
    def state(dir: String) = Snapshots.read(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(state(rep) == state(src), s"${state(rep)} vs ${state(src)}")
    // source advances; the same checkpoint resyncs the tail only
    Snapshots.writeAppend(Seq((7L, "seven")).toDF("id", "text"), src)
    Snapshots.deleteWhere(spark, src, $"id" === 3)
    sync()
    assert(state(rep) == state(src), s"${state(rep)} vs ${state(src)}")
  }

  test("fail-fast: missing path, partitionBy, bad output mode") {
    val e = intercept[Exception] {
      spark.readStream.format("rate").load()
        .writeStream.format("graft-snapshot")
        .option("checkpointLocation",
          Files.createTempDirectory("sink_ck3").toString)
        .trigger(Trigger.AvailableNow()).start()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("path=")), messages(e).toString)
  }
}
