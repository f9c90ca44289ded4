package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EventStreamSpec extends SparkSpec {

  import spark.implicits._

  test("streaming windowed counts equal the batch result once windows close") {
    val src = Files.createTempDirectory("es_src").toString
    val out = Files.createTempDirectory("es_out").toString
    val ckpt = Files.createTempDirectory("es_ckpt").toString

    val events = Tables.load(spark, sf(), "events")
      .select($"ts", $"event_type", $"value")
    events.write.mode("append").parquet(src)

    def run(): Unit = {
      val stream = spark.readStream.schema(events.schema).parquet(src)
      val q = EventStream.hourlyTypeCounts(stream).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // batch 1: watermark hasn't advanced past any window -> nothing emits
    run()
    // batch 2: one far-future event closes every original window
    val far = events.limit(1)
      .select(($"ts" + expr("INTERVAL 365 DAYS")).as("ts"), $"event_type", $"value")
    far.write.mode("append").parquet(src)
    run()

    val streamed = spark.read.parquet(out)
      .select($"hour", $"event_type", $"n", $"total")
    val expected = EventStream.hourlyTypeCounts(events) // same code, batch plan
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup drops in-horizon re-deliveries, keeps distinct keys") {
    val src = Files.createTempDirectory("dd_src").toString
    val out = Files.createTempDirectory("dd_out").toString
    val ckpt = Files.createTempDirectory("dd_ckpt").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)

    val batch1 = Seq((1L, ts(0), "a"), (1L, ts(5), "a-dup"), (2L, ts(1), "b"))
      .toDF("event_id", "ts", "payload")
    batch1.write.mode("append").parquet(src)

    def run(): Unit = {
      val stream = spark.readStream.schema(batch1.schema).parquet(src)
      val q = EventStream.dedupStream(stream, Seq("event_id")).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    run()
    // second batch re-delivers key 1 within the horizon and adds key 3
    Seq((1L, ts(10), "a-redelivery"), (3L, ts(20), "c"))
      .toDF("event_id", "ts", "payload").write.mode("append").parquet(src)
    run()

    val ids = spark.read.parquet(out).select($"event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L)) // one row per key, dups dropped
  }

  test("the same operator runs as a plain batch aggregation") {
    val batch = EventStream.hourlyTypeCounts(Tables.load(spark, sf(), "events"))
    val viaTrunc = Tables.load(spark, sf(), "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
    assert(batch.exceptAll(viaTrunc).isEmpty && viaTrunc.exceptAll(batch).isEmpty)
  }

  test("streaming trending items equal the batch result once windows close") {
    val src = Files.createTempDirectory("tr_src").toString
    val out = Files.createTempDirectory("tr_out").toString
    val ckpt = Files.createTempDirectory("tr_ckpt").toString

    val events = Tables.load(spark, sf(), "events")
      .select($"ts", $"event_type", $"value")
    events.write.mode("append").parquet(src)

    def run(): Unit = {
      val stream = spark.readStream.schema(events.schema).parquet(src)
      val q = EventStream.trendingTypes(stream).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    run() // state accumulates, nothing closed yet
    val far = events.limit(1)
      .select(($"ts" + expr("INTERVAL 365 DAYS")).as("ts"), $"event_type", $"value")
    far.write.mode("append").parquet(src)
    run() // the far-future event closes every original window

    val streamed = spark.read.parquet(out)
      .select($"hour", $"rank", $"event_type", $"cnt")
    // k=8 >= event-type cardinality: the sketch is exact, so the
    // micro-batch state-store merges must reproduce the batch plan's
    // partial-aggregate merges bit-for-bit
    val expected = EventStream.trendingTypes(events)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
    // ranks within a window are dense from 1 and counts non-increasing
    val perWindow = streamed.collect().groupBy(_.getTimestamp(0))
    perWindow.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rows.length).toSeq)
      val cnts = sorted.map(_.getLong(3)).toSeq
      assert(cnts == cnts.sorted.reverse)
    }
  }
}
