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

  test("the same operator runs as a plain batch aggregation") {
    val batch = EventStream.hourlyTypeCounts(Tables.load(spark, sf(), "events"))
    val viaTrunc = Tables.load(spark, sf(), "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
    assert(batch.exceptAll(viaTrunc).isEmpty && viaTrunc.exceptAll(batch).isEmpty)
  }
}
