package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {

  import spark.implicits._
  import Sessionize.{Event, Session}

  private val T0 = 1700000000000L // fixed epoch base
  private def ev(user: Long, offsetSec: Long, v: Double) =
    Event(user, new Timestamp(T0 + offsetSec * 1000), v)

  test("streaming gap sessionization: data-driven splits and watermark timeouts") {
    val src = Files.createTempDirectory("sess_src").toString
    val out = Files.createTempDirectory("sess_out").toString
    val ckpt = Files.createTempDirectory("sess_ckpt").toString
    val gapMs = 1800 * 1000L // 30 min, same as q12

    def runBatch(events: Seq[Event]): Unit = {
      spark.createDataset(events).write.mode("append").parquet(src)
      val stream = spark.readStream
        .schema(spark.createDataset(Seq.empty[Event]).schema).parquet(src)
        .as[Event]
      val q = Sessionize(stream, gapMs).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    def sessions(): Seq[Session] =
      spark.read.parquet(out).as[Session].collect().toSeq
        .sortBy(s => (s.user_id, s.start_ms))

    // batch 1: user 1 has two close events, user 2 one — all sessions open
    runBatch(Seq(ev(1, 0, 1.0), ev(1, 300, 2.0), ev(2, 60, 5.0)))
    assert(sessions().isEmpty)

    // batch 2: user 1 reappears past the gap -> session 1 closes by DATA;
    // the watermark also advances past user 2's timeout
    runBatch(Seq(ev(1, 7200, 4.0)))
    val afterB2 = sessions()
    assert(afterB2.contains(Session(1, T0, T0 + 300 * 1000, 2, 3.0)))

    // batch 3: far-future tick lets every pending TIMEOUT fire
    runBatch(Seq(ev(99, 100000, 0.0)))
    val afterB3 = sessions()
    assert(afterB3.contains(Session(2, T0 + 60 * 1000, T0 + 60 * 1000, 1, 5.0)))
    assert(afterB3.contains(Session(1, T0 + 7200 * 1000, T0 + 7200 * 1000, 1, 4.0)))
  }
}
