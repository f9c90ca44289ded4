package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** Streaming winnow gate: span-granular overlap detection with a
  * seeded fingerprint store; batch == stream differential against the
  * Winnow.fingerprints + store-probe composition (the q167 math). */
class WinnowGateSpec extends SparkSpec {

  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from a warm windowsill and the rain taps the glass all afternoon"

  test("edited-tail re-delivery is caught by its unchanged interior (span signal)") {
    // doc 2 keeps doc 1's interior but rewrites the tail: exact dedup
    // admits it; the shared >= w+k-1-token run must share a fingerprint
    val docs = Seq(
      (1L, base),
      (2L, base.replace("all afternoon", "every single evening")),
      (3L, "completely unrelated words about distributed query planning " +
        "optimizers and shuffle exchange reuse in execution engines"))
      .toDF("doc_id", "text")
    val got = WinnowGate.gate(docs, "text", "doc_id", maxDupFrac = 0.5)
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true), got.toString)
  }

  test("store-seeded gate == Winnow.fingerprints + store probe (q167 math)") {
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val store = graft.operators.Winnow
      .fingerprints(corpus, "text", "doc_id").select($"fp").distinct()
    val batch = Seq(
      (1L, base), // full re-crawl of stored content
      (2L, "novel text with entirely fresh words never fingerprinted " +
        "before in any snapshot of this corpus whatsoever"))
      .toDF("doc_id", "text")
    val got = WinnowGate.gate(batch, "text", "doc_id", seed = Some(store))
      .select($"doc_id", $"n_fps", $"n_dup").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // independent probe: count each batch doc's fps present in the store
    val probe = graft.operators.Winnow.fingerprints(batch, "text", "doc_id")
      .join(store.withColumn("__hit", lit(1)), Seq("fp"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), count($"__hit").as("h"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == probe, s"gate $got != probe $probe")
    assert(got(1L)._1 == got(1L)._2, "a stored doc re-crawled hits every fp")
    assert(got(2L)._2 == 0L, "novel text hits nothing")
  }

  test("streaming == batch twin; seeded state claims across micro-batches") {
    val src = Files.createTempDirectory("wg_src").toString
    val ckpt = Files.createTempDirectory("wg_ckpt").toString
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val store = graft.operators.Winnow
      .fingerprints(corpus, "text", "doc_id").select($"fp").distinct()

    val t2 = "some novel first-batch material with its own distinct phrasing " +
      "about columnar storage layouts and page level statistics"
    val b1 = Seq((1L, base), (2L, t2)).toDF("doc_id", "text")
    // doc 3 tail-edits doc 2 (cross-batch stream claim, not store-
    // seeded): its unchanged interior is a >= w+k-1 run, so under a
    // zero-tolerance gate the shared-fingerprint guarantee rejects it
    // deterministically; doc 4 is novel
    val b2 = Seq(
      (3L, t2.replace("page level statistics", "an entirely fresh tail")),
      (4L, "yet another disjoint vocabulary covering watermark semantics " +
        "and state compaction cadence in streaming runtimes"))
      .toDF("doc_id", "text")

    def run(name: String): Unit = {
      val stream = spark.readStream.schema(b1.schema).parquet(src)
      val q = WinnowGate.gate(stream, "text", "doc_id", seed = Some(store),
          maxDupFrac = 0.0)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    b1.write.mode("append").parquet(src)
    run("wg_1")
    val after1 = spark.table("wg_1")
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    assert(after1 == Map(1L -> false, 2L -> true),
      s"stored shape rejected, novelty admitted: $after1")

    b2.write.mode("append").parquet(src)
    run("wg_2")
    val after2 = spark.table("wg_2")
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    assert(after2(3L) == false,
      s"doc 2's claims must hold across the batch boundary: $after2")
    assert(after2 == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))

    // batch twin over the union agrees row for row
    val viaBatch = WinnowGate.gate(b1.unionByName(b2), "text", "doc_id",
        seed = Some(store), maxDupFrac = 0.0)
      .select($"doc_id", $"n_fps", $"n_dup", $"admitted")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val viaStream = spark.table("wg_2")
      .select($"doc_id", $"n_fps", $"n_dup", $"admitted")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(viaBatch == viaStream, s"stream $viaStream != batch $viaBatch")
  }

  test("fpVerdicts + foreachBatch batch-local fold == gate (zero aggregation state)") {
    val src = Files.createTempDirectory("wgv_src").toString
    val out = Files.createTempDirectory("wgv_out").toString
    val ckpt = Files.createTempDirectory("wgv_ckpt").toString
    val b1 = Seq((1L, base)).toDF("doc_id", "text")
    val b2 = Seq((2L, base.replace("all afternoon", "every evening")))
      .toDF("doc_id", "text")
    def run(): Unit = {
      val stream = spark.readStream.schema(b1.schema).parquet(src)
      val q = WinnowGate.fpVerdicts(stream, "text", "doc_id")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_fps"),
              sum(when(col("collided"), 1L).otherwise(0L)).as("n_dup"))
            .withColumn("admitted",
              col("n_dup").cast("double") / col("n_fps") <= 0.5)
            .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    b1.write.mode("append").parquet(src); run()
    b2.write.mode("append").parquet(src); run()
    val got = spark.read.parquet(out)
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    val viaGate = WinnowGate.gate(b1.unionByName(b2), "text", "doc_id")
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    assert(got == viaGate, s"foreachBatch fold $got != gate $viaGate")
    assert(got(2L) == false, "cross-batch span claim held without the agg store")
  }

  private def ts(minutes: Long): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2026, 3, 1, 0, 0).plusMinutes(minutes))

  test("horizon batch twin: fp suppression inside ttl, re-seeding after it") {
    // the same page delivered at +0, +5, +20 under a 10-minute ttl: doc 2
    // collides fp-for-fp with doc 1 (gap 5, refreshes expiry); doc 3
    // arrives 15 min after the last sighting -> islands split, doc 3
    // re-seeds every fp and is admitted
    val df = Seq((1L, base, ts(0)), (2L, base, ts(5)), (3L, base, ts(20)))
      .toDF("doc_id", "text", "event_ts")
    val got = WinnowGate.gate(df, "text", "doc_id",
        horizon = Some(Horizon("event_ts", "10 minutes")))
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true), got.toString)
  }

  test("horizon streaming == batch twin across micro-batches; state evicted") {
    val src = Files.createTempDirectory("wgt_src").toString
    val out = Files.createTempDirectory("wgt_out").toString
    val ckpt = Files.createTempDirectory("wgt_ckpt").toString
    val horizon = Some(Horizon("event_ts", "10 minutes"))
    val b1 = Seq((1L, base, ts(0))).toDF("doc_id", "text", "event_ts")
    val b2 = Seq((2L, base.replace("all afternoon", "every evening"), ts(5)))
      .toDF("doc_id", "text", "event_ts") // inside ttl: interior fps collide
    val b3 = Seq((3L, base, ts(40))).toDF("doc_id", "text", "event_ts")
    // past ttl: the shape re-admits

    var lastState = -1L
    def run(): Unit = {
      val stream = spark.readStream.schema(b1.schema).parquet(src)
      val q = WinnowGate.fpVerdicts(stream, "text", "doc_id", horizon = horizon)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_fps"),
              sum(when(col("collided"), 1L).otherwise(0L)).as("n_dup"))
            .withColumn("admitted",
              col("n_dup").cast("double") / col("n_fps") <= 0.5)
            .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      Option(q.lastProgress).foreach { p =>
        p.stateOperators.find(_.operatorName.contains("flatMapGroupsWithState"))
          .foreach(s => lastState = s.numRowsTotal)
      }
    }
    b1.write.mode("append").parquet(src); run()
    val fpsPerDoc = lastState
    assert(fpsPerDoc > 0, "doc 1 must claim its fingerprints")
    b2.write.mode("append").parquet(src); run()
    b3.write.mode("append").parquet(src); run()
    assert(lastState <= fpsPerDoc + 2,
      s"expired fp state must be EVICTED, not accumulated: $lastState vs $fpsPerDoc")

    val got = spark.read.parquet(out)
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    assert(got(1L) == true && got(2L) == false && got(3L) == true,
      s"inside-ttl rejected, past-ttl re-admitted: $got")
    // batch twin agrees
    val viaBatch = WinnowGate.gate(
        b1.unionByName(b2).unionByName(b3), "text", "doc_id",
        horizon = Some(Horizon("event_ts", "10 minutes")))
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    assert(viaBatch == got, s"stream $got != batch $viaBatch")
  }

  test("horizon guards: seed is mutually exclusive; streaming gate points at foreachBatch") {
    val df = Seq((1L, base, ts(0))).toDF("doc_id", "text", "event_ts")
    intercept[IllegalArgumentException] {
      WinnowGate.fpVerdicts(df, "text", "doc_id",
        seed = Some(df.select($"text".as("fp"))),
        horizon = Some(Horizon("event_ts", "10 minutes")))
    }
    val src = Files.createTempDirectory("wgt_g_src").toString
    df.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(df.schema).parquet(src)
    val e = intercept[IllegalArgumentException] {
      WinnowGate.gate(stream, "text", "doc_id",
        horizon = Some(Horizon("event_ts", "10 minutes")))
    }
    assert(e.getMessage.contains("foreachBatch"), e.getMessage)
  }

  test("no verdict for sub-window docs; self re-delivery keeps its own claims") {
    val docs = Seq((1L, "too short"), (2L, base), (2L, base))
      .toDF("doc_id", "text")
    val got = WinnowGate.gate(docs, "text", "doc_id")
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    assert(got == Map(2L -> true),
      s"short doc silent, self-redelivery not a collision: $got")
  }
}
