package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger

/** Streaming near-dup gate: a REWORDED (not identical) re-delivery is
  * rejected across the micro-batch boundary; stream == batch twin; and
  * in the exact regime the gate equals the batch LSH prune. */
class NearDupGateSpec extends SparkSpec {

  import spark.implicits._

  private val baseText =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from a warm windowsill and the rain taps the glass all afternoon"

  test("near-dup (not identical) re-delivery is rejected; novelty admitted") {
    val src = Files.createTempDirectory("ndg_src").toString
    val ckpt = Files.createTempDirectory("ndg_ckpt").toString

    val batch1 = Seq((1L, baseText),
      (2L, "completely different material about distributed query planning"))
      .toDF("doc_id", "text")
    // doc 3 rewords doc 1's tail — different fingerprint (exact dedup
    // would admit it), same leading shingles, so at least one band
    // signature collides with doc 1's bucket from the PREVIOUS batch
    val batch2 = Seq((3L, baseText.replace("all afternoon", "every evening")),
      (4L, "a fourth document with its own unrelated words entirely"))
      .toDF("doc_id", "text")
    assert(batch2.filter($"doc_id" === 3).select($"text").head.getString(0)
      != baseText, "fixture must NOT be an exact duplicate")

    batch1.write.mode("append").parquet(src)
    def run(name: String): Unit = {
      val stream = spark.readStream.schema(batch1.schema).parquet(src)
      val q = NearDupGate.gate(stream, "text", "doc_id")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run("ndg_1")
    val after1 = spark.table("ndg_1")
      .as[(Long, Boolean)].collect().toMap
    assert(after1 == Map(1L -> true, 2L -> true),
      s"first batch all-novel: $after1")

    batch2.write.mode("append").parquet(src)
    run("ndg_2")
    val after2 = spark.table("ndg_2")
      .as[(Long, Boolean)].collect().toMap
    assert(after2(3L) == false,
      s"the reworded re-delivery must be rejected across the batch boundary: $after2")
    assert(after2 == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true))

    // the batch twin on the unioned data agrees
    val viaBatch = NearDupGate.gate(batch1.unionByName(batch2), "text", "doc_id")
      .as[(Long, Boolean)].collect().toMap
    assert(viaBatch == after2, s"stream $after2 != batch $viaBatch")
  }

  test("bucketVerdicts + foreachBatch batch-local fold == gate (zero aggregation state)") {
    // the documented escape hatch for the per-doc aggregation state: all
    // of a document's bucket verdicts share its micro-batch, so a
    // batch-LOCAL groupBy inside foreachBatch reproduces gate()'s answer
    // with no second state store — across micro-batch boundaries too
    val src = Files.createTempDirectory("ndgv_src").toString
    val out = Files.createTempDirectory("ndgv_out").toString
    val ckpt = Files.createTempDirectory("ndgv_ckpt").toString
    val batch1 = Seq((1L, baseText),
      (2L, "completely different material about distributed query planning"))
      .toDF("doc_id", "text")
    val batch2 = Seq((3L, baseText.replace("all afternoon", "every evening")),
      (4L, "a fourth document with its own unrelated words entirely"))
      .toDF("doc_id", "text")

    def run(): Unit = {
      val stream = spark.readStream.schema(batch1.schema).parquet(src)
      val q = NearDupGate.bucketVerdicts(stream, "text", "doc_id")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          import org.apache.spark.sql.functions._
          df.groupBy(col("doc_id"))
            .agg((!max(col("collided"))).as("admitted"))
            .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    batch1.write.mode("append").parquet(src)
    run()
    batch2.write.mode("append").parquet(src)
    run()
    val got = spark.read.parquet(out).as[(Long, Boolean)].collect().toMap
    val viaGate = NearDupGate.gate(batch1.unionByName(batch2), "text", "doc_id")
      .as[(Long, Boolean)].collect().toMap
    assert(got == viaGate, s"foreachBatch fold $got != gate $viaGate")
    assert(got(3L) == false, "cross-batch rejection still works: bucket state is intact")
  }

  test("exact regime: gate admissions == batch LSH prune survivors") {
    // templated corpus: 3 copies x 10 templates + 10 unique docs. Exact
    // copies collide in EVERY band, so the single-pass gate and the
    // transitive-closure prune pick the same (min-id) survivors.
    // each template is its own disjoint token universe — no cross-
    // template shingles, so clusters are exactly the copy groups
    val tmpl = (0 until 10).map(t => (0 until 30).map(k => s"w${t}x$k").mkString(" "))
    val docs = (0 until 30).map(i => (i.toLong, tmpl(i % 10))) ++
      (100 until 110).map(i => (i.toLong, s"unique document number $i with own content"))
    val df = docs.toDF("doc_id", "text")
    val admitted = NearDupGate.gate(df, "text", "doc_id")
      .where($"admitted").select($"doc_id").as[Long].collect().toSet
    val pruned = graft.operators.Dedup.pruneNearDups(df, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted ==
      (0 until 10).map(_.toLong).toSet ++ (100 until 110).map(_.toLong).toSet)
    assert(pruned == admitted,
      s"exact-regime gate must equal the batch prune: $admitted vs $pruned")
  }

  test("recipe: gate verdicts join DocPrep output downstream, == batch composition") {
    // the documented lambda-free composition: DocPrep and the gate run
    // as SIBLING streaming queries over the same source, and their
    // outputs join on the id downstream — full prep + near-dup gating
    // without an unsupported stateful-over-stateful single query
    val src = Files.createTempDirectory("ndg_c_src").toString
    val prepOut = Files.createTempDirectory("ndg_c_prep").toString
    val ck1 = Files.createTempDirectory("ndg_c_ck1").toString
    val ck2 = Files.createTempDirectory("ndg_c_ck2").toString
    val ts = java.sql.Timestamp.valueOf("2026-03-01 12:00:00")

    val quality = baseText // long enough to clear the min-token gate
    val docs = Seq(
      (1L, quality, ts),                                    // admitted
      (2L, quality.replace("all afternoon", "each night"), ts), // near-dup of 1
      (3L, "short junk", ts),                               // fails quality
      (4L, quality.split(" ").reverse.mkString(" "), ts))   // novel, admitted
      .toDF("doc_id", "text", "ingest_ts")
    docs.write.mode("append").parquet(src)

    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q1 = DocPrep.prep(stream)
      .writeStream.format("parquet").option("path", prepOut)
      .option("checkpointLocation", ck1)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val q2 = NearDupGate.gate(spark.readStream.schema(docs.schema).parquet(src),
        "text", "doc_id")
      .writeStream.format("memory").queryName("ndg_verdicts")
      .outputMode("complete")
      .option("checkpointLocation", ck2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)
    q2.awaitTermination(120000)

    val composedStream = spark.read.parquet(prepOut)
      .join(spark.table("ndg_verdicts").where($"admitted"), Seq("doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    val composedBatch = DocPrep.prep(docs)
      .join(NearDupGate.gate(docs, "text", "doc_id").where($"admitted"),
        Seq("doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    assert(composedStream == composedBatch,
      s"stream recipe $composedStream != batch twin $composedBatch")
    assert(composedStream == Set(1L, 4L),
      s"near-dup 2 and junk 3 must both fall: $composedStream")
  }

  test("re-delivered ADMITTED id stays admitted (effectively-once composition)") {
    val df = Seq((1L, baseText), (1L, baseText)).toDF("doc_id", "text")
    val got = NearDupGate.gate(df, "text", "doc_id")
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true),
      "a doc colliding only with itself is not a duplicate")
  }

  private def ts(minutes: Long): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2026, 3, 1, 0, 0).plusMinutes(minutes))

  test("horizon batch twin: suppression inside ttl, re-seeding after it") {
    // same shape delivered at +0, +5, +20, +25 min under a 10-minute ttl:
    // 2 collides with 1 (gap 5); 3 arrives 15 min after the bucket's last
    // sighting -> island break, re-seeded, admitted; 4 collides with 3
    val df = Seq(
      (1L, baseText, ts(0)), (2L, baseText, ts(5)),
      (3L, baseText, ts(20)), (4L, baseText, ts(25)))
      .toDF("doc_id", "text", "event_ts")
    val got = NearDupGate.gate(df, "text", "doc_id",
        horizon = Some(Horizon("event_ts", "10 minutes")))
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false), got.toString)
  }

  test("horizon streaming == batch twin; expired bucket state is EVICTED") {
    val src = Files.createTempDirectory("ndg_ttl_src").toString
    val ckpt = Files.createTempDirectory("ndg_ttl_ckpt").toString
    val horizon = Some(Horizon("event_ts", "10 minutes"))

    // each text yields 4 band buckets; after the data batch, AvailableNow
    // runs a closing no-data batch with the ADVANCED watermark, so a
    // bucket whose expiry the new watermark passed is evicted within the
    // same run:
    //   b1: doc 1 (shape A) at  0 -> 4 state rows (expiry 10 > wm 0)
    //   b2: doc 2 (shape B) at 30 -> closing wm 30 > 10: doc 1 EVICTED -> 4
    //   b3: doc 3 (shape C) at 60 -> closing wm 60 > 40: doc 2 evicted -> 4
    //   b4: doc 4 (shape A) at 70 -> shape A long past its horizon ->
    //       RE-ADMITTED, re-seeds 4 rows; doc 3 (expiry 70 = wm) lives -> 8
    val b1 = Seq((1L, baseText, ts(0))).toDF("doc_id", "text", "event_ts")
    val b2 = Seq((2L, "completely different material about query planning", ts(30)))
      .toDF("doc_id", "text", "event_ts")
    val b3 = Seq((3L, "a third unrelated document with its own words", ts(60)))
      .toDF("doc_id", "text", "event_ts")
    val b4 = Seq((4L, baseText, ts(70))).toDF("doc_id", "text", "event_ts")

    // the horizon gate's streaming form is bucketVerdicts + the
    // documented zero-state foreachBatch fold (gate() itself points
    // there: Spark rejects a streaming agg above an event-time-timeout
    // stateful operator)
    val out = Files.createTempDirectory("ndg_ttl_out").toString
    var lastState = -1L
    def run(): Unit = {
      val stream = spark.readStream.schema(b1.schema).parquet(src)
      val q = NearDupGate.bucketVerdicts(stream, "text", "doc_id",
          horizon = horizon)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          import org.apache.spark.sql.functions._
          df.groupBy(col("doc_id"))
            .agg((!max(col("collided"))).as("admitted"))
            .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // the gate (the flatMapGroupsWithState op) reports its kept rows
      Option(q.lastProgress).foreach { p =>
        p.stateOperators.find(_.operatorName.contains("flatMapGroupsWithState"))
          .foreach(s => lastState = s.numRowsTotal)
      }
    }
    b1.write.mode("append").parquet(src); run()
    val afterSeed = lastState
    assert(afterSeed == 4, s"doc 1 must occupy its 4 band buckets: $afterSeed")
    b2.write.mode("append").parquet(src); run()
    assert(lastState == 4,
      s"doc 1's expired buckets must be EVICTED, not retained: $lastState")
    b3.write.mode("append").parquet(src); run()
    assert(lastState == 4, s"doc 2 evicted in turn: $lastState")
    b4.write.mode("append").parquet(src); run()
    assert(lastState == 8,
      s"shape A re-seeded, doc 3 still live — live shapes only: $lastState")

    val got = spark.read.parquet(out).as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true, 4L -> true),
      s"the re-delivery of an EXPIRED shape must be re-admitted: $got")
    // batch twin on the union agrees
    val viaBatch = NearDupGate.gate(
        b1.unionByName(b2).unionByName(b3).unionByName(b4),
        "text", "doc_id", horizon = horizon)
      .as[(Long, Boolean)].collect().toMap
    assert(viaBatch == got, s"stream $got != batch $viaBatch")
  }

  test("horizon streaming: inside-ttl near-dup still rejected across batches") {
    val src = Files.createTempDirectory("ndg_ttl2_src").toString
    val out = Files.createTempDirectory("ndg_ttl2_out").toString
    val ckpt = Files.createTempDirectory("ndg_ttl2_ckpt").toString
    val b1 = Seq((1L, baseText, ts(0))).toDF("doc_id", "text", "event_ts")
    val b2 = Seq((2L, baseText.replace("all afternoon", "every evening"), ts(5)))
      .toDF("doc_id", "text", "event_ts")
    def run(): Unit = {
      val stream = spark.readStream.schema(b1.schema).parquet(src)
      val q = NearDupGate.bucketVerdicts(stream, "text", "doc_id",
          horizon = Some(Horizon("event_ts", "10 minutes")))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          import org.apache.spark.sql.functions._
          df.groupBy(col("doc_id"))
            .agg((!max(col("collided"))).as("admitted"))
            .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    b1.write.mode("append").parquet(src); run()
    b2.write.mode("append").parquet(src); run()
    val got = spark.read.parquet(out).as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false),
      s"a reworded re-delivery INSIDE the horizon must still fall: $got")
  }

  test("horizon gate over a stream points at the foreachBatch recipe") {
    val src = Files.createTempDirectory("ndg_ttl3_src").toString
    Seq((1L, baseText, ts(0))).toDF("doc_id", "text", "event_ts")
      .write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema(Seq((1L, baseText, ts(0))).toDF("doc_id", "text", "event_ts").schema)
      .parquet(src)
    val e = intercept[IllegalArgumentException] {
      NearDupGate.gate(stream, "text", "doc_id",
        horizon = Some(Horizon("event_ts", "10 minutes")))
    }
    assert(e.getMessage.contains("foreachBatch"), e.getMessage)
  }
}
