package graft.streaming

import graft.SparkSpec
import graft.operators.SemDedup
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantic gate: a paraphrase RE-ENCODING (same embedding
  * neighborhood, different id) is rejected across micro-batch
  * boundaries; stream == batch twin; and in the exact (mutually-within-
  * tau blob) regime the store-seeded gate equals the batch incremental
  * SemDeDup. */
class SemGateSpec extends SparkSpec {

  import spark.implicits._

  private val centroids = Seq(
    (100L, Seq(1f, 0f, 0f, 0f)),
    (200L, Seq(0f, 1f, 0f, 0f))
  ).toDF("c_id", "embedding")

  test("paraphrase re-encoding rejected across micro-batches; novelty admitted") {
    val src = Files.createTempDirectory("sg_src").toString
    val ckpt = Files.createTempDirectory("sg_ckpt").toString
    val batch1 = Seq(
      (1L, Seq(1f, 0.1f, 0f, 0f)),    // cluster 100, novel
      (2L, Seq(0.1f, 1f, 0f, 0f)))    // cluster 200, novel
      .toDF("vec_id", "embedding")
    // 3 re-encodes doc 1 (cos ~ 0.9999 — a paraphrase whose EXACT and
    // SHAPE fingerprints are all new); 4 is a genuinely new direction
    val batch2 = Seq(
      (3L, Seq(1f, 0.11f, 0f, 0f)),
      (4L, Seq(0.9f, -0.4f, 0f, 0f)))
      .toDF("vec_id", "embedding")

    val out = Files.createTempDirectory("sg_out").toString
    batch1.write.mode("append").parquet(src)
    // a restartable append sink (memory + append cannot recover from a
    // checkpoint): verdicts accumulate in a parquet dir across runs
    def run(): Unit = {
      val stream = spark.readStream.schema(batch1.schema).parquet(src)
      val q = SemGate.gate(stream, centroids, "vec_id", "embedding", "c_id",
          tau = 0.98)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    val after1 = spark.read.parquet(out).as[(Long, Boolean)].collect().toMap
    assert(after1 == Map(1L -> true, 2L -> true), s"first batch all-novel: $after1")

    batch2.write.mode("append").parquet(src)
    run()
    val after2 = spark.read.parquet(out).as[(Long, Boolean)].collect().toMap
    assert(after2(3L) == false,
      s"the re-encoded paraphrase must be rejected across the batch boundary: $after2")
    assert(after2 == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true))

    // the batch twin on the unioned data agrees
    val viaBatch = SemGate.gate(batch1.unionByName(batch2), centroids,
        "vec_id", "embedding", "c_id", tau = 0.98)
      .as[(Long, Boolean)].collect().toMap
    assert(viaBatch == after2, s"stream $after2 != batch $viaBatch")
  }

  test("store-seeded stream rejects corpus paraphrases from the first micro-batch") {
    val src = Files.createTempDirectory("sgs_src").toString
    val ckpt = Files.createTempDirectory("sgs_ckpt").toString
    val corpus = Seq(
      (1L, Seq(1f, 0.1f, 0f, 0f)),
      (4L, Seq(0.1f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    SemDedup.writeSemanticStore(corpus, centroids, "vec_id", "embedding",
      "c_id", "sem_gate_seed", buckets = 2)
    try {
      val batch = Seq(
        (10L, Seq(1f, 0.11f, 0f, 0f)),  // re-encodes corpus 1 -> reject
        (11L, Seq(0.9f, -0.4f, 0f, 0f)), // novel direction -> admit
        (13L, Seq(-0.2f, 1f, 0f, 0f)))   // novel in cluster 200 -> admit
        .toDF("vec_id", "embedding")
      batch.write.mode("append").parquet(src)
      val stream = spark.readStream.schema(batch.schema).parquet(src)
      val store = SemDedup.openSemanticStore(spark, "sem_gate_seed",
        centroids, "c_id", "embedding")
      val q = SemGate.gate(stream, centroids, "vec_id", "embedding", "c_id",
          tau = 0.98, store = Some(store))
        .writeStream.format("memory").queryName("sgs_1")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val got = spark.table("sgs_1").as[(Long, Boolean)].collect().toMap
      assert(got == Map(10L -> false, 11L -> true, 13L -> true), s"got $got")

      // exact-regime differential: the batch incremental SemDeDup agrees
      val viaBatchOp = SemDedup.againstCorpus(batch, store, centroids,
          "vec_id", "embedding", "c_id", tau = 0.98)
        .select($"vec_id").as[Long].collect().toSet
      assert(viaBatchOp == got.filter(_._2).keySet,
        s"gate admissions must match againstCorpus in the exact regime")
      // ... and the seeded batch-mode gate matches the stream verbatim
      val viaBatchGate = SemGate.gate(batch, centroids, "vec_id",
          "embedding", "c_id", tau = 0.98, store = Some(store))
        .as[(Long, Boolean)].collect().toMap
      assert(viaBatchGate == got)
    } finally spark.sql("DROP TABLE IF EXISTS sem_gate_seed")
  }

  test("dimension-mismatched store vector: gate == batch on bad data") {
    // a malformed 3-dim vector in the store shares its prefix with the
    // incoming 4-dim doc. Both paths share VecDot's ragged contract —
    // dot over the min length, norms over each full length — so both
    // score the deflated prefix-cosine (~0.99997 here) and both reject.
    // The pin is the PARITY, not the score: a gate that diverged from
    // the batch operators on malformed data would break the documented
    // stream == batch guarantee.
    val store = Seq((100, 1L, Seq(1.0, 0.1, 0.0)))
      .toDF("cluster", "vec_id", "embedding")
    val batch = Seq((10L, Seq(1f, 0.11f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val viaGate = SemGate.gate(batch, centroids, "vec_id", "embedding",
        "c_id", tau = 0.98, store = Some(store))
      .as[(Long, Boolean)].collect().toMap
    val viaBatchOp = SemDedup.againstCorpus(batch, store, centroids,
        "vec_id", "embedding", "c_id", tau = 0.98)
      .select($"vec_id").as[Long].collect().toSet
    assert(viaGate.filter(_._2).keySet == viaBatchOp,
      s"gate $viaGate must match batch $viaBatchOp on ragged data")
    assert(viaGate == Map(10L -> false),
      s"prefix-cosine ~1.0 rejects under the shared contract: $viaGate")
  }

  test("recipe: three-modality streaming ingest — exact || shape || meaning gates join downstream") {
    // the full streaming curation recipe: the exact/near-dup gates (text)
    // and the semantic gate (embedding) run as SIBLING queries over the
    // same multimodal source, verdicts join on the id downstream — a doc
    // ships iff every modality admits it. Fixture: 2 is a reworded
    // re-crawl of 1 (caught by SHAPE), 3 is a paraphrase re-encoding of 1
    // (new words AND new shapes — only MEANING catches it), 4 is novel.
    val base = "the quick brown fox jumps over the lazy dog while the cat " +
      "watches from a warm windowsill and the rain taps the glass"
    val docs = Seq(
      (1L, base, Seq(1f, 0.1f, 0f, 0f)),
      (2L, base.replace("the glass", "the pane"), Seq(0.8f, 0.55f, 0f, 0f)),
      (3L, "an entirely reworded account of that same fox and dog scene",
        Seq(1f, 0.11f, 0f, 0f)),
      (4L, "completely unrelated material about distributed query planning",
        Seq(0.1f, 1f, 0f, 0f)))
      .toDF("doc_id", "text", "embedding")
    val src = Files.createTempDirectory("tri_src").toString
    val ck1 = Files.createTempDirectory("tri_ck1").toString
    val ck2 = Files.createTempDirectory("tri_ck2").toString
    docs.write.mode("append").parquet(src)

    def stream = spark.readStream.schema(docs.schema).parquet(src)
    val q1 = NearDupGate.gate(stream, "text", "doc_id")
      .writeStream.format("memory").queryName("tri_shape")
      .outputMode("complete")
      .option("checkpointLocation", ck1)
      .trigger(Trigger.AvailableNow()).start()
    val q2 = SemGate.gate(stream, centroids, "doc_id", "embedding", "c_id",
        tau = 0.98)
      .writeStream.format("memory").queryName("tri_meaning")
      .outputMode("append")
      .option("checkpointLocation", ck2)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)
    q2.awaitTermination(120000)

    val shipped = spark.table("tri_shape").where($"admitted")
      .join(spark.table("tri_meaning").where($"admitted"), Seq("doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    assert(shipped == Set(1L, 4L),
      s"2 falls to the shape gate, 3 to the meaning gate: $shipped")
    // batch twin of the same composition
    val viaBatch = NearDupGate.gate(docs, "text", "doc_id").where($"admitted")
      .join(SemGate.gate(docs, centroids, "doc_id", "embedding", "c_id",
        tau = 0.98).where($"admitted"), Seq("doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    assert(viaBatch == shipped, s"stream $shipped != batch $viaBatch")
  }

  test("re-delivered admitted id stays admitted; in-batch twins fold in id order") {
    val docs = Seq(
      (5L, Seq(1f, 0.1f, 0f, 0f)),   // admitted (first in id order)
      (6L, Seq(1f, 0.11f, 0f, 0f)),  // twin of 5 -> rejected
      (5L, Seq(1f, 0.1f, 0f, 0f)),   // re-delivery of an admitted id
      (7L, Seq(0.9f, -0.4f, 0f, 0f))) // novel -> admitted
      .toDF("vec_id", "embedding")
    val got = SemGate.gate(docs, centroids, "vec_id", "embedding", "c_id",
        tau = 0.98)
      .as[(Long, Boolean)].collect()
    assert(got.count(_._1 == 5L) == 2 && got.filter(_._1 == 5L).forall(_._2),
      "re-delivery of an admitted id is admitted again")
    val byId = got.toMap
    assert(byId(6L) == false && byId(7L) == true)
  }

  private def ts(minutes: Long): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2026, 3, 1, 0, 0).plusMinutes(minutes))

  test("horizon batch twin: suppression inside ttl, re-admission after it") {
    // one semantic neighborhood delivered at +0, +5, +20, +25 min under a
    // 10-minute ttl: 2 falls to 1 (gap 5, refreshes to +5); 3 arrives
    // 15 min after the last sighting -> entry expired, re-admitted;
    // 4 falls to 3
    val docs = Seq(
      (1L, Seq(1f, 0.10f, 0f, 0f), ts(0)),
      (2L, Seq(1f, 0.11f, 0f, 0f), ts(5)),
      (3L, Seq(1f, 0.12f, 0f, 0f), ts(20)),
      (4L, Seq(1f, 0.13f, 0f, 0f), ts(25)))
      .toDF("vec_id", "embedding", "event_ts")
    val got = SemGate.gate(docs, centroids, "vec_id", "embedding", "c_id",
        tau = 0.98, horizon = Some(Horizon("event_ts", "10 minutes")))
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false), got.toString)
  }

  test("horizon streaming == batch twin; idle cluster state is EVICTED") {
    val src = Files.createTempDirectory("sg_ttl_src").toString
    val out = Files.createTempDirectory("sg_ttl_out").toString
    val ckpt = Files.createTempDirectory("sg_ttl_ckpt").toString
    val horizon = Some(Horizon("event_ts", "10 minutes"))
    // b1: doc 1 (cluster 100) at  0 -> 1 state group
    // b2: doc 2 (cluster 200) at 30 -> closing watermark 30 passes
    //     cluster 100's expiry (10): its state group is REMOVED -> 1
    // b3: doc 3 re-encodes doc 1 at 70 -> the gate has forgotten it ->
    //     ADMITTED; closing wm 70 evicts cluster 200 (expiry 40) -> 1
    val b1 = Seq((1L, Seq(1f, 0.10f, 0f, 0f), ts(0)))
      .toDF("vec_id", "embedding", "event_ts")
    val b2 = Seq((2L, Seq(0.1f, 1f, 0f, 0f), ts(30)))
      .toDF("vec_id", "embedding", "event_ts")
    val b3 = Seq((3L, Seq(1f, 0.11f, 0f, 0f), ts(70)))
      .toDF("vec_id", "embedding", "event_ts")

    var lastState = -1L
    def run(): Unit = {
      val stream = spark.readStream.schema(b1.schema).parquet(src)
      val q = SemGate.gate(stream, centroids, "vec_id", "embedding", "c_id",
          tau = 0.98, horizon = horizon)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      Option(q.lastProgress).foreach { p =>
        p.stateOperators.find(_.operatorName.contains("flatMapGroupsWithState"))
          .foreach(s => lastState = s.numRowsTotal)
      }
    }
    b1.write.mode("append").parquet(src); run()
    assert(lastState == 1, s"cluster 100 must hold state: $lastState")
    b2.write.mode("append").parquet(src); run()
    assert(lastState == 1,
      s"cluster 100's expired state must be EVICTED, not retained: $lastState")
    b3.write.mode("append").parquet(src); run()
    assert(lastState == 1, s"cluster 200 evicted in turn: $lastState")

    val got = spark.read.parquet(out).as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true),
      s"a re-encoding of an EXPIRED neighborhood must be re-admitted: $got")
    val viaBatch = SemGate.gate(b1.unionByName(b2).unionByName(b3), centroids,
        "vec_id", "embedding", "c_id", tau = 0.98, horizon = horizon)
      .as[(Long, Boolean)].collect().toMap
    assert(viaBatch == got, s"stream $got != batch $viaBatch")
  }

  test("horizon fold compaction == naive per-row expiry sweep (randomized)") {
    // the fold tracks the minimum live expiry and compacts only when a
    // row crosses it (one filtered pass) instead of sweeping every entry
    // per row; this differential pins it against the obviously-correct
    // model: sort by (ts, id), drop every entry with lastSeen + ttl < ts
    // before each row, then identity-check / cosine-scan the survivors
    val rnd = new scala.util.Random(20260813L)
    val ttlMin = 10L
    def naive(rows: Seq[(Long, Array[Double], Long)]): Map[Long, Boolean] = {
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      val embs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val out = scala.collection.mutable.Map.empty[Long, Boolean]
      rows.sortBy(r => (r._3, r._1)).foreach { case (id, e, ts) =>
        var i = seen.length - 1
        while (i >= 0) {
          if (seen(i) + ttlMin * 60000L < ts) { ids.remove(i); embs.remove(i); seen.remove(i) }
          i -= 1
        }
        val idx = ids.indexOf(id)
        if (idx >= 0) { seen(idx) = math.max(seen(idx), ts); out(id) = true }
        else {
          var hit = false; var j = 0
          while (j < embs.length) {
            if (cos(embs(j), e) >= 0.98) { hit = true; seen(j) = math.max(seen(j), ts) }
            j += 1
          }
          if (hit) out(id) = false
          else { ids += id; embs += e; seen += ts; out(id) = true }
        }
      }
      out.toMap
    }
    // 60 rows, one cluster, vectors drawn from 3 tight neighborhoods so
    // suppression/refresh/expiry all fire; timestamps span 8 ttl windows
    val dirs = Seq(Seq(1.0, 0.1, 0.0, 0.0), Seq(1.0, -0.1, 0.0, 0.0),
      Seq(0.95, 0.0, 0.1, 0.0))
    val rows = (1L to 60L).map { id =>
      val d = dirs(rnd.nextInt(dirs.length))
      val e = d.map(_ + rnd.nextGaussian() * 0.005).toArray
      (id, e, rnd.nextLong(8 * ttlMin * 60000L))
    }
    val docs = rows.map { case (id, e, ms) =>
      (id, e.toSeq, new java.sql.Timestamp(ts(0).getTime + ms)) }
      .toDF("vec_id", "embedding", "event_ts")
    val got = SemGate.gate(docs, centroids, "vec_id", "embedding", "c_id",
        tau = 0.98, horizon = Some(Horizon("event_ts", s"$ttlMin minutes")))
      .as[(Long, Boolean)].collect().toMap
    val want = naive(rows.map { case (id, e, ms) => (id, e, ts(0).getTime + ms) })
    assert(got == want, s"compacted fold diverged from naive sweep:\n" +
      s"only-in-got=${got.toSet -- want.toSet} only-in-want=${want.toSet -- got.toSet}")
  }

  test("horizon: seeded store vectors are Permanent — they never expire") {
    // the persisted corpus doesn't age out of the gate: a re-encoding of
    // a corpus vector is rejected even arriving far past the ttl; the
    // genuinely-new direction is admitted
    val store = Seq((100, 1L, Seq(1.0, 0.1, 0.0, 0.0)))
      .toDF("cluster", "vec_id", "embedding")
    val batch = Seq(
      (10L, Seq(1f, 0.11f, 0f, 0f), ts(100000)),  // corpus re-encoding
      (11L, Seq(0.9f, -0.4f, 0f, 0f), ts(100000))) // novel
      .toDF("vec_id", "embedding", "event_ts")
    val got = SemGate.gate(batch, centroids, "vec_id", "embedding", "c_id",
        tau = 0.98, store = Some(store),
        horizon = Some(Horizon("event_ts", "10 minutes")))
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(10L -> false, 11L -> true),
      s"seeded vectors must keep suppressing past any ttl: $got")
  }
}
