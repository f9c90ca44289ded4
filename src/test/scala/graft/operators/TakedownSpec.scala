package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Takedown propagation: tombstone retract / live view / physical purge
  * cycle, idempotence, the exchange-free live-probe plan, the
  * fingerprint still-claimed rule, and the fail-fast matrix. */
class TakedownSpec extends SparkSpec {

  import spark.implicits._

  private def freshFpStore(name: String, buckets: Int = 4): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(name)}`")
    val d = Tables.load(spark, sf(), "documents").select($"doc_id", $"text")
    Dedup.writeFingerprintStore(d, "text", name, buckets)
  }

  test("retract hides keys from live() only; purge makes it physical, " +
      "drops the tombstones, and the next retraction starts clean") {
    val t = "tk_cycle"
    freshFpStore(t)
    try {
      val all = spark.table(t).as[String].collect().toSet
      val victims = all.toSeq.sorted.take(5).toSet
      Takedown.retract(spark, t, victims.toSeq.toDF("fp"))
      // merge-on-read: the table still holds the rows, live() does not
      assert(spark.table(t).as[String].collect().toSet === all)
      assert(Takedown.live(spark, t).as[String].collect().toSet ===
        all -- victims)
      Takedown.purge(spark, t)
      assert(spark.table(t).as[String].collect().toSet === all -- victims)
      assert(!spark.catalog.tableExists(Takedown.tombstoneTable(t)),
        "purge must drop the tombstone table")
      // live() over a purged store is the table itself
      assert(Takedown.live(spark, t).as[String].collect().toSet ===
        all -- victims)
      // a fresh retraction after purge starts a new tombstone table
      val more = (all -- victims).toSeq.sorted.take(2).toSet
      Takedown.retract(spark, t, more.toSeq.toDF("fp"))
      assert(Takedown.live(spark, t).as[String].collect().toSet ===
        all -- victims -- more)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    }
  }

  test("retract is idempotent: re-delivering the same takedown appends " +
      "nothing; purge with no tombstones is a no-op") {
    val t = "tk_idem"
    freshFpStore(t)
    try {
      val before = spark.table(t).as[String].collect().toSet
      // no tombstones: purge must leave the table untouched
      Takedown.purge(spark, t)
      assert(spark.table(t).as[String].collect().toSet === before)
      val victims = before.toSeq.sorted.take(3).toDF("fp")
      Takedown.retract(spark, t, victims)
      Takedown.retract(spark, t, victims) // crash-retry re-delivery
      assert(spark.table(Takedown.tombstoneTable(t)).count() === 3,
        "re-retracting the same keys must not duplicate tombstones")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    }
  }

  test("live() never shuffles: the anti-join rides the co-bucketed " +
      "layout on both sides") {
    val t = "tk_plan"
    freshFpStore(t)
    try {
      val victims = spark.table(t).as[String].collect().toSeq.sorted
        .take(4).toDF("fp")
      Takedown.retract(spark, t, victims)
      val lv = Takedown.live(spark, t)
      lv.collect() // materialize AQE stages before walking the plan
      val shuffles = collectPlan(lv.queryExecution.executedPlan) {
        case e: ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty,
        s"live() must not shuffle either store side: $shuffles")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    }
  }

  test("retractFingerprints: a fingerprint still claimed by a surviving " +
      "duplicate STAYS; an unclaimed one goes") {
    val t = "tk_claimed"
    spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    val corpus = Seq(
      (1L, "shared text body"), // taken down, but id 3 has the same text
      (2L, "unique doomed text"), // taken down, no surviving claim
      (3L, "shared text body"),
      (4L, "innocent bystander")).toDF("doc_id", "text")
    Dedup.writeFingerprintStore(corpus, "text", t, buckets = 2)
    try {
      Takedown.retractFingerprints(spark, t,
        takedown = corpus.filter($"doc_id" <= 2), textCol = "text",
        surviving = corpus.filter($"doc_id" >= 3),
        survivingTextCol = "text")
      val expected = corpus.filter($"doc_id" >= 3)
        .select(graft.functions.Text.fingerprint($"text").as("fp"))
        .distinct().as[String].collect().toSet
      assert(Takedown.live(spark, t).as[String].collect().toSet === expected,
        "the shared fp must survive, the doomed one must not")
      Takedown.purge(spark, t)
      assert(spark.table(t).as[String].collect().toSet === expected)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    }
  }

  test("knn-store takedown: node rows AND reverse-neighbor references " +
      "go; geometry stamp survives the purge; appends still replay it") {
    val t = "tk_knn"
    Seq(Similarity.knnVectorsTable(t), Similarity.knnEdgesTable(t))
      .foreach { x =>
        spark.sql(s"DROP TABLE IF EXISTS `$x`")
        spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(x)}`")
      }
    val emb = Tables.load(spark, sf(), "embeddings")
    Similarity.writeKnnStore(emb.filter($"vec_id" % 4 =!= 0), "vec_id",
      "embedding", t, k = 5)
    try {
      val victims = Seq(1L, 5L, 9L).toDF("vec_id")
      Takedown.retractFromKnnStore(spark, t, victims)
      val lv = Takedown.liveKnnEdges(spark, t)
      assert(lv.filter($"q_id".isin(1L, 5L, 9L)).isEmpty,
        "forgotten nodes must stop querying")
      assert(lv.filter($"vec_id".isin(1L, 5L, 9L)).isEmpty,
        "forgotten nodes must stop being served as neighbors")
      assert(Takedown.live(spark, Similarity.knnVectorsTable(t))
        .filter($"vec_id".isin(1L, 5L, 9L)).isEmpty)
      Takedown.purgeKnnStore(spark, t)
      val et = spark.table(Similarity.knnEdgesTable(t))
      assert(et.filter($"q_id".isin(1L, 5L, 9L) ||
        $"vec_id".isin(1L, 5L, 9L)).isEmpty, "purge must be physical")
      Seq(Similarity.knnVectorsTable(t), Similarity.knnEdgesTable(t))
        .foreach(x => assert(
          !spark.catalog.tableExists(Takedown.tombstoneTable(x))))
      // the geometry stamp rode through the staged rewrites: an append
      // must still open the store and replay the stamped geometry
      Similarity.appendToKnnStore(emb.filter($"vec_id" % 4 === 0),
        "vec_id", "embedding", t)
      assert(spark.table(Similarity.knnVectorsTable(t)).count() ===
        emb.filter($"vec_id" % 4 =!= 0).count() - 3 +
          emb.filter($"vec_id" % 4 === 0).count())
    } finally Seq(Similarity.knnVectorsTable(t), Similarity.knnEdgesTable(t))
      .foreach { x =>
        spark.sql(s"DROP TABLE IF EXISTS `$x`")
        spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(x)}`")
      }
  }

  test("retractSignatures: band signatures claimed by a surviving " +
      "near-duplicate STAY; unclaimed ones go") {
    val t = "tk_sigs"
    spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // survives as id 3
      (2L, "unique doomed words nobody else carries anywhere today"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "entirely different surviving text with other tokens")
    ).toDF("doc_id", "text")
    Dedup.writeSignatureStore(corpus, "text", t, buckets = 2)
    try {
      Takedown.retractSignatures(spark, t,
        takedown = corpus.filter($"doc_id" <= 2), textCol = "text",
        surviving = corpus.filter($"doc_id" >= 3),
        survivingTextCol = "text")
      val expected = Dedup.signatureStore(
        corpus.filter($"doc_id" >= 3), "text")
      val lv = Takedown.live(spark, t)
      assert(lv.exceptAll(expected).isEmpty &&
        expected.exceptAll(lv).isEmpty,
        "live view must equal the surviving corpus's signature store")
      Takedown.purge(spark, t)
      val after = spark.table(t)
      assert(after.exceptAll(expected).isEmpty &&
        expected.exceptAll(after).isEmpty)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    }
  }

  test("the user story end to end: a taken-down text becomes ADMITTABLE " +
      "again through the incremental-dedup probe, without a rebuild") {
    val t = "tk_readmit"
    spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    val corpus = Seq(
      (1L, "the retracted licensed article"),
      (2L, "some other shipped document")).toDF("doc_id", "text")
    Dedup.writeFingerprintStore(corpus, "text", t, buckets = 2)
    try {
      val redelivery = Seq((100L, "the retracted licensed article"))
        .toDF("doc_id", "text")
      // before takedown: the store rejects the re-delivery as a dup
      assert(Dedup.againstCorpus(redelivery, Takedown.live(spark, t),
        "text", "doc_id", bloomBits = 0).isEmpty)
      // takedown doc 1 (no surviving claim); probe against live() —
      // the re-licensed text is admittable WITHOUT any store rewrite
      Takedown.retractFingerprints(spark, t,
        takedown = corpus.filter($"doc_id" === 1L), textCol = "text",
        surviving = corpus.filter($"doc_id" =!= 1L),
        survivingTextCol = "text")
      assert(Dedup.againstCorpus(redelivery, Takedown.live(spark, t),
        "text", "doc_id", bloomBits = 0).count() === 1)
      // other shipped text still gates
      assert(Dedup.againstCorpus(
        Seq((101L, "some other shipped document")).toDF("doc_id", "text"),
        Takedown.live(spark, t), "text", "doc_id", bloomBits = 0).isEmpty)
      // and after the physical purge the same probes hold on the table
      Takedown.purge(spark, t)
      assert(Dedup.againstCorpus(redelivery, spark.table(t),
        "text", "doc_id", bloomBits = 0).count() === 1)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    }
  }

  test("streaming freshness, the documented pattern EXECUTED: a " +
      "foreachBatch gate over live() picks up a takedown mid-stream") {
    val t = "tk_stream"
    spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    val corpus = Seq(
      (1L, "the licensed article under dispute"),
      (2L, "unrelated shipped document")).toDF("doc_id", "text")
    Dedup.writeFingerprintStore(corpus, "text", t, buckets = 2)
    val dir = java.nio.file.Files.createTempDirectory("tk_stream").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val query = spark.readStream.schema(schema).json(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-batch live() — tombstones written between triggers are
        // seen by the NEXT batch, the mid-stream freshness the plain
        // static-join plan cannot give
        admitted.synchronized {
          admitted ++= Dedup.againstCorpus(batch,
              Takedown.live(spark, t), "text", "doc_id", bloomBits = 0)
            .select($"doc_id").as[Long].collect()
        }
        () // foreachBatch wants Unit
      }
      .start()
    try {
      def drop(n: Int, id: Long): Unit = java.nio.file.Files.write(
        java.nio.file.Paths.get(f"$dir/b$n%02d.json"),
        s"""{"doc_id": $id, "text": "the licensed article under dispute"}"""
          .getBytes("UTF-8"))
      drop(1, 100L)
      query.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) === Set.empty[Long],
        "pre-takedown: the store must reject the re-delivery")
      Takedown.retractFingerprints(spark, t,
        takedown = corpus.filter($"doc_id" === 1L), textCol = "text",
        surviving = corpus.filter($"doc_id" =!= 1L),
        survivingTextCol = "text")
      drop(2, 200L)
      query.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) === Set(200L),
        "post-takedown: the next batch must admit the re-licensed text")
    } finally {
      query.stop()
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
    }
  }

  test("fail fast: key columns must match the bucket spec; plain tables " +
      "are refused") {
    val t = "tk_fail"
    freshFpStore(t)
    try {
      val e = intercept[IllegalArgumentException](
        Takedown.retract(spark, t, Seq(1L).toDF("doc_id")))
      assert(e.getMessage.contains("bucket columns"))
      spark.sql("DROP TABLE IF EXISTS tk_plain")
      Seq(("x")).toDF("fp").write.saveAsTable("tk_plain")
      val e2 = intercept[IllegalArgumentException](
        Takedown.retract(spark, "tk_plain", Seq("x").toDF("fp")))
      assert(e2.getMessage.contains("not a bucketed store table"))
      val e3 = intercept[IllegalArgumentException](
        Takedown.live(spark, "tk_plain"))
      assert(e3.getMessage.contains("not a bucketed store table"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${Takedown.tombstoneTable(t)}`")
      spark.sql("DROP TABLE IF EXISTS tk_plain")
    }
  }
}
