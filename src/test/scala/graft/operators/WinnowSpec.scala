package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprints: the w+k−1 sharing guarantee, adjacent-window
  * dedup, and the short-document boundary. */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  test("any shared run of >= w + k - 1 tokens shares a fingerprint") {
    // k=4, w=4: guarantee threshold is 7 tokens. The two docs share an
    // 8-token run embedded in different surroundings.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, s"one two three $shared x y z"),
      (2L, s"$shared completely different tail words here")
    ).toDF("id", "text")
    val fp = Winnow.fingerprints(df, "text", "id").cache()
    val a = fp.filter($"id" === 1L).select($"fp").as[String].collect().toSet
    val b = fp.filter($"id" === 2L).select($"fp").as[String].collect().toSet
    assert((a & b).nonEmpty, "shared 8-token run must share a fingerprint")
    fp.unpersist()
  }

  test("selected positions are in-range minima; adjacent dups collapse") {
    val df = Seq((1L, (1 to 12).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    // 12 tokens, k=4 -> 9 grams; w=4 -> 6 windows but <= 6 distinct picks
    val rows = Winnow.fingerprints(df, "text", "id")
      .select($"pos").as[Long].collect()
    assert(rows.nonEmpty && rows.length <= 6)
    assert(rows.forall(p => p >= 1 && p <= 9))
    assert(rows.distinct.length == rows.length, "duplicates must collapse")
  }

  test("property: the sharing guarantee holds on randomized surroundings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // 40 deterministic pairs: random prefixes/suffixes around a random
    // shared run of exactly w + k - 1 = 7 tokens (the guarantee's edge)
    def toks(alpha: String, n: Int, seed: Long): Seq[String] =
      Gen.listOfN(n, Gen.choose(0, 999).map(i => s"$alpha$i"))
        .apply(Gen.Parameters.default, Seed(seed)).get
    val docs = (0 until 40).flatMap { i =>
      val shared = toks("s", 7, 1000L + i)
      val a = toks("a", 5 + i % 7, 2000L + i) ++ shared ++ toks("b", 3, 3000L + i)
      val b = toks("c", 2 + i % 5, 4000L + i) ++ shared ++ toks("d", 6, 5000L + i)
      Seq((2L * i, a.mkString(" ")), (2L * i + 1, b.mkString(" ")))
    }
    val fp = Winnow.fingerprints(docs.toDF("id", "text"), "text", "id")
      .select($"id", $"fp").as[(Long, String)].collect()
      .groupBy(_._1 / 2).view.mapValues(_.groupBy(_._1 % 2)).toMap
    (0 until 40).foreach { i =>
      val byDoc = fp(i.toLong)
      val a = byDoc.getOrElse(0L, Array.empty).map(_._2).toSet
      val b = byDoc.getOrElse(1L, Array.empty).map(_._2).toSet
      assert((a & b).nonEmpty, s"pair $i: 7-token shared run yielded no shared fp")
    }
  }

  test("winnow is stateless: the same plan is valid mid-stream, stream == batch") {
    val src = java.nio.file.Files.createTempDirectory("wn_src").toString
    val out = java.nio.file.Files.createTempDirectory("wn_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wn_ckpt").toString
    val rows = Seq(
      (1L, (1 to 15).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 12).map(i => s"b$i").mkString(" "))).toDF("id", "text")
    rows.write.mode("append").parquet(src)
    val q = Winnow.fingerprints(
      spark.readStream.schema(rows.schema).parquet(src), "text", "id")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val batch = Winnow.fingerprints(rows, "text", "id")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("documents with fewer than w k-grams emit nothing") {
    val df = Seq((1L, "a b c d e f")).toDF("id", "text") // 3 grams < w=4
    assert(Winnow.fingerprints(df, "text", "id").isEmpty)
  }

  // ---- persisted store lifecycle (the q167 path made first-class) ----

  private def corpus(n: Int, tag: String, base: Long = 0L) =
    (0 until n).map { i =>
      (base + i, (0 until 12).map(j => s"$tag${(i + j) % 7} w$j").mkString(" "))
    }.toDF("id", "text")

  test("store: write + open round-trips content and stamped geometry") {
    spark.sql("DROP TABLE IF EXISTS winnow_spec_store")
    val c = corpus(20, "a")
    Winnow.writeFpStore(c, "text", "id", "winnow_spec_store",
      buckets = 4, k = 3, w = 5)
    val (st, k, w) = Winnow.openFpStore(spark, "winnow_spec_store")
    assert((k, w) === (3, 5))
    val direct = Winnow.fpStore(c, "text", "id", k = 3, w = 5)
    assert(st.exceptAll(direct).isEmpty && direct.exceptAll(st).isEmpty)
  }

  test("store: append == rebuild, replaying the stamped geometry") {
    spark.sql("DROP TABLE IF EXISTS winnow_spec_store2")
    val a = corpus(15, "a")
    val b = corpus(10, "b", base = 100L)
    Winnow.writeFpStore(a, "text", "id", "winnow_spec_store2",
      buckets = 4, k = 3, w = 3)
    Winnow.appendToFpStore(b, "text", "id", "winnow_spec_store2")
    val (got, _, _) = Winnow.openFpStore(spark, "winnow_spec_store2")
    val rebuilt = Winnow.fpStore(a.unionByName(b), "text", "id", k = 3, w = 3)
    assert(got.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(got).isEmpty,
      "appended store must equal a from-scratch rebuild")
    // crash-retry: double-append of the same batch seeds nothing new
    Winnow.appendToFpStore(b, "text", "id", "winnow_spec_store2")
    val (again, _, _) = Winnow.openFpStore(spark, "winnow_spec_store2")
    assert(again.count() === rebuilt.count(), "double-append must be idempotent")
  }

  test("store: probeStore == the ad-hoc q167 probe under the same geometry") {
    spark.sql("DROP TABLE IF EXISTS winnow_spec_store3")
    val a = corpus(15, "a")
    val batch = corpus(6, "a").unionByName(corpus(4, "z", base = 200L))
    Winnow.writeFpStore(a, "text", "id", "winnow_spec_store3",
      buckets = 4, k = 4, w = 4)
    val viaStore = Winnow.probeStore(batch, "text", "id", "winnow_spec_store3")
    val adhoc = Winnow.fingerprints(batch, "text", "id")
      .join(Winnow.fpStore(a, "text", "id").withColumn("__hit", lit(1)),
        Seq("fp"), "left")
      .groupBy($"id")
      .agg(count(lit(1)).as("n_fps"), count($"__hit").as("n_hits"))
    assert(viaStore.exceptAll(adhoc).isEmpty && adhoc.exceptAll(viaStore).isEmpty)
  }

  test("store: probe/append fail fast on a missing geometry stamp") {
    spark.sql("DROP TABLE IF EXISTS winnow_spec_plain")
    // clear an orphan location a crashed earlier run may have left
    // (plain saveAsTable refuses locations the catalog doesn't own)
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "winnow_spec_plain")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    corpus(5, "a").select(md5($"text").as("fp"))
      .write.saveAsTable("winnow_spec_plain")
    val e = intercept[IllegalStateException] {
      Winnow.probeStore(corpus(3, "a"), "text", "id", "winnow_spec_plain")
    }
    assert(e.getMessage.contains("stamp"))
  }

  test("store: gate seeded from the persisted store == seeded from the direct frame") {
    spark.sql("DROP TABLE IF EXISTS winnow_spec_store4")
    val shipped = corpus(12, "a")
    val stream = corpus(5, "a").unionByName(corpus(5, "q", base = 300L))
    Winnow.writeFpStore(shipped, "text", "id", "winnow_spec_store4",
      buckets = 4, k = 4, w = 4)
    val (seedDf, k, w) = Winnow.openFpStore(spark, "winnow_spec_store4")
    val viaStore = graft.streaming.WinnowGate.fpVerdicts(
      stream, "text", "id", k = k, w = w, seed = Some(seedDf))
    val direct = graft.streaming.WinnowGate.fpVerdicts(
      stream, "text", "id", k = 4, w = 4,
      seed = Some(Winnow.fpStore(shipped, "text", "id")))
    assert(viaStore.exceptAll(direct).isEmpty && direct.exceptAll(viaStore).isEmpty)
  }

  test("store: probe plan has zero exchanges on the store side") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    spark.sql("DROP TABLE IF EXISTS winnow_spec_store5")
    Winnow.writeFpStore(corpus(15, "a"), "text", "id", "winnow_spec_store5",
      buckets = 4, k = 4, w = 4)
    // at spec scale Spark would broadcast the tiny store and hide the
    // property under test — at corpus scale broadcast is impossible and
    // SMJ-over-buckets is the plan this pin protects
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
      val got = Winnow.probeStore(corpus(6, "a"), "text", "id",
        "winnow_spec_store5")
      got.collect() // run under AQE so the final plan is the real one
      val joins = collectPlan(got.queryExecution.executedPlan) {
        case j if j.nodeName.contains("SortMergeJoin") => j
      }
      assert(joins.nonEmpty, "probe must plan a sort-merge join on the bucketed store")
      val storeSide = joins.flatMap(j => j.children.lastOption)
      val exchanges = storeSide.flatMap(_.collect {
        case e: ShuffleExchangeLike => e
        case e: BroadcastExchangeLike => e
      })
      assert(exchanges.isEmpty,
        s"the store side must never re-shuffle at probe time: $exchanges")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
