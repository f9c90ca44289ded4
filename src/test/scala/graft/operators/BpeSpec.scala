package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training on the textbook corpus: merges and final symbols are
  * hand-computable, the greedy-leftmost merge rule is pinned, and the
  * corpus is only scanned once (the vocab loop runs on the word table). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("wordTable splits words to chars (no empty symbols)") {
    val wt = Bpe.wordTable(Seq((1L, "ab ab c")).toDF("id", "text"), "text")
      .as[(String, Long, Seq[String])].collect().sortBy(_._1).toSeq
    // wordTable columns: word, freq, syms
    assert(wt == Seq(("ab", 2L, Seq("a", "b")), ("c", 1L, Seq("c"))))
  }

  test("graft_bpe_merge: greedy leftmost, overlapping runs") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val out = Seq(
      (1L, Seq("a", "a", "a")),          // (a,a): first two merge, third survives
      (2L, Seq("a", "b", "a", "b")),     // both pairs merge
      (3L, Seq("b", "a")),               // no (a,b) occurrence
      (4L, Seq[String]())
    ).toDF("id", "syms")
      .withColumn("m1", call_function("graft_bpe_merge", $"syms", lit("a"), lit("a")))
      .withColumn("m2", call_function("graft_bpe_merge", $"syms", lit("a"), lit("b")))
      .as[(Long, Seq[String], Seq[String], Seq[String])].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out(1L) == ((Seq("aa", "a"), Seq("a", "a", "a"))))
    assert(out(2L) == ((Seq("a", "b", "a", "b"), Seq("ab", "ab"))))
    assert(out(3L)._2 == Seq("b", "a"))
    assert(out(4L) == ((Seq(), Seq())))
  }

  test("train learns the textbook merges with deterministic ties") {
    // classic toy corpus: "low" x2, "lower", "lowest": pair (l,o) and
    // (o,w) both occur 4x -> lexicographic tie-break picks (l,o) first,
    // then (lo,w) 4x, then (low, e) 2x ...
    val df = Seq((1L, "low low lower lowest")).toDF("id", "text")
    val (merges, words) = Bpe.train(df, "text", numMerges = 3)
    assert(merges.map(m => (m._1, m._2, m._3, m._4)) == Seq(
      (0, "l", "o", 4L), (1, "lo", "w", 4L), (2, "low", "e", 2L)))
    val syms = words.select($"word", $"syms").as[(String, Seq[String])]
      .collect().toMap
    assert(syms("low") == Seq("low"))
    assert(syms("lower") == Seq("lowe", "r"))
    assert(syms("lowest") == Seq("lowe", "s", "t"))
  }

  test("train stops early when the vocab is fully merged") {
    val df = Seq((1L, "ab ab")).toDF("id", "text")
    val (merges, words) = Bpe.train(df, "text", numMerges = 10)
    assert(merges.map(m => (m._2, m._3)) == Seq(("a", "b")))
    assert(words.select($"syms").as[Seq[String]].collect().toSeq == Seq(Seq("ab")))
  }

  test("local vocab loop == distributed per-round loop (fixture corpus)") {
    val docs = graft.Tables.load(spark, sf(), "documents").limit(60)
    val (localM, localW) = Bpe.train(docs, "text", numMerges = 8)
    val (distM, distW) = Bpe.train(docs, "text", numMerges = 8, localVocabLimit = 0)
    assert(localM == distM, s"merge lists diverged:\n$localM\n$distM")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select($"word", $"freq", $"syms").as[(String, Long, Seq[String])]
        .collect().sortBy(_._1).toSeq
    assert(snap(localW) == snap(distW))
  }

  test("batched distributed merges == sequential, with measurably fewer jobs") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val words = Bpe.wordTable(docs, "text").localCheckpoint()
    class JobCounter extends org.apache.spark.scheduler.SparkListener {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    def measure(maxBatch: Int): (Seq[(Int, String, String, Long)], Int) = {
      val c = new JobCounter
      spark.sparkContext.addSparkListener(c)
      try {
        val (m, _) = Bpe.trainDistributed(words, numMerges = 30, maxBatch)
        // listener bus is async: wait for it to report EMPTY (bounded)
        // rather than sleeping a fixed interval — the tail of job-start
        // events can outlast any fixed sleep under CI load
        org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
        (m, c.n.get)
      } finally spark.sparkContext.removeSparkListener(c)
    }
    val (seqM, seqJobs) = measure(1)
    val (batM, batJobs) = measure(64)
    assert(batM == seqM,
      s"batched rounds must replay the sequential argmax exactly:\n$seqM\n$batM")
    info(s"jobs: sequential = $seqJobs, batched = $batJobs " +
      f"(${seqJobs.toDouble / batJobs}%.1fx fewer)")
    // exact batching cannot beat merge CHAINS (each link's pair exists
    // only after the previous merge — see the trainDistributed scaladoc),
    // so the bar is "strictly fewer, equality preserved", with the live
    // ratio reported above; order-of-magnitude wins belong to trainLocal
    assert(batJobs * 5 <= seqJobs * 4,
      s"batching must measurably cut jobs: $batJobs vs $seqJobs sequential")
  }

  test("applyMerges encodes new text with a learned merge list") {
    val (merges, _) = Bpe.train(
      Seq((1L, "low low lower lowest")).toDF("id", "text"), "text", 3)
    val enc = Bpe.applyMerges(
      Seq((1L, Seq("l", "o", "w", "l", "y"))).toDF("id", "syms"),
      "syms", merges.map(m => (m._2, m._3)))
    assert(enc.select($"syms").as[Seq[String]].head() == Seq("low", "l", "y"))
  }

  test("encode (single-pass kernel) == applyMerges (per-merge fold) on a real vocab") {
    val docs = graft.Tables.load(spark, sf(), "documents").limit(80)
    val (merges, _) = Bpe.train(docs, "text", numMerges = 24)
    val ms = merges.map(m => (m._2, m._3))
    val words = Bpe.wordTable(docs, "text")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select($"word", $"syms").as[(String, Seq[String])]
        .collect().sortBy(_._1).toSeq
    assert(snap(Bpe.encode(words, "syms", ms)) ==
      snap(Bpe.applyMerges(words, "syms", ms)),
      "pair-priority kernel must equal the rank-order fold")
    // edge shapes: empty arrays, null symbols, unknown pairs
    val edge = Seq(
      (1L, Seq("l", "o", "w")), (2L, Seq[String]()),
      (3L, Seq("l", null, "o", "w")), (4L, Seq("z", "q"))
    ).toDF("id", "syms")
    assert(snapById(Bpe.encode(edge, "syms", ms)) ==
      snapById(Bpe.applyMerges(edge, "syms", ms)))
  }

  private def snapById(df: org.apache.spark.sql.DataFrame) =
    df.select($"id", $"syms").as[(Long, Seq[String])].collect().sortBy(_._1).toSeq

  test("property: kernel == fold over random symbol arrays and WELL-FORMED merge lists") {
    // The equivalence the kernel claims holds on the trained-vocabulary
    // domain: every merge's sides exist (single chars or outputs of
    // EARLIER merges), which is exactly what training produces — a pair
    // created by merge k always carries rank > k. The generator grows a
    // symbol pool the way training does, so the lists stay in-domain;
    // tiny alphabet forces overlapping runs and chained re-merges.
    // Seeded, so failures reproduce.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val symGen = Gen.oneOf("a", "b", "c")
    val arrGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, symGen))
    val docs = Gen.listOfN(60, arrGen)
      .pureApply(Gen.Parameters.default, Seed(41L))
      .zipWithIndex.map { case (ss, i) => (i.toLong, ss) }
    def wellFormedMerges(n: Int, seed: Long): Seq[(String, String)] = {
      var pool = Vector("a", "b", "c")
      (0 until n).map { k =>
        val pick = Gen.zip(Gen.choose(0, pool.length - 1),
          Gen.choose(0, pool.length - 1))
          .pureApply(Gen.Parameters.default, Seed(seed * 1000 + k))
        val (l, r) = (pool(pick._1), pool(pick._2))
        pool :+= l + r
        (l, r)
      }
    }
    (0 until 8).foreach { round =>
      val merges = wellFormedMerges(6 + round % 5, 100L + round)
      val df = docs.toDF("id", "syms")
      assert(snapById(Bpe.encode(df, "syms", merges)) ==
        snapById(Bpe.applyMerges(df, "syms", merges)),
        s"kernel diverged from fold on merges $merges")
    }
  }

  test("malformed (untrained) merge lists: kernel keeps tokenizer priority semantics") {
    // Outside the trained domain the two are DOCUMENTED to differ: rank 0
    // ('ab','c') only becomes applicable after rank 1 creates 'ab'. The
    // fold visits rank 0 first (no-op) and never returns; the kernel —
    // like every priority-loop tokenizer — applies the best present pair,
    // so it finishes the chain. Pin both behaviors so the contract stays
    // visible.
    val merges = Seq(("ab", "c"), ("a", "b"))
    val df = Seq((1L, Seq("a", "b", "c"))).toDF("id", "syms")
    assert(Bpe.encode(df, "syms", merges)
      .select($"syms").as[Seq[String]].head() == Seq("abc"))
    assert(Bpe.applyMerges(df, "syms", merges)
      .select($"syms").as[Seq[String]].head() == Seq("ab", "c"))
  }

  test("encode completes with a 32k-merge vocabulary (flat plan, one kernel call)") {
    // the fold form would build a 32k-deep projection chain and die in
    // analysis/codegen; the kernel takes the whole ranked list as ONE
    // plan constant. Real learned merges first, padded to 32k with
    // synthetic never-firing pairs (rank order preserved).
    val docs = graft.Tables.load(spark, sf(), "documents").limit(80)
    val (learned, _) = Bpe.train(docs, "text", numMerges = 16)
    val ms = learned.map(m => (m._2, m._3)) ++
      (0 until 32768).map(i => (s"__pad${i}a", s"__pad${i}b"))
    val words = Bpe.wordTable(docs, "text")
    val enc = Bpe.encode(words, "syms", ms)
    // ONE added projection over the word table — plan depth independent
    // of |merges| (the fold adds one Project per merge)
    assert(enc.queryExecution.analyzed.collect { case p => p }.size <=
      words.queryExecution.analyzed.collect { case p => p }.size + 1)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select($"word", $"syms").as[(String, Seq[String])]
        .collect().sortBy(_._1).toSeq
    // padding never fires: the 32k-entry table encodes identically to the
    // 16 real merges alone
    assert(snap(enc) == snap(Bpe.encode(words, "syms",
      learned.map(m => (m._2, m._3)))))
  }
}
