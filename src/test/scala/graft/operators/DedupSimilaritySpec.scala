package graft.operators

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** The packaged operator API must agree with the oracle-checked query
  * forms it wraps. */
class DedupSimilaritySpec extends SparkSpec {

  import spark.implicits._

  test("Dedup.exactByText keeps one deterministic winner per duplicate group") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("id", "text")
    val out = Dedup.exactByText(df, "text", "id")
    assert(out.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(out.columns.toSeq == Seq("id", "text")) // helper columns dropped
  }

  test("Dedup.exactByTextBy: each duplicate group keeps its best-scored " +
      "row, ties by min id, null scores lose, all-null groups fall " +
      "back to min id, columns intact, no per-group window in the plan") {
    val df = Seq(
      (1L, "Hello  World", Option(0.2)), // dup group A, low score
      (2L, "hello world", Option(0.9)), // dup group A, WINNER
      (3L, "hello world", Option(0.9)), // dup group A, tie -> id 2 wins
      (4L, "other", Option.empty[Double]), // singleton, null score kept
      (5L, "twin", Option.empty[Double]), // dup group B, all-null ->
      (6L, "twin", Option.empty[Double]), //   min-id fallback keeps 5
      (7L, "mixed", Option.empty[Double]), // dup group C: null loses
      (8L, "mixed", Option(0.1)) //   to ANY non-null -> 8 wins
    ).toDF("id", "text", "score")
    val out = Dedup.exactByTextBy(df, "text", "id", "score")
    assert(out.select($"id").as[Long].collect().sorted.toSeq ===
      Seq(2L, 4L, 5L, 8L))
    assert(out.columns.toSeq === Seq("id", "text", "score"))
    // the scale claim: no window funnel — only aggregates + semi-join
    val windows = collectPlan(out.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "keep-best must not sort groups in a window")
    intercept[IllegalArgumentException](
      Dedup.exactByTextBy(df, "text", "id", "nope"))
  }

  test("Dedup.nearDupCandidates matches the q22 query shape") {
    val viaApi = Dedup.nearDupCandidates(
      Tables.load(spark, sf(), "documents"), "text", "doc_id")
      .withColumnsRenamed(Map("doc_id_a" -> "doc_a", "doc_id_b" -> "doc_b"))
    val viaQuery = SparkEntry.queries("q22_neardup_pairs")(spark, sf())
    assert(viaApi.exceptAll(viaQuery).isEmpty && viaQuery.exceptAll(viaApi).isEmpty)
  }

  test("Dedup.pruneNearDups keeps exactly each cluster's min id, columns intact") {
    val docs = Tables.load(spark, sf(), "documents")
    val kept = Dedup.pruneNearDups(docs, "text", "doc_id")
    assert(kept.columns.toSeq == docs.columns.toSeq)
    // independent recomposition: candidates -> clusters -> winners
    val cl = Dedup.clusters(
      Dedup.nearDupCandidates(docs, "text", "doc_id"), "doc_id_a", "doc_id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectDropped = cl.filter { case (n, c) => n != c }.keySet
    val keptIds = kept.select($"doc_id").as[Long].collect().toSet
    val allIds = docs.select($"doc_id").as[Long].collect().toSet
    assert(keptIds == allIds -- expectDropped)
    assert(expectDropped.nonEmpty, "fixture must actually contain near-dups")
  }

  test("Dedup.containmentVerified scores subset duplication asymmetrically") {
    // B = A plus a tail: every A-shingle is in B (containment_a = 1.0)
    // while B keeps 36 of its 40 shingles in A (containment_b = 0.9).
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, base + " extra tail words here")).toDF("id", "text")
    val out = Dedup.containmentVerified(df, "text", "id", minContainment = 0.9)
      .select($"id_a", $"id_b", $"containment_a", $"containment_b")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 1.0, 0.9)))
    // symmetric Jaccard on the same pair under-scores the subset
    // direction: A inside B gives J = |A|/|B| = 0.9, while the
    // containment measure reports the full 1.0 for it
    val j = Dedup.nearDupVerified(df, "text", "id", minJaccard = 0.0)
      .select($"jaccard").as[Double].head()
    assert(j == 36.0 / 40 && j < 1.0)
  }

  test("Dedup.softDedupWeights: unit mass per cluster, singletons keep 1.0") {
    val docs = Tables.load(spark, sf(), "documents")
    val pairs = Dedup.nearDupCandidates(docs, "text", "doc_id")
    val w = Dedup.softDedupWeights(docs, pairs, "doc_id", "doc_id_a", "doc_id_b")
      .cache()
    assert(w.count() == docs.count()) // nothing dropped, nothing duplicated
    val badMass = w.groupBy($"cluster").agg(sum($"weight").as("s"))
      .filter(abs($"s" - 1.0) > 1e-9)
    assert(badMass.isEmpty, "every cluster's weights must sum to 1")
    assert(w.filter($"n_dups" === 1 && $"weight" =!= 1.0).isEmpty)
    assert(w.filter($"n_dups" > 1).count() > 0, "fixture must contain near-dups")
    w.unpersist()
  }

  test("Dedup.exactByKey keeps the orderBy-first row per key group") {
    val df = Seq((1L, "b", 10), (2L, "a", 20), (3L, "a", 30)).toDF("id", "k", "v")
    val out = Dedup.exactByKey(df, Seq("k"), orderBy = "id")
    assert(out.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("Sessions.aggregate matches the q12 query shape") {
    val viaApi = Sessions.aggregate(
      Tables.load(spark, sf(), "events"), "user_id", "ts", "event_id",
      gapMs = 1800000L, valueCol = "value")
    val viaQuery = SparkEntry.queries("q12_sessionize")(spark, sf())
    assert(viaApi.exceptAll(viaQuery).isEmpty && viaQuery.exceptAll(viaApi).isEmpty)
  }

  test("Similarity.cosineTopK matches the q30 query shape") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val viaApi = Similarity.cosineTopK(
      emb, emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 5)
      .select($"q_id", $"vec_id", round($"cos", 6).as("cos"))
    val viaQuery = SparkEntry.queries("q30_cosine_topk")(spark, sf()).drop("rn")
    assert(viaApi.exceptAll(viaQuery).isEmpty && viaQuery.exceptAll(viaApi).isEmpty)
  }

  test("Similarity.kmeans: deterministic, k centroids, assignments improve over init") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val trained = Similarity.kmeans(emb, "vec_id", "embedding", k = 8, iterations = 3)
    val again = Similarity.kmeans(emb, "vec_id", "embedding", k = 8, iterations = 3)
    assert(trained.count() == 8)
    assert(trained.exceptAll(again).isEmpty, "same input must give same centroids")

    def inertia(centroids: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfAssign(emb, centroids, "vec_id", "embedding", "centroid_id")
        .agg(sum(lit(1.0) - $"cos")).as[Double].head()
    val init = Similarity.kmeans(emb, "vec_id", "embedding", k = 8, iterations = 0)
    assert(inertia(trained) < inertia(init), "training must reduce total distance")
  }

  test("Similarity.kmeans: plan stays flat across iterations (driver-held centroids)") {
    val emb = Tables.load(spark, sf(), "embeddings")
    // Each Lloyd iteration materializes centroids on the driver, so the
    // returned frame must be a constant-size local plan no matter how many
    // iterations ran — the regression guard for O(iterations^2) lineage.
    def planSize(iters: Int): Int =
      Similarity.kmeans(emb, "vec_id", "embedding", k = 4, iterations = iters)
        .queryExecution.optimizedPlan.collect { case p => p }.size
    val p1 = planSize(1)
    assert(planSize(4) == p1, "plan depth must not grow with iteration count")
    assert(Similarity.kmeans(emb, "vec_id", "embedding", k = 4, iterations = 1)
      .queryExecution.optimizedPlan.toString.contains("LocalRelation"),
      "trained centroids must be a driver-held LocalRelation")
    // ids are 0..k-1 by ascending vec_id, even if a cluster empties
    val ids = Similarity.kmeans(emb, "vec_id", "embedding", k = 4, iterations = 2)
      .select($"centroid_id").as[Int].collect().sorted.toSeq
    assert(ids == Seq(0, 1, 2, 3))
  }

  test("Dedup.clusters: transitive chains collapse to the min id") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair (7,8),
    // and an isolated pair touching the chain's numbering gap
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.clusters(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L))
  }

  test("Dedup.clusters: adversarial 10k-node chain converges via pointer jumping") {
    // a path graph is the worst case for plain min-label propagation
    // (diameter = n-1 rounds); the escalated shortcut must close it in
    // O(log n) rounds — well inside the default maxIters
    val n = 10000
    val chain = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val out = Dedup.clusters(chain, "a", "b")
    assert(out.filter($"cluster" =!= 1L).isEmpty,
      "every chain node must reach the minimum label 1")
    assert(out.count() == n)
  }

  test("Dedup.clusters: escalated path agrees with plain propagation on blob graphs") {
    // dup-shaped input: dense blobs plus a short chain — plain propagation
    // (escalateAfter = MaxValue) is the reference semantics
    val blobs =
      (for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)) ++   // clique 10..14
        Seq((20L, 21L), (21L, 22L), (22L, 23L), (30L, 31L))          // chain + pair
    val pairs = blobs.toDF("a", "b")
    val escalated = Dedup.clusters(pairs, "a", "b", escalateAfter = 0)
      .as[(Long, Long)].collect().toMap
    val plain = Dedup.clusters(pairs, "a", "b", escalateAfter = Int.MaxValue)
      .as[(Long, Long)].collect().toMap
    assert(escalated == plain)
    assert(plain(14L) == 10L && plain(23L) == 20L && plain(31L) == 30L)
  }

  test("weightedMinhashSigs: tf-sensitive, permutation-invariant, zero exchanges") {
    val df = Seq(
      (1L, "a a a b"),        // heavy 'a'
      (2L, "a a a b"),        // identical bag -> identical sigs
      (3L, "b a a a"),        // same BAG, different order -> identical sigs
      (4L, "a b b b"),        // same SET, different weights
      (5L, "")                // token-less -> no rows
    ).toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.weightedMinhashSigs(df, "text", "doc_id", bands = 8)
    val by = sigs.as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(by(1L) == by(2L), "identical bags must sign identically")
    assert(by(1L) == by(3L), "signatures are bag-of-words, order-free")
    assert(by(1L) != by(4L), "same set with different tf must separate on some band")
    assert(!by.contains(5L))
    // estimator sanity: weighted Jaccard of doc1 vs doc4 = (1+1)/(3+3),
    // so a band (2 draws, AND) agrees with prob ~1/9 — most of the 8
    // bands must disagree
    val agree = by(1L).zip(by(4L)).count { case (a, b) => a == b }
    assert(agree < 4, s"agreement $agree/8")
    // the signature pass is narrow: no exchange anywhere in the plan
    val exchanges = collectPlan(sigs.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "weighted signatures must not shuffle")
  }

  test("weighted-minhash kernel == HOF fold bit-for-bit (fixture-wide differential)") {
    // the kernel's single digest-slice arithmetic, StrictMath.log, and
    // (v, token) argmin tie-break must reproduce the interpreted HOF
    // construction exactly — over real fixture text AND the adversarial
    // edges (empty, single token, all-same-token, high-tf bags)
    val fixture = graft.Tables.load(spark, sf(), "documents")
      .select($"doc_id", $"text")
    val edges = Seq((9001L, ""), (9002L, "solo"), (9003L, "x x x x x x"),
      (9004L, "a a a a a a a a a b c"), (9005L, "tie tie break break"))
      .toDF("doc_id", "text")
    val df = fixture.unionByName(edges)
    for ((b, r) <- Seq((4, 2), (4, 4), (1, 1), (8, 3))) {
      val kernel = graft.operators.Dedup
        .weightedMinhashSigs(df, "text", "doc_id", bands = b, rows = r)
        .as[(Long, Long, String)].collect().toSet
      val fold = graft.operators.Dedup
        .weightedMinhashSigsFold(df, "text", "doc_id", bands = b, rows = r)
        .as[(Long, Long, String)].collect().toSet
      assert(kernel == fold, s"bands=$b rows=$r: kernel diverged from fold")
    }
  }

  test("weightedNearDupsAgainstCorpus: tf-twins of shipped docs drop, novel admit") {
    val corpus = Seq((1L, "x x x y"), (2L, "p q r s")).toDF("doc_id", "text")
    val store = graft.operators.Dedup
      .weightedSignatureStore(corpus, "text", bands = 4).localCheckpoint()
    val batch = Seq(
      (10L, "x x x y"),   // tf-twin of shipped doc 1 -> dropped
      (11L, "m n o p"),   // novel -> admitted
      (12L, "m n o p")    // in-batch twin of 11 -> pruned in-batch
    ).toDF("doc_id", "text")
    val admitted = graft.operators.Dedup
      .weightedNearDupsAgainstCorpus(batch, store, "text", "doc_id", bands = 4)
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted == Set(11L), admitted.toString)
    // idempotent: re-running the same batch against the same store
    // admits the same set
    val again = graft.operators.Dedup
      .weightedNearDupsAgainstCorpus(batch, store, "text", "doc_id", bands = 4)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == admitted)
  }

  test("pruneNearDupsBy keeps the best-scored member, not the min id") {
    // docs 1/2/3 near-dup (same shingles); 3 is the longest copy.
    // doc 9 is unrelated and must survive untouched.
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, base, 8L),
      (2L, base + " iota", 9L),
      (3L, base + " iota kappa", 10L),
      (9L, "completely different words everywhere here now truly", 7L)
    ).toDF("doc_id", "text", "quality")
    val byQuality = graft.operators.Dedup
      .pruneNearDupsBy(df, "text", "doc_id", "quality")
      .select($"doc_id").as[Long].collect().toSet
    assert(byQuality == Set(3L, 9L), byQuality.toString)
    // the min-id policy would keep doc 1 instead
    val byMinId = graft.operators.Dedup.pruneNearDups(df, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(byMinId == Set(1L, 9L), byMinId.toString)
    // score ties break to the smaller id
    val tied = Seq((5L, base, 4L), (6L, base, 4L)).toDF("doc_id", "text", "quality")
    assert(graft.operators.Dedup.pruneNearDupsBy(tied, "text", "doc_id", "quality")
      .select($"doc_id").as[Long].collect().toSeq == Seq(5L))
  }

  test("candidatesFromSigs: weighted sigs pair tf-twins; over-cap bucket stars") {
    val twins = Seq((1L, "x x x y"), (2L, "x x x y"), (3L, "y y y x"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.candidatesFromSigs(
        graft.operators.Dedup.weightedMinhashSigs(twins, "text", "doc_id", bands = 4),
        "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "identical bags must pair")
    // over-cap: many identical docs star to the min id instead of O(b^2)
    val blob = spark.range(40).select($"id".as("doc_id"), lit("a a b").as("text"))
    val starred = graft.operators.Dedup.candidatesFromSigs(
        graft.operators.Dedup.weightedMinhashSigs(blob, "text", "doc_id", bands = 2),
        "doc_id", maxBucket = 8)
      .as[(Long, Long)].collect().toSet
    assert(starred == (1L to 39L).map(i => (0L, i)).toSet,
      "over-cap bucket must star on the min id")
  }

  test("sq8Encode: codes bounded, max-abs dim hits ±127, reconstruction close") {
    val e = Tables.load(spark, sf(), "embeddings").limit(50)
    val enc = graft.operators.Similarity.sq8Encode(e, "vec_id", "embedding")
      .select($"vec_id", $"m", $"q8").as[(Long, Double, Seq[Int])].collect()
    assert(enc.length == 50)
    enc.foreach { case (_, m, q8) =>
      assert(m > 0)
      assert(q8.forall(c => c >= -127 && c <= 127))
      // the max-abs dimension quantizes to exactly ±127
      assert(q8.exists(c => math.abs(c) == 127))
    }
    // reconstruction m*c/127 stays within one quantization step per dim
    val joined = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    enc.foreach { case (id, m, q8) =>
      val orig = joined(id)
      q8.zip(orig).foreach { case (c, x) =>
        assert(math.abs(c * m / 127.0 - x) <= m / 127.0 + 1e-9,
          s"vec $id: code $c vs $x (m=$m)")
      }
    }
  }

  test("sq8AdcTopK: ADC scores equal hand-computed quantized dots; heap == window") {
    val e = Tables.load(spark, sf(), "embeddings")
    val q = e.filter($"vec_id" < 3)
    val got = graft.operators.Similarity
      .sq8AdcTopK(e, q, "vec_id", "embedding", k = 4)
      .select($"q_id", $"vec_id", $"score")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._3, r._2)).toSeq).toMap
    // hand recompute from raw embeddings (same trunc + left-fold algebra)
    val all = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val qs = all.filter(_._1 < 3)
    val expected = qs.map { case (qid, qe) =>
      val scored = all.filter(_._1 != qid).map { case (id, emb) =>
        val m = emb.map(x => math.abs(x.toDouble)).max
        val codes = emb.map(x => (x.toDouble * 127.0 / m).toInt)
        var dot = 0.0
        codes.zip(qe).foreach { case (c, x) => dot += c.toDouble * x.toDouble }
        (id, (m / 127.0) * dot)
      }
      qid -> scored.sortBy(r => (-r._2, r._1)).take(4).toSeq
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (qid, want) =>
      assert(got(qid) == want.map(w => (qid, w._1, w._2)),
        s"q $qid: ${got(qid)} vs $want")
    }
  }

  test("Similarity.ivfAssign matches the q33 query shape") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val viaApi = Similarity.ivfAssign(emb, emb.filter($"vec_id" < 16),
      "vec_id", "embedding", "vec_id")
      .select($"vec_id", $"centroid", round($"cos", 6).as("cos"))
    val viaQuery = SparkEntry.queries("q33_ivf_assign")(spark, sf())
    assert(viaApi.exceptAll(viaQuery).isEmpty && viaQuery.exceptAll(viaApi).isEmpty)
  }

  test("Similarity.ivfAssign is a narrow pass: zero exchanges in the plan") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val p = Similarity.ivfAssign(emb, emb.filter($"vec_id" < 16),
      "vec_id", "embedding", "vec_id").queryExecution.executedPlan
    val shuffles = collectPlan(p) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty,
      s"centroid assignment must not shuffle the corpus: $shuffles")
  }

  test("kmeans ignores a zero-norm centroid instead of letting NaN capture the corpus") {
    // vec 0 is all-zero: under NaN-wins argmax every row would land on
    // centroid 0 (cosine NaN everywhere); training must instead behave
    // like the old (1-cos) ASC window, where NaN ranked last
    val emb = Seq(
      (0L, Seq(0.0, 0.0)),                       // zero-norm: becomes centroid 0
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.9, 0.1)), (3L, Seq(0.8, 0.2)),
      (4L, Seq(-1.0, 0.0)), (5L, Seq(-0.9, -0.1))
    ).toDF("vec_id", "embedding")
    val trained = Similarity.kmeans(emb, "vec_id", "embedding", k = 2, iterations = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // centroid 0 keeps its zero seed (cosine undefined against every row
    // -> attracts nothing); the live centroid absorbs all five real
    // vectors, mean (0.16, 0.04) — and nothing is NaN-poisoned
    assert(trained(0) == Seq(0.0, 0.0), "zero-norm centroid must not move")
    assert(trained(1).zip(Seq(0.16, 0.04)).forall { case (a, e) =>
      math.abs(a - e) < 1e-9 }, s"live centroid must train sanely: ${trained(1)}")
    assert(trained.values.flatten.forall(v => !v.isNaN))
  }

  test("withNearest: broadcast path matches the literal fold under both NaN modes") {
    // null, zero-norm, and NaN-element rows force the edge semantics
    // through both paths
    val emb = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(0.0, 0.0)),                     // zero-norm -> cosine undefined (null)
      (3L, null.asInstanceOf[Seq[Double]]),    // null embedding
      (4L, Seq(Double.NaN, 1.0))               // NaN element -> NaN cosine
    ).toDF("vec_id", "embedding")
    val centroids = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("c_id", "embedding")
    for (nanWins <- Seq(true, false)) {
      def run(limit: Int) =
        Similarity.withNearest(emb, centroids, "embedding", "c_id",
          literalLimit = limit, nanWins = nanWins)
          .select($"vec_id", $"__list").as[(Long, Int)].collect().toMap
      val viaLiteral = run(Similarity.LiteralCentroidDoubles)
      val viaBroadcast = run(0)
      assert(viaLiteral == viaBroadcast,
        s"paths diverged at nanWins=$nanWins: $viaLiteral vs $viaBroadcast")
      assert(viaLiteral(3L) == -1, "null embedding keeps the sentinel")
      assert(viaLiteral(2L) == -1, "zero-norm: undefined cosine never wins")
      if (nanWins) assert(viaLiteral(4L) == 0, "NaN-wins: first centroid id")
      else assert(viaLiteral(4L) == -1, "NaN never wins: sentinel")
    }
  }

  test("withNearest: broadcast mapPartitions path matches the literal fold") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val centroids = emb.filter($"vec_id" < 16).select($"vec_id".as("c_id"), $"embedding")
    def run(limit: Int) =
      Similarity.withNearest(emb.select($"vec_id", $"embedding"),
        centroids, "embedding", "c_id", literalLimit = limit)
        .select($"vec_id", $"__list", round($"__cos", 9).as("cos"))
    val viaLiteral = run(Similarity.LiteralCentroidDoubles)
    val viaBroadcast = run(0) // force the large-k path
    assert(viaLiteral.exceptAll(viaBroadcast).isEmpty &&
      viaBroadcast.exceptAll(viaLiteral).isEmpty)
  }

  test("Similarity.ivfTopK: exact at full probe; sane recall when pruned") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val centroids = emb.filter($"vec_id" < 16).select($"vec_id".as("c_id"), $"embedding")
    val queries = emb.filter($"vec_id" < 10)
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"q_id".cast("long"), $"vec_id".cast("long"))
        .as[(Long, Long)].collect().toSet
    // probing every list is brute force — identical result sets
    val full = Similarity.ivfTopK(emb, centroids, queries,
      "vec_id", "embedding", "c_id", k = 5, nProbe = 16)
    val brute = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
    assert(key(full) == key(brute), "nProbe = |centroids| must equal brute force")
    // pruned probing returns k rows per query and keeps useful recall
    val pruned = Similarity.ivfTopK(emb, centroids, queries,
      "vec_id", "embedding", "c_id", k = 5, nProbe = 4)
    val perQuery = pruned.groupBy($"q_id").count().select($"count").as[Long].collect()
    assert(perQuery.forall(_ <= 5) && perQuery.nonEmpty)
    val recall = key(pruned).intersect(key(brute)).size.toDouble / key(brute).size
    assert(recall >= 0.3, f"recall@5 with 4/16 lists collapsed to $recall%.2f")
  }

  test("Similarity.ivfSq8TopK: equals flat SQ8 at full probe; k-bounded when pruned") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val centroids = emb.filter($"vec_id" < 16).select($"vec_id".as("c_id"), $"embedding")
    val queries = emb.filter($"vec_id" < 10)
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"q_id".cast("long"), $"vec_id".cast("long"))
        .as[(Long, Long)].collect().toSet
    val full = Similarity.ivfSq8TopK(emb, centroids, queries,
      "vec_id", "embedding", "c_id", k = 5, nProbe = 16)
    val flat = Similarity.sq8AdcTopK(emb, queries, "vec_id", "embedding", k = 5)
    assert(key(full) == key(flat), "nProbe = |centroids| must equal flat SQ8")
    val pruned = Similarity.ivfSq8TopK(emb, centroids, queries,
      "vec_id", "embedding", "c_id", k = 5, nProbe = 4)
    val perQuery = pruned.groupBy($"q_id").count().select($"count").as[Long].collect()
    assert(perQuery.forall(_ <= 5) && perQuery.nonEmpty)
    val recall = key(pruned).intersect(key(flat)).size.toDouble / key(flat).size
    assert(recall >= 0.3, f"recall@5 with 4/16 lists collapsed to $recall%.2f")
  }

  test("simhashNearDup: pigeonhole banding finds ALL pairs within the budget " +
      "(32-bit oracle width and 64-bit production width)") {
    val docs = Tables.load(spark, sf(), "documents").limit(200)
    for (bits <- Seq(32, 64)) {
      val found = Dedup.simhashNearDup(docs, "text", "doc_id",
          maxHamming = 3, bits = bits)
        .as[(Long, Long, Long)].collect().toSeq
      // ground truth: brute-force all-pairs popcount over the fingerprints
      val sh = (if (bits == 64) Dedup.simhashes64(docs, "text", "doc_id")
                else Dedup.simhashes(docs, "text", "doc_id"))
        .as[(Long, Long)].collect().sortBy(_._1)
      val brute = for {
        i <- sh.indices; j <- (i + 1) until sh.length
        h = java.lang.Long.bitCount(sh(i)._2 ^ sh(j)._2) if h <= 3
      } yield (sh(i)._1, sh(j)._1, h.toLong)
      assert(found.toSet == brute.toSet,
        s"banding must be exact within the budget at $bits bits")
      assert(found.forall(_._3 <= 3))
    }
    // shuffle audit: the (band, bits) window/groupBy exchange is computed
    // once and REUSED by the star branch, so the plan carries the sig
    // shuffle + the final distinct only
    val plan = Dedup.simhashNearDup(docs, "text", "doc_id")
      .queryExecution.executedPlan
    val shuffles = collectPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.size <= 2, s"banding is one shuffle (+distinct): $shuffles")
  }

  test("simhashNearDup: over-cap template bucket degrades to a min-id star, not O(b^2)") {
    // one boilerplate template repeated n times: every fingerprint is
    // identical, so uncapped banding would materialize n(n-1)/2 pairs
    // (~4.5M at n=3000) inside ONE task; the capped path must emit the
    // n-1 star rows instead, and clustering must still see one component.
    val n = 3000
    val docs = spark.range(n).select($"id".as("doc_id"),
      lit("the same boilerplate template text crawled once per mirror site").as("text"))
    val pairs = Dedup.simhashNearDup(docs, "text", "doc_id", maxBucket = 64)
    val got = pairs.as[(Long, Long, Long)].collect()
    assert(got.length == n - 1, s"star must be O(b): got ${got.length} rows")
    assert(got.forall(p => p._1 == 0L && p._3 == 0L),
      "every star row hangs off the bucket min with Hamming 0")
    val cl = Dedup.clusters(pairs, "doc_id_a", "doc_id_b")
    assert(cl.count() == n &&
      cl.select($"cluster").distinct().as[Long].collect().toSeq == Seq(0L),
      "the star preserves the single boilerplate component")
  }

  test("nearDupCandidates: over-cap bucket emits a star with unchanged clusters; " +
      "capped == uncapped below the cap") {
    val n = 2000
    val template = spark.range(n).select($"id".as("doc_id"),
      lit("copy of the exact same navigation boilerplate on every page").as("text"))
    val capped = Dedup.nearDupCandidates(template, "text", "doc_id", maxBucket = 64)
    val got = capped.as[(Long, Long)].collect()
    assert(got.length == n - 1, s"star must be O(b): got ${got.length} rows")
    assert(got.forall(_._1 == 0L))
    val cl = Dedup.clusters(capped, "doc_id_a", "doc_id_b")
    assert(cl.count() == n &&
      cl.select($"cluster").distinct().as[Long].collect().toSeq == Seq(0L))
    // below the cap the guarded path is bit-identical to full expansion
    val docs = Tables.load(spark, sf(), "documents")
    val small = Dedup.nearDupCandidates(docs, "text", "doc_id")
    val unlimited = Dedup.nearDupCandidates(docs, "text", "doc_id",
      maxBucket = Int.MaxValue)
    assert(small.exceptAll(unlimited).isEmpty && unlimited.exceptAll(small).isEmpty)
  }

  test("lshNearDup: within-cap pairing is exhaustive; over-cap bucket stars") {
    val emb = Tables.load(spark, sf(), "embeddings").limit(200)
    // exhaustive within buckets: every returned pair shares a bucket and
    // clears the cosine cut, and every in-bucket pair clearing the cut is
    // returned
    val out = Similarity.lshNearDup(emb, "vec_id", "embedding",
        bits = 4, minCos = -2.0) // cut disabled: bucket membership only
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val bucketed = emb.select($"vec_id",
        graft.functions.Vectors.signBucket($"embedding", 4).as("b"))
      .as[(Long, String)].collect()
    val brute = (for {
      i <- bucketed.indices; j <- bucketed.indices
      if i != j && bucketed(i)._2 == bucketed(j)._2
      a = math.min(bucketed(i)._1, bucketed(j)._1)
      b = math.max(bucketed(i)._1, bucketed(j)._1)
    } yield (a, b)).toSet
    assert(out == brute, "in-bucket pairing must be exhaustive within the cap")
    // over-cap: identical embeddings all land in one bucket -> star
    val n = 1500
    val dup = spark.range(n).select($"id".as("vec_id"),
      array((0 until 8).map(i => lit(0.1f * (i + 1))): _*).as("embedding"))
    val starred = Similarity.lshNearDup(dup, "vec_id", "embedding",
      bits = 4, minCos = 0.5, maxBucket = 32)
    val rows = starred.as[(Long, Long, Double)].collect()
    assert(rows.length == n - 1, s"star must be O(b): got ${rows.length}")
    assert(rows.forall(r => r._1 == 0L && r._3 > 0.999))
  }

  test("lshNearDup: AutoBits default == explicit bits at the size the " +
      "formula selects (the last fixed-geometry door, round-12 close)") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val n = emb.count()
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val expected = Similarity.autoBits(n, dim, tables = 1)
    val auto = Similarity.lshNearDup(emb, "vec_id", "embedding")
      .as[(Long, Long, Double)].collect().toSet
    val explicitBits = Similarity.lshNearDup(emb, "vec_id", "embedding",
        bits = expected)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == explicitBits,
      s"auto geometry must resolve to $expected bits and match the " +
        "explicit run bit-for-bit")
    // the DERIVED-embedding door's raw-space OPT-OUT still sizes by
    // measurement: centered=false + SkewAwareBits equals the explicitly
    // skew-aware-resolved raw run (the pre-r13 default, kept reachable)
    val docs = Tables.load(spark, sf(), "documents").limit(300)
    val proj = DocEmbed.hashedProjection(docs, "text", "doc_id")
      .localCheckpoint()
    val pBits = Similarity.autoBitsSkewAware(proj, "doc_id", "embedding",
      tables = 1)
    val keptRaw = DocEmbed.pruneNearDups(docs, "text", "doc_id",
      minCos = 0.95, bits = Similarity.SkewAwareBits, centered = false)
      .select($"doc_id").as[Long].collect().toSet
    val keptExplicit = DocEmbed.pruneNearDups(docs, "text", "doc_id",
      minCos = 0.95, bits = pBits, centered = false)
      .select($"doc_id").as[Long].collect().toSet
    assert(keptRaw == keptExplicit)
  }

  test("pruneNearDups centered DEFAULT == the explicit centered recipe, " +
      "and centered candidate recall >= raw at formula bits vs the " +
      "exact all-pairs truth") {
    val docs = Tables.load(spark, sf(), "documents").limit(300)
    // default == composition: hashedProjection -> corpusCenter ->
    // centered-bucket lshNearDup at formula bits -> clusters -> anti-join
    val kept = DocEmbed.pruneNearDups(docs, "text", "doc_id", minCos = 0.9)
      .select($"doc_id").as[Long].collect().toSet
    val proj = DocEmbed.hashedProjection(docs, "text", "doc_id")
      .localCheckpoint()
    val ctr = Similarity.corpusCenter(proj, "doc_id", "embedding")
    val pairs = Similarity.lshNearDup(proj, "doc_id", "embedding",
      minCos = 0.9, center = ctr)
    val losers = Dedup.clusters(pairs, "doc_id_a", "doc_id_b")
      .where($"cluster" =!= $"node").select($"node".as("doc_id"))
    val want = docs.join(losers, Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == want, "default must BE the centered recipe")
    // the frontier differential: true pairs found vs candidate mass
    // paid, centered vs raw buckets at the same formula bits. Raw BoW
    // buckets are skewed — at equal bits they compare FAR more pairs
    // (one hot bucket), so raw recall can exceed centered recall here
    // by brute force; the measured dominance (SURVEY §6.1) is recall
    // PER CANDIDATE, and that is what the default must win on.
    def pairSet(center: Seq[Double]) =
      Similarity.lshNearDup(proj, "doc_id", "embedding",
          minCos = 0.9, center = center)
        .select($"doc_id_a", $"doc_id_b").as[(Long, Long)].collect().toSet
    val n = docs.count()
    val dim = proj.select(size($"embedding")).head().getInt(0)
    val fb = Similarity.autoBits(n, dim, tables = 1)
    def mass(bucket: org.apache.spark.sql.Column): Long =
      proj.groupBy(bucket.as("b")).agg(count(lit(1)).as("n"))
        .agg(sum($"n" * ($"n" - 1)).cast("long")).head().getLong(0) / 2
    val centeredMass = mass(
      graft.functions.Vectors.signBucketCenteredAt($"embedding", fb, 0, ctr))
    val rawMass = mass(graft.functions.Vectors.signBucket($"embedding", fb))
    val centeredPairs = pairSet(ctr)
    val rawPairs = pairSet(Nil)
    val a = proj.toDF("ida", "ea")
    val b = proj.toDF("idb", "eb")
    val exact = a.join(b, $"ida" < $"idb")
      .select($"ida", $"idb",
        graft.functions.Vectors.cosine($"ea", $"eb").as("cos"))
      .filter($"cos" >= 0.9)
      .select($"ida", $"idb").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "threshold must bite on the fixture")
    assert(centeredPairs.subsetOf(exact) && rawPairs.subsetOf(exact),
      "bucketing only loses pairs, never invents them")
    val centeredRpc = centeredPairs.size.toDouble / centeredMass
    val rawRpc = rawPairs.size.toDouble / rawMass
    assert(centeredMass < rawMass,
      s"centering must de-skew the buckets: $centeredMass !< $rawMass")
    assert(centeredRpc >= rawRpc,
      f"centered recall-per-candidate $centeredRpc%.5f " +
        f"(${centeredPairs.size}/$centeredMass) < raw $rawRpc%.5f " +
        f"(${rawPairs.size}/$rawMass) at $fb formula bits")
  }

  test("skew-aware sizing on an IRREDUCIBLE corpus: identical vectors " +
      "can't be split by any geometry — terminate at the clamp, star " +
      "guard still bounds the work") {
    val n = 1500
    val dup = spark.range(n).select($"id".as("vec_id"),
      array((0 until 8).map(i => lit(0.1f * (i + 1))): _*).as("embedding"))
    // no bits value separates identical sign patterns: the measurement
    // must walk to the clamp (dim/tables = 8) and stop, not loop
    val bits = Similarity.autoBitsSkewAware(dup, "vec_id", "embedding",
      tables = 1)
    assert(bits === 8, s"must stop at the dim clamp: $bits")
    // and the operator at the skew-aware default still degrades to the
    // O(b) min-id star, never the O(b^2) expansion
    val rows = Similarity.lshNearDup(dup, "vec_id", "embedding",
        bits = Similarity.SkewAwareBits, minCos = 0.5, maxBucket = 32)
      .as[(Long, Long, Double)].collect()
    assert(rows.length == n - 1 && rows.forall(_._1 == 0L))
  }

  test("pqEncode: hand-computed codes, ties to smaller code, zero shuffles") {
    // 4-dim vectors, m=2 subspaces of 2 dims, k=2 codes per subspace
    val cb = Seq(
      (0, 0, Seq(0.0, 0.0)), (0, 1, Seq(10.0, 0.0)),
      (1, 0, Seq(0.0, 5.0)), (1, 1, Seq(0.0, -5.0))
    ).toDF("subspace", "code", "vector")
    val corpus = Seq(
      (1L, Seq(9.0, 0.0, 0.0, 4.0)),   // sub0 -> code 1, sub1 -> code 0
      (2L, Seq(1.0, 0.0, 0.0, -4.0)),  // sub0 -> code 0, sub1 -> code 1
      (3L, Seq(5.0, 0.0, 0.0, 0.0))    // sub0 equidistant -> smaller code 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqEncode(corpus, cb, "embedding")
    val m = out.select($"vec_id", $"pq_codes").as[(Long, Seq[Int])]
      .collect().toMap
    assert(m(1L) == Seq(1, 0) && m(2L) == Seq(0, 1) && m(3L) == Seq(0, 0))
    // uncodable embeddings (null / NaN-poisoned) null the whole code
    // array (log-and-null) instead of leaking the -1 fold sentinel
    val weird = Seq(
      (8L, null.asInstanceOf[Seq[Double]]),
      (9L, Seq(Double.NaN, 1.0, 1.0, 1.0))
    ).toDF("vec_id", "embedding")
    val mw = Similarity.pqEncode(weird, cb, "embedding")
      .select($"vec_id", $"pq_codes").as[(Long, Seq[Int])].collect().toMap
    assert(mw(8L) == null && mw(9L) == null, s"expected null codes: $mw")
    val shuffles = collectPlan(out.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, s"PQ encode must be narrow: $shuffles")
  }

  test("pqEncode kernel == literal-fold witness (fixtures + poison rows)") {
    val e = Tables.load(spark, sf(), "embeddings")
    val cb = (0 until 4).map { sub =>
      e.filter($"vec_id" < 8).select(lit(sub).as("subspace"),
        $"vec_id".cast("int").as("code"),
        slice($"embedding", sub * 16 + 1, 16).as("vector"))
    }.reduce(_ unionByName _)
    val poison = Seq(
      (90001L, null.asInstanceOf[Seq[Double]]),
      (90002L, Seq(Double.NaN, 1.0, 1.0, 1.0)),
      (90003L, Seq(0.5, 0.25))  // shorter than one subspace
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val corpus = e.select($"vec_id", $"embedding").unionByName(poison)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"pq_codes").as[(Long, Seq[Int])]
        .collect().sortBy(_._1).toSeq
    assert(snap(Similarity.pqEncode(corpus, cb, "embedding")) ==
      snap(Similarity.pqEncodeFold(corpus, cb, "embedding")),
      "native kernel must be bit-identical to the fold witness")
  }

  test("pqTrain: deterministic dense codebooks close the IVF-PQ loop end-to-end") {
    val e = Tables.load(spark, sf(), "embeddings")
    val cb = Similarity.pqTrain(e, "vec_id", "embedding", m = 4, k = 4, iterations = 2)
    val again = Similarity.pqTrain(e, "vec_id", "embedding", m = 4, k = 4, iterations = 2)
    assert(cb.count() == 16, "m x k codebook entries")
    assert(cb.exceptAll(again).isEmpty, "training must be deterministic")
    // dense 0..k-1 codes per subspace: pqEncode's collectCodebooks
    // REQUIRES this — consuming the trained frame directly proves it
    val coded = Similarity.pqEncode(e, cb, "embedding")
    assert(coded.filter($"pq_codes".isNull).count() == 0)
    // and the ADC search runs end-to-end on the trained codebooks
    val adc = Similarity.pqAdcTopK(e, cb, e.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 5)
    val per = adc.groupBy($"q_id").count().select($"count").as[Long].collect()
    assert(per.length == 3 && per.forall(_ == 5))
  }

  test("pqAdcTopK approximates brute-force neighbors on the fixtures") {
    val e = Tables.load(spark, sf(), "embeddings")
    val cb = (0 until 4).map { sub =>
      e.filter($"vec_id" < 8).select(lit(sub).as("subspace"),
        $"vec_id".cast("int").as("code"),
        slice($"embedding", sub * 16 + 1, 16).as("vector"))
    }.reduce(_ unionByName _)
    val qs = e.filter($"vec_id" < 5)
    val adc = Similarity.pqAdcTopK(e, cb, qs, "vec_id", "embedding", k = 10)
      .as[(Long, Long, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = Similarity.cosineTopK(e, qs, "vec_id", "embedding", k = 10)
      .select($"q_id", $"vec_id", $"cos")
      .as[(Long, Long, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // ADC is lossy (8 codes per subspace) and L2-vs-cosine differ, but
    // with queries drawn from the corpus the quantized neighbourhood
    // must still overlap the true one
    val recalls = adc.keys.toSeq.map(q => exact(q).intersect(adc(q)).size / 10.0)
    assert(adc.keySet == exact.keySet && recalls.sum / recalls.size > 0.2,
      s"mean ADC recall@10 too low: ${recalls.sum / recalls.size}")
  }

  test("pqAdcTopK survives uncodable corpus rows and queries (no crash, excluded)") {
    val e = Tables.load(spark, sf(), "embeddings")
    val cb = (0 until 4).map { sub =>
      e.filter($"vec_id" < 8).select(lit(sub).as("subspace"),
        $"vec_id".cast("int").as("code"),
        slice($"embedding", sub * 16 + 1, 16).as("vector"))
    }.reduce(_ unionByName _)
    val poison = Seq((90001L, null.asInstanceOf[Seq[Double]]))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val corpus = e.select($"vec_id", $"embedding").unionByName(poison)
    val qs = e.filter($"vec_id" < 3).select($"vec_id", $"embedding")
      .unionByName(poison)
    val out = Similarity.pqAdcTopK(corpus, cb, qs, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty, "the codable queries must still produce neighbors")
    assert(!out.exists(r => r._1 == 90001L || r._2 == 90001L),
      "uncodable rows must be excluded, not crash or rank")
  }

  test("ivfPqTopK: full probe == pqAdcTopK; pruned probe stays k-bounded") {
    val e = Tables.load(spark, sf(), "embeddings")
    val cents = e.filter($"vec_id" < 16).select($"vec_id".as("c_id"), $"embedding")
    val cb = (0 until 4).map { sub =>
      e.filter($"vec_id" < 8).select(lit(sub).as("subspace"),
        $"vec_id".cast("int").as("code"),
        slice($"embedding", sub * 16 + 1, 16).as("vector"))
    }.reduce(_ unionByName _)
    val qs = e.filter($"vec_id" < 5)
    // probing every list must degenerate to the pure ADC scan
    val full = Similarity.ivfPqTopK(e, cents, cb, qs,
      "vec_id", "embedding", "c_id", k = 5, nProbe = 16)
    val adc = Similarity.pqAdcTopK(e, cb, qs, "vec_id", "embedding", k = 5)
    assert(full.exceptAll(adc).isEmpty && adc.exceptAll(full).isEmpty,
      "nProbe = |lists| must equal the unpruned ADC ranking")
    val pruned = Similarity.ivfPqTopK(e, cents, cb, qs,
      "vec_id", "embedding", "c_id", k = 5, nProbe = 4)
    val per = pruned.groupBy($"q_id").count().select($"count").as[Long].collect()
    assert(per.length == 5 && per.forall(_ <= 5))
  }

  test("projectedTopK: candidates == corpus degenerates to exact; sane recall pruned") {
    val e = Tables.load(spark, sf(), "embeddings")
    val qs = e.filter($"vec_id" < 5)
    val n = e.count().toInt
    // candidate pool = whole corpus -> stage 2 re-ranks everything ->
    // must equal the exact brute force
    val full = Similarity.projectedTopK(e, qs, "vec_id", "embedding",
      dim = 64, reducedDim = 16, k = 5, candidates = n)
    val brute = Similarity.cosineTopK(e, qs, "vec_id", "embedding", k = 5)
      .select($"q_id", $"vec_id", $"cos")
    assert(full.exceptAll(brute).isEmpty && brute.exceptAll(full).isEmpty)
    // pruned pool: k-bounded output and most true neighbors survive
    val pruned = Similarity.projectedTopK(e, qs, "vec_id", "embedding",
      dim = 64, reducedDim = 16, k = 5, candidates = 20)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val per = pruned.groupBy($"q_id").count().select($"count").as[Long].collect()
    assert(per.length == 5 && per.forall(_ <= 5))
    val recall = key(pruned).intersect(key(brute)).size.toDouble / key(brute).size
    assert(recall >= 0.3, f"projected recall@5 collapsed to $recall%.2f")
  }

  test("nearDupVerified: verified pairs are candidate pairs with correct exact Jaccard") {
    import org.apache.spark.sql.functions.col
    val df = Tables.load(spark, sf(), "documents")
    val cands = Dedup.nearDupCandidates(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.nearDupVerified(df, "text", "doc_id", minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(verified.keySet == cands,
      "at threshold 0 every candidate must survive with a score")
    // independent witness: recompute Jaccard from raw distinct gram sets
    val grams = df.select(col("doc_id"),
      org.apache.spark.sql.functions.array_distinct(
        graft.functions.Text.shingles(graft.functions.Text.tokens(col("text")), 5)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    verified.foreach { case ((a, b), j) =>
      val expect = grams(a).intersect(grams(b)).size.toDouble /
        grams(a).union(grams(b)).size
      assert(j == expect, s"pair ($a,$b)")
    }
    // a real threshold strictly filters
    val strict = Dedup.nearDupVerified(df, "text", "doc_id", minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict.subsetOf(cands))
    assert(strict == verified.filter(_._2 >= 0.4).keySet)
  }
}
