package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.BloomSketch
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.functions._

/** Incremental / cross-snapshot dedup: the bloom pre-screen has no false
  * negatives and merges associatively; `againstCorpus` is exact with and
  * without the bloom; and — the 100 TB property — probing a bucketed
  * fingerprint store never shuffles (or broadcasts) the store side. */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private val bits = 4096
  private val hashes = 4

  test("bloom sketch: no false negatives, regardless of partitioning") {
    val items = (0 until 500).map(i => s"item_$i")
    val words = items.toDF("x").repartition(7)
      .agg(BloomSketch.bloom($"x", bits, hashes)).head.getSeq[Long](0)
    val probed = items.toDF("x")
      .select(BloomSketch.mightContain($"x", words, bits, hashes).as("hit"))
      .where(!$"hit").count()
    assert(probed == 0, "an inserted item can never probe negative")
  }

  test("bloom sketch: merge == build-over-union (word-wise OR)") {
    val a = (0 until 200).map(i => s"a_$i").toDF("x")
    val b = (0 until 200).map(i => s"b_$i").toDF("x")
    val merged = a.union(b).repartition(5)
      .agg(BloomSketch.bloom($"x", bits, hashes)).head.getSeq[Long](0)
    val wa = a.agg(BloomSketch.bloom($"x", bits, hashes)).head.getSeq[Long](0)
    val wb = b.agg(BloomSketch.bloom($"x", bits, hashes)).head.getSeq[Long](0)
    val ored = wa.zip(wb).map { case (x, y) => x | y }
    assert(merged == ored, "partition merge must be exactly word-wise OR")
  }

  test("bloom sketch: false-positive rate is in the designed ballpark") {
    // n = 400 items in m = 4096 bits, k = 4: (1 - e^(-kn/m))^4 ~ 10%.
    // Novel probes must mostly miss — the pre-screen's whole value.
    val words = (0 until 400).map(i => s"known_$i").toDF("x")
      .agg(BloomSketch.bloom($"x", bits, hashes)).head.getSeq[Long](0)
    val fp = (0 until 1000).map(i => s"novel_$i").toDF("x")
      .select(BloomSketch.mightContain($"x", words, bits, hashes).as("hit"))
      .where($"hit").count()
    assert(fp < 300, s"false-positive tail out of control: $fp / 1000")
    assert(words.exists(_ != 0L), "filter must actually have bits set")
  }

  test("againstCorpus admits exactly the novel minority, all columns intact") {
    val corpus = Seq(
      (1L, "alpha beta gamma", "keep"),
      (2L, "delta epsilon", "keep")).toDF("doc_id", "text", "tag")
    val batch = Seq(
      (10L, "Alpha  beta GAMMA", "a"), // corpus dup modulo normalization
      (11L, "zeta eta", "b"),          // novel
      (12L, "zeta eta", "c"),          // in-batch dup of 11 (loses: higher id)
      (13L, "delta epsilon", "d"),     // corpus dup
      (14L, "theta iota", "e")).toDF("doc_id", "text", "tag")
    val store = Dedup.fingerprintStore(corpus, "text")
    val got = Dedup.againstCorpus(batch, store, "text", "doc_id", bloomBits = bits)
      .select($"doc_id", $"tag").as[(Long, String)].collect().toSet
    assert(got == Set((11L, "b"), (14L, "e")))
  }

  test("bloom path == join-only path (bloomBits <= 0) on real documents") {
    val d = Tables.load(spark, sf(), "documents")
    val corpus = d.filter($"doc_id" % 3 =!= 0)
    val batch = d.filter($"doc_id" % 3 === 0)
      .unionByName(corpus.limit(40)) // guaranteed cross-snapshot dups
    val store = Dedup.fingerprintStore(corpus, "text")
    val bloomed = Dedup.againstCorpus(batch, store, "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val joined = Dedup.againstCorpus(batch, store, "text", "doc_id", bloomBits = 0)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(bloomed == joined && bloomed.nonEmpty,
      "the pre-screen must be invisible in the result")
  }

  test("bloom auto-sizing: bitsPerKey mode == manual at the computed size; over-budget disables") {
    val d = Tables.load(spark, sf(), "documents")
    val corpus = d.filter($"doc_id" % 3 =!= 0)
    val batch = d.filter($"doc_id" % 3 === 0).unionByName(corpus.limit(40))
    val store = Dedup.fingerprintStore(corpus, "text")
    val n = store.count()
    // the sizing rule itself: bits = n * bitsPerKey, floored at 64,
    // disabled (0) past the plan-literal budget
    val computed = Dedup.autoBloomBits(store, "fp", bitsPerKey = 10)
    assert(computed == math.max(64L, n * 10).toInt, s"n=$n computed=$computed")
    assert(Dedup.autoBloomBits(store, "fp", 10, maxBits = computed - 1) == 0,
      "past the budget the pre-screen disables rather than shrink")
    // auto == manual at the computed size, and == the join-only answer
    // (the screen is invisible in the result at ANY sizing)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select($"doc_id").as[Long].collect().sorted.toSeq
    val auto = ids(Dedup.againstCorpus(batch, store, "text", "doc_id",
      bloomBitsPerKey = 10))
    val manual = ids(Dedup.againstCorpus(batch, store, "text", "doc_id",
      bloomBits = computed))
    val disabled = ids(Dedup.againstCorpus(batch, store, "text", "doc_id",
      bloomBitsPerKey = 10, maxBloomBits = 64))
    assert(auto == manual && auto == disabled && auto.nonEmpty)
  }

  test("bucketed store probes with ZERO exchanges on the store side") {
    val d = Tables.load(spark, sf(), "documents")
    Dedup.writeFingerprintStore(d.filter($"doc_id" % 3 =!= 0), "text",
      "fp_store_spec", buckets = 8)
    try {
      val batch = d.filter($"doc_id" % 3 === 0).unionByName(d.limit(40))
      // merge hint: at spec scale Spark would broadcast the store and hide
      // the property under test — at corpus scale broadcast is impossible
      // and SMJ-over-buckets is the plan this pin protects
      val got = Dedup.againstCorpus(batch, spark.table("fp_store_spec").hint("merge"),
        "text", "doc_id")
      got.collect() // run under AQE so the final plan is the real one
      val joins = collectPlan(got.queryExecution.executedPlan) {
        case j if j.nodeName.contains("SortMergeJoin") => j
      }
      assert(joins.nonEmpty, "expected the anti-join to plan as SMJ")
      val storeSide = joins.flatMap(j => j.children.lastOption)
      val exchanges = storeSide.flatMap(_.collect {
        case e: ShuffleExchangeLike => e
        case e: BroadcastExchangeLike => e
      })
      assert(exchanges.isEmpty,
        s"the shipped corpus must never re-shuffle at probe time: $exchanges")
    } finally spark.sql("DROP TABLE IF EXISTS fp_store_spec")
  }

  test("nearDupsAgainstCorpus: store collisions drop, novel batch self-dedups") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // shares the corpus doc's leading shingles -> at least one band
      // collides -> dropped WITHOUT reading corpus text
      (10L, "alpha beta gamma delta epsilon zeta eta iota"),
      // novel template + its exact in-batch copy: min id survives
      (11L, "one two three four five six seven eight"),
      (12L, "one two three four five six seven eight"),
      // token-less: no signatures, admitted (gate on quality, not shape)
      (13L, ""),
      (14L, "a completely different ninth tenth eleventh twelfth sentence"))
      .toDF("doc_id", "text")
    val store = Dedup.signatureStore(corpus, "text")
    val got = Dedup.nearDupsAgainstCorpus(batch, store, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 13L, 14L), s"got $got")
  }

  test("bucketed signature store probes with zero exchanges on the store side") {
    val d = Tables.load(spark, sf(), "documents")
    Dedup.writeSignatureStore(d.filter($"doc_id" % 10 =!= 0), "text",
      "sig_store_spec", buckets = 8)
    try {
      val batch = d.filter($"doc_id" % 10 === 0)
      // the probe STAGE (the composed operator checkpoints it, which
      // would hide its plan): batch sigs vs the bucketed store
      val got = Dedup.storeCollisions(batch,
        spark.table("sig_store_spec").hint("merge"), "text", "doc_id", 5, 4)
      got.collect()
      val joins = collectPlan(got.queryExecution.executedPlan) {
        case j if j.nodeName.contains("SortMergeJoin") => j
      }
      assert(joins.nonEmpty, "expected the collision join to plan as SMJ")
      // the store side is the RIGHT child of the (band, sig) join — find
      // the join whose right subtree scans the bucketed table and assert
      // no exchange sits between them
      val storeJoins = joins.filter(_.children.last.collectLeaves().exists(
        _.toString.contains("sig_store_spec")))
      assert(storeJoins.nonEmpty, "expected a join probing the store table")
      val exchanges = storeJoins.flatMap(_.children.last.collect {
        case e: ShuffleExchangeLike => e
        case e: BroadcastExchangeLike => e
      })
      assert(exchanges.isEmpty,
        s"the signature store must never re-shuffle at probe time: $exchanges")
    } finally spark.sql("DROP TABLE IF EXISTS sig_store_spec")
  }

  test("ingest rounds are idempotent: commit admitted fps, re-ingest admits nothing") {
    val d = Tables.load(spark, sf(), "documents")
    Dedup.writeFingerprintStore(d.filter($"doc_id" < 300), "text",
      "fp_store_rounds", buckets = 4)
    try {
      val snap1 = d.filter($"doc_id" >= 300 && $"doc_id" < 400)
      val admitted1 = Dedup.againstCorpus(snap1,
        spark.table("fp_store_rounds"), "text", "doc_id", bloomBits = 1 << 12)
      assert(admitted1.count() == 100L, "all of snapshot 1 is novel")
      Dedup.appendToFingerprintStore(admitted1, "text", "fp_store_rounds")

      // exact re-delivery of snapshot 1: the committed store rejects it
      val replay = Dedup.againstCorpus(snap1,
        spark.table("fp_store_rounds"), "text", "doc_id", bloomBits = 1 << 12)
      assert(replay.count() == 0L, "re-ingesting a committed snapshot is a no-op")

      // a mixed third snapshot: half replayed, half genuinely new
      val snap2 = snap1.unionByName(d.filter($"doc_id" >= 400 && $"doc_id" < 450))
      val admitted2 = Dedup.againstCorpus(snap2,
          spark.table("fp_store_rounds"), "text", "doc_id", bloomBits = 1 << 12)
        .select($"doc_id").as[Long].collect().toSet
      assert(admitted2 == (400L until 450L).toSet,
        s"only the genuinely new half lands: ${admitted2.size}")
      // the committed table keeps its bucketed layout (still probe-ready)
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("fp_store_rounds"))
      assert(meta.bucketSpec.exists(_.numBuckets == 4))
      // a crash-retry double-commit of the same snapshot is a no-op too:
      // the store stays distinct
      Dedup.appendToFingerprintStore(admitted1, "text", "fp_store_rounds")
      val st = spark.table("fp_store_rounds")
      assert(st.count() == st.distinct().count(),
        "double-committing must not seed duplicate fingerprints")
    } finally spark.sql("DROP TABLE IF EXISTS fp_store_rounds")
  }

  test("signature-store commits make same-shaped re-crawls a no-op") {
    val d = Tables.load(spark, sf(), "documents")
    Dedup.writeSignatureStore(d.filter($"doc_id" < 300), "text",
      "sig_store_rounds", buckets = 4)
    try {
      val snap = d.filter($"doc_id" >= 300 && $"doc_id" < 360)
      val admitted = Dedup.nearDupsAgainstCorpus(snap,
        spark.table("sig_store_rounds"), "text", "doc_id")
      val n1 = admitted.count()
      assert(n1 > 0, "the snapshot must contain novel shapes")
      Dedup.appendToSignatureStore(admitted, "text", "sig_store_rounds")
      // a REWORDED re-crawl of the committed snapshot (new fingerprints,
      // shared leading shingles) is rejected wholesale
      val reworded = admitted.select(($"doc_id" + 90000).as("doc_id"),
        concat($"text", lit(" trailing republish marker")).as("text"))
      val replay = Dedup.nearDupsAgainstCorpus(reworded,
        spark.table("sig_store_rounds"), "text", "doc_id")
      assert(replay.count() == 0L,
        "a same-shaped re-crawl must drop at the committed signature store")
      // store stays distinct on (band, sig) after the append
      val st = spark.table("sig_store_rounds")
      assert(st.count() == st.distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS sig_store_rounds")
  }

  test("simhash star-path elision is observable via the named metric") {
    // 60 identical docs (one over-cap bucket at maxBucket = 8): all
    // non-min members route through the star; none are beyond the
    // Hamming budget, so elided must read 0 — the "guard was free" case.
    val docs = (0 until 60).map(i => (i.toLong, "same text every time"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDup(docs, "text", "doc_id", maxBucket = 8)
    // collect() (not count()) so the metric lands on THIS QueryExecution
    assert(pairs.collect().length == 59)
    val metrics = pairs.queryExecution.observedMetrics
      .collect { case (k, v) if k.startsWith("graft_simhash_star_") => v }
    assert(metrics.nonEmpty, "the star metric must be attached to the plan")
    val m = metrics.head
    assert(m.getAs[Long]("star_rows") > 0L, "over-cap bucket must use the star")
    assert(m.getAs[Long]("elided") == 0L,
      "identical docs are within any Hamming budget of their bucket min")
  }
}
