package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Incremental search index: append-then-search == build-from-scratch,
  * commits are idempotent under crash-retry, a query reads only its
  * terms' buckets (bucket pruning), and the table path equals the pure
  * frames path. */
class SearchStoreSpec extends SparkSpec {

  import spark.implicits._

  test("append-then-search == from-scratch; double-commit == single; buckets pruned") {
    val d = Tables.load(spark, sf(), "documents").select($"doc_id", $"text")
    val corpus = d.filter($"doc_id" % 3 =!= 0)
    val batch = d.filter($"doc_id" % 3 === 0)
    val terms = d.select(explode(graft.functions.Text.tokens($"text")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"t").limit(4)
      .as[(String, Long)].collect().map(_._1).toSeq

    SearchStore.write(corpus, "text", "doc_id", "ss_spec", buckets = 8)
    try {
      SearchStore.append(batch, "text", "doc_id", "ss_spec")
      val viaStore = SearchStore.search(spark, "ss_spec", terms, k = 15)
        .as[(Long, Double, Long)].collect().toSeq
      // the pure-frames twin over the full corpus (what q119 pins to SQL)
      val viaFrames = SearchStore.searchFrames(
          SearchStore.postings(d, "text", "doc_id"),
          SearchStore.docLengths(d, "text", "doc_id"), terms, k = 15)
        .as[(Long, Double, Long)].collect().toSeq
      assert(viaStore == viaFrames,
        s"store after append must score like the full corpus\n$viaStore\n$viaFrames")

      // crash-retry: the same commit again changes nothing
      val before = (spark.table("ss_spec_postings").count(),
        spark.table("ss_spec_docs").count())
      SearchStore.append(batch, "text", "doc_id", "ss_spec")
      assert((spark.table("ss_spec_postings").count(),
        spark.table("ss_spec_docs").count()) == before,
        "double-commit must not double term frequencies")
      assert(SearchStore.search(spark, "ss_spec", terms, k = 15)
        .as[(Long, Double, Long)].collect().toSeq == viaStore)

      // the search plan reads only the query terms' buckets of the
      // postings table (pruning shows on the scan the real query runs —
      // a bare probe would be un-bucketed by DisableUnnecessaryBucketedScan)
      val q = SearchStore.search(spark, "ss_spec", terms, k = 15)
      q.collect()
      val scans = collectPlan(q.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("ss_spec_postings")) => f
      }
      val selected = scans.flatMap(_.metadata.get("SelectedBucketsCount"))
      assert(selected.exists(_.matches(".*\\b[1-4] out of 8.*")),
        s"query terms must prune to their own buckets: " +
          s"$selected / ${scans.map(_.metadata)}")
      // BM25 never pays for the positional column: the scoring scan's
      // read schema must exclude `positions` (parquet column pruning)
      val readSchemas = scans.flatMap(_.metadata.get("ReadSchema"))
      assert(readSchemas.nonEmpty && readSchemas.forall(!_.contains("positions")),
        s"BM25 path must prune the positions column: $readSchemas")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ss_spec_postings")
      spark.sql("DROP TABLE IF EXISTS ss_spec_docs")
      spark.sql("DROP TABLE IF EXISTS ss_spec_termstats")
    }
  }

  test("postings carry sorted 0-based positions; tf == their count") {
    val df = Seq((1L, "a b a c a"), (2L, "b b"), (3L, "")).toDF("doc_id", "text")
    val got = SearchStore.postings(df, "text", "doc_id")
      .as[(String, Long, Long, Long, Seq[Int])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("a", 1L)) == ((3L, 5L, Seq(0, 2, 4))))
    assert(got(("b", 1L)) == ((1L, 5L, Seq(1))))
    assert(got(("c", 1L)) == ((1L, 5L, Seq(3))))
    assert(got(("b", 2L)) == ((2L, 2L, Seq(0, 1))))
    assert(!got.keySet.exists(_._2 == 3L), "token-less doc has no postings")
  }

  test("phrase search: hand-computed matches, overlaps, repeated tokens, ranking") {
    val df = Seq(
      (1L, "x a b y a b"),   // "a b" twice
      (2L, "a b c"),          // once; "a b c" once
      (3L, "a a a"),          // "a a" overlapping: starts 0,1
      (4L, "b a"),            // wrong order -> no match
      (5L, "a c b")           // both tokens, not adjacent -> no match
    ).toDF("doc_id", "text")
    val p = SearchStore.postings(df, "text", "doc_id")
    def run(phrase: Seq[String]) =
      SearchStore.phraseSearchFrames(p, phrase, k = 10)
        .as[(Long, Long)].collect().toSeq
    assert(run(Seq("a", "b")) == Seq((1L, 2L), (2L, 1L)))
    assert(run(Seq("a", "a")) == Seq((3L, 2L)), "overlapping matches count")
    assert(run(Seq("a", "b", "c")) == Seq((2L, 1L)))
    assert(run(Seq("a", "a", "a")) == Seq((3L, 1L)))
    assert(run(Seq("z", "a")).isEmpty, "absent token -> no rows")
    assert(run(Seq("c")) == Seq((2L, 1L), (5L, 1L)), "single-token phrase")
  }

  test("phrase search over the store == pure frames; probe is bucket-pruned") {
    val d = Tables.load(spark, sf(), "documents").select($"doc_id", $"text")
    val corpus = d.filter($"doc_id" % 3 =!= 0)
    val batch = d.filter($"doc_id" % 3 === 0)
    SearchStore.write(corpus, "text", "doc_id", "ss_ph", buckets = 8)
    try {
      SearchStore.append(batch, "text", "doc_id", "ss_ph")
      val phrase = Seq("table", "hash")
      val viaStore = SearchStore.phraseSearch(spark, "ss_ph", phrase, k = 15)
      val got = viaStore.as[(Long, Long)].collect().toSeq
      val want = SearchStore.phraseSearchFrames(
          SearchStore.postings(d, "text", "doc_id"), phrase, k = 15)
        .as[(Long, Long)].collect().toSeq
      assert(got == want, s"store phrase search must equal frames\n$got\n$want")
      assert(got.nonEmpty, "fixture phrase must actually occur")
      val scans = collectPlan(viaStore.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("ss_ph_postings")) => f
      }
      val selected = scans.flatMap(_.metadata.get("SelectedBucketsCount"))
      assert(selected.exists(_.matches(".*\\b[1-2] out of 8.*")),
        s"phrase terms must prune to their own buckets: $selected")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ss_ph_postings")
      spark.sql("DROP TABLE IF EXISTS ss_ph_docs")
      spark.sql("DROP TABLE IF EXISTS ss_ph_termstats")
    }
  }

  test("proximity search: hand-computed minimal cover spans, ranking, AND semantics") {
    val df = Seq(
      (1L, "a x x b x c"),      // one choice each: span = 6
      (2L, "c b a"),            // adjacent in any order: span = 3
      (3L, "a x b x x a c a"),  // a:{0,5,7} b:{2} c:{6}: best choice (5,2,6) -> span 5
      (4L, "a b"),              // missing 'c' -> excluded
      (5L, "c c c a b")         // a@3 b@4 c@2 -> span 3
    ).toDF("doc_id", "text")
    val p = SearchStore.postings(df, "text", "doc_id")
    val got = SearchStore.proximitySearchFrames(p, Seq("a", "b", "c"), k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 3L), (5L, 3L), (3L, 5L), (1L, 6L)), got.toString)
  }

  test("proximity search: single term, repeated occurrences, k cutoff") {
    val df = Seq((1L, "a x a"), (2L, "x a"), (3L, "b")).toDF("doc_id", "text")
    val p = SearchStore.postings(df, "text", "doc_id")
    // single term: every containing doc has span 1; ties break by id
    assert(SearchStore.proximitySearchFrames(p, Seq("a"), k = 10)
      .as[(Long, Long)].collect().toSeq == Seq((1L, 1L), (2L, 1L)))
    assert(SearchStore.proximitySearchFrames(p, Seq("a"), k = 1)
      .as[(Long, Long)].collect().toSeq == Seq((1L, 1L)))
  }

  test("proximity search over the store == frames; probe is bucket-pruned") {
    val d = Tables.load(spark, sf(), "documents").select($"doc_id", $"text")
    SearchStore.write(d, "text", "doc_id", "ss_px", buckets = 8)
    try {
      val terms = Seq("table", "hash", "scan")
      val viaStore = SearchStore.proximitySearch(spark, "ss_px", terms, k = 15)
      val got = viaStore.as[(Long, Long)].collect().toSeq
      val want = SearchStore.proximitySearchFrames(
          SearchStore.postings(d, "text", "doc_id"), terms, k = 15)
        .as[(Long, Long)].collect().toSeq
      assert(got == want, s"store proximity search must equal frames\n$got\n$want")
      assert(got.nonEmpty, "fixture terms must actually co-occur")
      val scans = collectPlan(viaStore.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("ss_px_postings")) => f
      }
      val selected = scans.flatMap(_.metadata.get("SelectedBucketsCount"))
      assert(selected.exists(_.matches(".*\\b[1-3] out of 8.*")),
        s"proximity terms must prune to their own buckets: $selected")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ss_px_postings")
      spark.sql("DROP TABLE IF EXISTS ss_px_docs")
      spark.sql("DROP TABLE IF EXISTS ss_px_termstats")
    }
  }

  test("ordered proximity: in-order chains only, minimal span, chain-start greed") {
    val df = Seq(
      (1L, "a x b x c"),        // in order: span 5
      (2L, "c b a"),            // only reverse order -> excluded
      (3L, "a b x a x b c"),    // best chain uses SECOND a,b: (3,5,6) -> 4
      (4L, "a c b c"),          // a<b but no c after b? c@3 > b@2: (0,2,3) -> 4
      (5L, "b a c")             // a@1 < c@2 but no b after a -> excluded
    ).toDF("doc_id", "text")
    val p = SearchStore.postings(df, "text", "doc_id")
    val got = SearchStore.orderedProximitySearchFrames(p, Seq("a", "b", "c"), k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 4L), (4L, 4L), (1L, 5L)), got.toString)
    // unordered proximity admits doc 2; ordered must not
    val unordered = SearchStore.proximitySearchFrames(p, Seq("a", "b", "c"), k = 10)
      .as[(Long, Long)].collect().toMap
    assert(unordered.contains(2L))
    // single term: ordered == unordered == span 1
    assert(SearchStore.orderedProximitySearchFrames(p, Seq("c"), k = 10)
      .as[(Long, Long)].collect().forall(_._2 == 1L))
    // adjacent in-order == phrase: span equals term count
    val phrase = Seq((7L, "x a b c y")).toDF("doc_id", "text")
    assert(SearchStore.orderedProximitySearchFrames(
        SearchStore.postings(phrase, "text", "doc_id"), Seq("a", "b", "c"), k = 1)
      .as[(Long, Long)].collect().toSeq == Seq((7L, 3L)))
  }

  test("max-score search == unpruned, prunes the stopword-only majority, falls back sanely") {
    // skewed fixture: 'rare' in 4 docs, 'stop' in all 40 — the WAND shape
    val docs = (1L to 40L).map { i =>
      val rare = if (i % 10 == 0) " rare" else ""
      (i, ("stop filler word" + rare + " tail") * (1 + (i % 3).toInt))
    }
    val df = docs.toDF("doc_id", "text")
    SearchStore.write(df, "text", "doc_id", "ss_ms", buckets = 4)
    try {
      val terms = Seq("rare", "stop")
      val k = 3 // <= 4 'rare' docs, so the threshold phase is active
      val pruned = SearchStore.maxScoreSearch(spark, "ss_ms", terms, k)
      val got = pruned.as[(Long, Double, Long)].collect().toSeq
      val want = SearchStore.search(spark, "ss_ms", terms, k)
        .as[(Long, Double, Long)].collect().toSeq
      assert(got == want, s"max-score must equal unpruned\n$got\n$want")
      // the pruning is real: far fewer docs reach exact scoring than
      // the 40 that match some term (4 seeds + few UB survivors)
      val metrics = pruned.queryExecution.observedMetrics
        .collect { case (name, row) if name.startsWith("graft_maxscore_") =>
          row.getAs[Long]("scored_docs") }
      assert(metrics.nonEmpty, "pruned path must run (not the fallback)")
      assert(metrics.head < 40,
        s"stopword-only docs must be pruned before scoring: ${metrics.head}")

      // k larger than the seed list -> fallback, still the exact answer
      val big = SearchStore.maxScoreSearch(spark, "ss_ms", terms, k = 10)
        .as[(Long, Double, Long)].collect().toSeq
      val bigWant = SearchStore.search(spark, "ss_ms", terms, k = 10)
        .as[(Long, Double, Long)].collect().toSeq
      assert(big == bigWant, "fallback path must equal unpruned")

      // ties at the boundary: every 10th doc repeats the same text, so
      // equal scores exist; id tiebreak must agree with unpruned
      val tied = SearchStore.maxScoreSearch(spark, "ss_ms", Seq("stop"), k = 5)
        .as[(Long, Double, Long)].collect().toSeq
      assert(tied == SearchStore.search(spark, "ss_ms", Seq("stop"), k = 5)
        .as[(Long, Double, Long)].collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ss_ms_postings")
      spark.sql("DROP TABLE IF EXISTS ss_ms_docs")
      spark.sql("DROP TABLE IF EXISTS ss_ms_termstats")
    }
  }
}
