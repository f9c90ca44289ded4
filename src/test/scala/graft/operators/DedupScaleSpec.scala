package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial-scale shapes for the dedup pipeline: a boilerplate
  * template shared by tens of thousands of documents (the web-crawl
  * common case that makes unguarded LSH banding quadratic) must flow
  * through candidate generation, clustering, AND the one-call pruning
  * at O(b) — and a paragraph duplicated across thousands of documents
  * must come out of exact-substring dedup exactly once. */
class DedupScaleSpec extends SparkSpec {
  import spark.implicits._

  test("pruneNearDups: 20k-copy template collapses to one winner at star cost") {
    val n = 20000L
    val template = spark.range(n).select($"id".as("doc_id"),
      lit("identical mirror boilerplate page served for every request path").as("text"))
    // every token carries the id, so every shingle is globally unique —
    // no accidental near-dup structure among the "uniques"
    val uniques = spark.range(n, n + 500).select($"id".as("doc_id"),
      concat_ws(" ", (0 until 10).map(k =>
        concat(lit(s"t${k}x"), $"id")): _*).as("text"))
    val kept = Dedup.pruneNearDups(template.unionByName(uniques), "text", "doc_id")
    val ids = kept.select($"doc_id").as[Long].collect().toSet
    assert(ids.size == 501, s"expected 1 template winner + 500 uniques, got ${ids.size}")
    assert(ids.contains(0L), "the min-id template copy is the canonical winner")
    assert((n until n + 500).forall(ids.contains), "uniques must all survive")
  }

  test("incremental: a 20k-copy re-crawl collapses against both stores at O(b)") {
    // the shipped corpus knows one template; the "new snapshot" is 20k
    // re-crawls of it plus 200 genuinely new docs. Exact incremental
    // dedup must admit only the 200 (the 20k share one fingerprint —
    // the spillable in-batch window plus one anti-join row), and
    // near-dup incremental must do the same when the copies are
    // slightly reworded (distinct fingerprints, colliding band sigs).
    val n = 20000L
    val corpus = Seq((0L, "identical mirror boilerplate page served for every request path"))
      .toDF("doc_id", "text")
    val exactCopies = spark.range(1, n).select($"id".as("doc_id"),
      lit("identical mirror boilerplate page served for every request path").as("text"))
    val fresh = spark.range(n, n + 200).select($"id".as("doc_id"),
      concat_ws(" ", (0 until 10).map(k =>
        concat(lit(s"f${k}x"), $"id")): _*).as("text"))

    val exactAdmitted = Dedup.againstCorpus(
        exactCopies.unionByName(fresh),
        Dedup.fingerprintStore(corpus, "text"), "text", "doc_id",
        bloomBits = 1 << 12)
      .select($"doc_id").as[Long].collect().toSet
    assert(exactAdmitted == (n until n + 200).toSet,
      s"every re-crawl must drop, every fresh doc must land: ${exactAdmitted.size}")

    // reworded copies: append a doc-specific token — new fingerprint,
    // but the leading shingles (and so at least one band min) survive
    val reworded = spark.range(1, n).select($"id".as("doc_id"),
      concat(lit("identical mirror boilerplate page served for every request path tail"),
        $"id".cast("string")).as("text"))
    val nearAdmitted = Dedup.nearDupsAgainstCorpus(
        reworded.unionByName(fresh),
        Dedup.signatureStore(corpus, "text"), "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(nearAdmitted == (n until n + 200).toSet,
      s"reworded re-crawls must drop at the signature store: ${nearAdmitted.size}")
  }

  test("removeDupSpans: a paragraph shared by 4k documents survives exactly once") {
    val para = (0 until 12).map(i => s"shared$i").mkString(" ")
    val docs = spark.range(4000).select($"id".as("doc_id"),
      concat(lit("intro" + " filler" * 3 + " "), lit(para),
        lit(" outro"), $"id".cast("string")).as("text"))
    val out = Spans.removeDupSpans(docs, "text", "doc_id", w = 10)
    // the shared 12-token paragraph: doc 0 keeps it, all others lose the
    // covered positions; every document's own intro/outro tokens survive
    val counts = out.groupBy($"n_kept").count()
      .as[(Long, Long)].collect().toMap
    val full = out.filter($"doc_id" === 0).select($"n_kept").as[Long].head()
    assert(full == out.select(max($"n_tokens")).as[Long].head(),
      "the canonical doc keeps every token")
    assert(counts(full) == 1L, "exactly one document keeps the full paragraph")
    assert(out.filter($"clean_text".contains("shared0 shared1")).count() == 1,
      "the paragraph text itself survives exactly once")
    assert(out.filter(!$"clean_text".contains("outro")).count() == 0,
      "per-document unique tails all survive")
  }
}
