package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus data card: every cell hand-computed on a fixture with nulls,
  * exact dups, and skewed dimensions; dimension opt-outs; diffability
  * shape (one row per (section, key)). */
class CorpusReportSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c", "en", "web"),         // 3 tokens
    (2L, "a b c", "en", "web"),         // exact dup of 1
    (3L, "d  e", "de", "web"),          // run of whitespace: 2 tokens
    (4L, null.asInstanceOf[String], null.asInstanceOf[String], "books"),
    (5L, "f", "en", "books")            // 1 token
  ).toDF("doc_id", "text", "lang", "source")

  private def card = CorpusReport.build(docs, "text", "doc_id",
    langCol = Some("lang"), sourceCol = Some("source"))

  private def cell(section: String, key: String): Double =
    card.filter($"section" === section && $"key" === key)
      .head().getDouble(2)

  test("scalar cells: counts, emptiness, dup mass, token stats") {
    assert(cell("corpus", "n_docs") == 5.0)
    assert(cell("corpus", "n_empty") == 1.0)   // the null text
    assert(cell("corpus", "exact_dup_docs") == 1.0) // 4 non-null, 3 distinct
    assert(cell("tokens", "total") == 9.0) // 3 + 3 + 2 + 0 + 1
    assert(cell("tokens", "mean") == 9.0 / 5.0)
  }

  test("token quantiles are the exact q58 interpolation") {
    // token counts incl. the null doc: (0, 1, 2, 3, 3)
    assert(cell("tokens", "p50") == 2.0)
    // p90 over sorted [0,1,2,3,3]: rank 0.9*(5-1)=3.6 → 3 + 0.6*(3-3) = 3
    assert(cell("tokens", "p90") == 3.0)
  }

  test("dimension sections: per-key counts, null key labeled") {
    assert(cell("lang", "en") == 3.0)
    assert(cell("lang", "de") == 1.0)
    assert(cell("lang", "null") == 1.0)
    assert(cell("source", "web") == 3.0)
    assert(cell("source", "books") == 2.0)
  }

  test("diff: deltas on shared cells, NULL sides for asymmetric cells") {
    // "after" = corpus without the de doc and without one en dup
    val after = CorpusReport.build(
      docs.filter($"doc_id" =!= 2L && $"doc_id" =!= 3L), "text", "doc_id",
      langCol = Some("lang"), sourceCol = Some("source"))
    val d = CorpusReport.diff(card, after)
    def cellRow(section: String, key: String) =
      d.filter($"section" === section && $"key" === key).head()
    val nd = cellRow("corpus", "n_docs")
    assert(nd.getDouble(2) == 5.0 && nd.getDouble(3) == 3.0 &&
      nd.getDouble(4) == -2.0)
    // de vanished: before = 1, after side NULL, delta NULL (not zero)
    val de = cellRow("lang", "de")
    assert(de.getDouble(2) == 1.0 && de.isNullAt(3) && de.isNullAt(4))
    // dup removal: exact_dup_docs 1 -> 0
    assert(cellRow("corpus", "exact_dup_docs").getDouble(4) == -1.0)
    // a key only in AFTER keeps a NULL before (synthetic extra row)
    val extra = Seq(("lang", "xx", 7.0)).toDF("section", "key", "value")
    val d2 = CorpusReport.diff(card, after.unionByName(extra))
    val xx = d2.filter($"section" === "lang" && $"key" === "xx").head()
    assert(xx.isNullAt(2) && xx.getDouble(3) == 7.0 && xx.isNullAt(4))
  }

  test("overlap: distinct-based counts, normalization-equivalent texts, nulls") {
    val a = Seq(
      (1L, "shared one"), (2L, "Shared  TWO"),    // normalizes to b's form
      (3L, "only in a"), (4L, "only in a"),       // in-side dup: counts once
      (5L, null.asInstanceOf[String])             // null: ignored
    ).toDF("doc_id", "text")
    val b = Seq(
      (10L, "shared one"), (11L, "shared two"),
      (12L, "only in b"), (13L, "also only b")
    ).toDF("doc_id", "text")
    val r = CorpusReport.overlap(a, b, "text").head()
    assert(r.getLong(0) == 3L)   // n_a: shared one, shared two, only in a
    assert(r.getLong(1) == 4L)   // n_b
    assert(r.getLong(2) == 2L)   // n_both (case/whitespace-insensitive)
    assert(r.getDouble(3) == 2.0 / 5.0)  // jaccard
    assert(r.getDouble(4) == 2.0 / 3.0)  // contain_a_in_b
    assert(r.getDouble(5) == 2.0 / 4.0)  // contain_b_in_a
    // disjoint corpora: zero overlap, defined ratios
    val z = CorpusReport.overlap(a, a.withColumn("text",
      concat($"text", lit(" zz"))), "text").head()
    assert(z.getLong(2) == 0L && z.getDouble(3) == 0.0)
  }

  test("nearOverlap: semi-join membership, shingle-less docs excluded") {
    def long(seed: String): String =
      (1 to 10).map(i => s"${seed}_$i").mkString(" ")
    val a = Seq(
      (1L, long("alpha")), (2L, long("gamma")),
      (3L, "short")                        // < 5 tokens: no signature
    ).toDF("doc_id", "text")
    val b = Seq(
      (10L, long("alpha")),                // verbatim re-crawl: near
      (11L, long("delta")),                // disjoint shingles
      (12L, "tiny")                        // no signature
    ).toDF("doc_id", "text")
    val r = CorpusReport.nearOverlap(a, b, "text", "doc_id", "doc_id").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L) // sig-bearing docs only
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L) // alpha matches alpha
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.5)
    // a doc near ANY other-side doc counts once, not per collision
    val b2 = b.unionByName(Seq((13L, long("alpha"))).toDF("doc_id", "text"))
    val r2 = CorpusReport.nearOverlap(a, b2, "text", "doc_id", "doc_id").head()
    assert(r2.getLong(2) == 1L && r2.getLong(3) == 2L)
  }

  test("vectorCard: counts, ragged dims surfaced, norm quantiles, labels") {
    val vecs = Seq(
      (1L, Some(Seq(3.0f, 4.0f)), Some(0)),        // norm 5
      (2L, Some(Seq(0.0f, 0.0f)), Some(1)),        // norm 0
      (3L, Some(Seq(1.0f, 0.0f, 0.0f)), Some(0)),  // RAGGED: dim 3, norm 1
      (4L, None, None)                             // null vector
    ).toDF("vec_id", "embedding", "label")
    val card = CorpusReport.vectorCard(vecs, "embedding",
      labelCol = Some("label"))
    def cell(s: String, k: String): Double =
      card.filter($"section" === s && $"key" === k).head().getDouble(2)
    assert(cell("corpus", "n_vecs") == 4.0 && cell("corpus", "n_null") == 1.0)
    assert(cell("dims", "min") == 2.0 && cell("dims", "max") == 3.0)
    // norms (0, 1, 5): p50 = 1; p90 rank 0.9*2 = 1.8 -> 1 + 0.8*(5-1)
    assert(cell("norm", "p50") == 1.0)
    assert(cell("norm", "p90") == 1.0 + 0.8 * 4.0)
    assert(cell("label", "0") == 2.0 && cell("label", "1") == 1.0 &&
      cell("label", "null") == 1.0)
    // same shape as the doc card: diff works across the two cards
    assert(CorpusReport.diff(card, card).filter($"delta" =!= 0.0).isEmpty)
  }

  test("one row per (section, key); dimensions opt out cleanly") {
    assert(card.groupBy($"section", $"key").count()
      .filter($"count" > 1).isEmpty)
    val bare = CorpusReport.build(docs, "text", "doc_id")
    assert(bare.filter($"section".isin("lang", "source")).isEmpty)
    assert(bare.count() == 7) // 5 scalars + 2 quantiles
  }

  test("card store lifecycle: write/read/snapshots/diff == in-session; " +
    "re-publish idempotent; contract validated at the door") {
    val path = java.nio.file.Files.createTempDirectory("cardstore").toString
    val gated = docs.filter(length(coalesce($"text", lit(""))) >= 3)
    val before = card
    val after = CorpusReport.build(gated, "text", "doc_id",
      langCol = Some("lang"), sourceCol = Some("source"))
    CorpusReport.writeCard(before, path, "full")
    CorpusReport.writeCard(after, path, "gated")
    // read back == the in-session frames, cell for cell
    val rb = CorpusReport.readCard(spark, path, "full")
    val ra = CorpusReport.readCard(spark, path, "gated")
    assert(rb.exceptAll(before).isEmpty && before.exceptAll(rb).isEmpty)
    assert(ra.exceptAll(after).isEmpty && after.exceptAll(ra).isEmpty)
    // inventory: both labels, correct cell counts
    val inv = CorpusReport.snapshots(spark, path)
      .as[(String, Long)].collect().toMap
    assert(inv == Map("full" -> before.count(), "gated" -> after.count()))
    // stored diff == in-session diff
    val dStore = CorpusReport.diffSnapshots(spark, path, "full", "gated")
    val dLive = CorpusReport.diff(before, after)
    assert(dStore.exceptAll(dLive).isEmpty && dLive.exceptAll(dStore).isEmpty)
    // re-publish converges (the crash-retry shape): same bytes, same
    // inventory, other snapshots untouched
    CorpusReport.writeCard(before, path, "full")
    assert(CorpusReport.readCard(spark, path, "full")
      .exceptAll(before).isEmpty)
    assert(CorpusReport.snapshots(spark, path).count() == 2)
    // contract: non-card frames and unsafe labels fail fast
    assert(intercept[IllegalArgumentException](
      CorpusReport.writeCard(docs, path, "x")).getMessage
      .contains("a card is exactly"))
    assert(intercept[IllegalArgumentException](
      CorpusReport.writeCard(before, path, "a/b")).getMessage
      .contains("path-safe"))
    assert(intercept[IllegalArgumentException](
      CorpusReport.readCard(spark, path, "")).getMessage
      .contains("path-safe"))
  }

  test("domain section: host normalization, top-k cut by (count desc, " +
      "domain asc), __other rollup always present, exact __n_domains") {
    val crawl = Seq(
      (1L, "t", "https://a.example/x"),
      (2L, "t", "https://www.a.example:443/y#frag"), // same domain as 1
      (3L, "t", "https://b.example/z"),
      (4L, "t", "https://c.example/w"),
      (5L, "t", null.asInstanceOf[String]) // null url -> 'null' key
    ).toDF("doc_id", "text", "url")
    val c = CorpusReport.build(crawl, "text", "doc_id",
      urlCol = Some("url"), domainTopK = 2)
    def dcell(k: String): Double =
      c.filter($"section" === "domain" && $"key" === k).head().getDouble(2)
    assert(dcell("a.example") === 2.0) // www./port/fragment stripped
    assert(dcell("__n_domains") === 4.0) // a, b, c, null
    // top-2 = a.example (2), then b.example (tie count 1 with c.example
    // and 'null' -> domain asc wins); the rest rolls up
    assert(dcell("b.example") === 1.0)
    assert(dcell("__other") === 2.0) // c.example + the null-url doc
    assert(c.filter($"section" === "domain" &&
      ($"key" === "c.example" || $"key" === "null")).count() === 0)
    // k covering everything: __other present AND zero (diff alignment)
    val all = CorpusReport.build(crawl, "text", "doc_id",
      urlCol = Some("url"), domainTopK = 100)
    assert(all.filter($"section" === "domain" && $"key" === "__other")
      .head().getDouble(2) === 0.0)
    // no urlCol: no domain section (existing cards unchanged)
    assert(card.filter($"section" === "domain").count() === 0)
    intercept[IllegalArgumentException](CorpusReport.build(crawl, "text",
      "doc_id", urlCol = Some("url"), domainTopK = 0))
  }
}
