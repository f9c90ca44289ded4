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

  test("one row per (section, key); dimensions opt out cleanly") {
    assert(card.groupBy($"section", $"key").count()
      .filter($"count" > 1).isEmpty)
    val bare = CorpusReport.build(docs, "text", "doc_id")
    assert(bare.filter($"section".isin("lang", "source")).isEmpty)
    assert(bare.count() == 7) // 5 scalars + 2 quantiles
  }
}
