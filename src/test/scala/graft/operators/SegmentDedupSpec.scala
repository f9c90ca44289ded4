package graft.operators

import graft.SparkSpec

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    Dedup.segmentDedup(rows.toSeq.toDF("doc_id", "text"), "text", "doc_id",
        segTokens = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("cross-document duplicate segments drop from the later document") {
    val out = run(1L -> "a b c d e f", 2L -> "a b c x y z")
    assert(out(1L) == ((2L, 2L, "a b c d e f")))
    assert(out(2L) == ((2L, 1L, "x y z")))
  }

  test("in-document repeats keep only the first occurrence") {
    val out = run(3L -> "p q r p q r")
    assert(out(3L) == ((2L, 1L, "p q r")))
  }

  test("short tail segments dedup like any other; winner is the global minimum") {
    // doc 1's second segment is "d e f"; doc 5 re-uses it ahead of a
    // one-token tail — only the tail survives
    val out = run(1L -> "a b c d e f", 5L -> "d e f g")
    assert(out(5L) == ((2L, 1L, "g")))
  }

  test("token-less documents keep (0, 0, empty)") {
    val out = run(1L -> "a b c", 9L -> "", 10L -> "   ")
    assert(out(9L) == ((0L, 0L, "")))
    assert(out(10L) == ((0L, 0L, "")))
    assert(out(1L) == ((1L, 1L, "a b c")))
  }

  test("a document that is entirely boilerplate rebuilds to empty text") {
    val out = run(1L -> "a b c", 2L -> "a b c a b c")
    // doc 2 = two copies of doc 1's only segment: both lose
    assert(out(2L) == ((2L, 0L, "")))
  }
}
