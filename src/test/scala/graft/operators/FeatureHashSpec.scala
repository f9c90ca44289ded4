package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "")
  ).toDF("doc_id", "text")

  test("buckets are deterministic, in range, and collision-consistent") {
    val dim = 8
    val rows = FeatureHash.sparseBow(corpus, "text", "doc_id", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, b, _) => b >= 0 && b < dim })
    // same token -> same bucket everywhere: apple's count in doc 1 is 2
    val md5ofApple = java.security.MessageDigest.getInstance("MD5")
      .digest("apple".getBytes("UTF-8")).take(4)
      .foldLeft(0L)((a, x) => (a << 8) | (x & 0xffL)) % dim
    assert(rows.contains((1L, md5ofApple, 2L)))
  }

  test("dense form equals the densified sparse form; zero vector for empty docs") {
    val dim = 16
    val dense = FeatureHash.denseBow(corpus, "text", "doc_id", dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sparse = FeatureHash.sparseBow(corpus, "text", "doc_id", dim)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(1).toInt -> r.getLong(2)).toMap).toMap
    corpus.select($"doc_id").as[Long].collect().foreach { id =>
      val expect = (0 until dim).map(i =>
        sparse.getOrElse(id, Map.empty).getOrElse(i, 0L))
      assert(dense(id) == expect, s"doc $id")
      assert(dense(id).length == dim)
    }
    assert(dense(3L).forall(_ == 0L), "token-less doc keeps an all-zero vector")
  }

  test("vector totals equal token counts (hashing never drops mass)") {
    val dense = FeatureHash.denseBow(corpus, "text", "doc_id", 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sum).toMap
    assert(dense(1L) == 3 && dense(2L) == 2 && dense(3L) == 0)
  }
}
