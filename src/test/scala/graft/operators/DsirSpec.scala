package graft.operators

import graft.SparkSpec

/** DSIR importance weights: target-like raw documents outscore
  * raw-typical ones, token-less docs score 0, and Gumbel-top-k
  * selection is content-addressed deterministic. */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  test("target-like documents outscore raw-typical ones; token-less score 0") {
    val target = Seq(
      (1000L, "curated encyclopedia article about science and history"),
      (1001L, "another encyclopedia article about science topics"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "encyclopedia article about science"),   // target-like
      (2L, "buy cheap pills online click here now"), // raw-typical spam
      (3L, "buy cheap pills online click here now"),
      (4L, ""))                                      // token-less
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "text", "doc_id", dim = 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w(1L)._2 > w(2L)._2,
      s"target-vocabulary doc must outscore spam: $w")
    assert(w(4L) == ((0L, 0.0)), "token-less doc scores zero")
    // spam twins share a weight (content-addressed features)
    assert(w(2L) == w(3L))
  }

  test("hashed n-grams catch word order a unigram bag cannot") {
    val target = Seq(
      (100L, "alpha beta gamma alpha beta gamma alpha beta gamma"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma"),  // target's phrase order
      (2L, "gamma beta alpha"))  // same unigram bag, reversed order
      .toDF("doc_id", "text")
    def w(ngram: Int) = Dsir.importanceWeights(raw, target, "text",
        "doc_id", dim = 256, maxNgram = ngram)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val uni = w(1)
    assert(uni(1L) == uni(2L), "unigram bags are order-blind")
    val bi = w(2)
    assert(bi(1L) > bi(2L),
      s"bigram features must reward the target's word order: $bi")
  }

  test("gumbelTopK: deterministic per salt, k-bounded, salt redraws") {
    val target = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val raw = (1 to 200)
      .map(i => (i.toLong, s"word$i alpha beta filler$i content$i"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "text", "doc_id", dim = 256)
      .localCheckpoint()
    def pick(salt: String) = Dsir.gumbelTopK(w, "doc_id", "dsir_weight",
        k = 20, salt = salt)
      .select($"doc_id").as[Long].collect().toSeq
    val a = pick("s1")
    assert(a.length == 20 && a.distinct.length == 20)
    assert(pick("s1") == a, "same salt, same selection, same order")
    assert(pick("s2") != a, "a different salt must redraw")
    // scale -> 0 degenerates toward pure argmax top-k on the weights
    val argmaxish = Dsir.gumbelTopK(w, "doc_id", "dsir_weight", k = 20,
        salt = "s1", scale = 1e-9)
      .select($"doc_id").as[Long].collect().toSet
    val topByWeight = w.orderBy($"dsir_weight".desc, $"doc_id").limit(20)
      .select($"doc_id").as[Long].collect().toSet
    assert(argmaxish == topByWeight)
  }
}
