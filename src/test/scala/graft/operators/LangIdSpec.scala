package graft.operators

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained char-n-gram language ID: feature surface, learning on a
  * separable planted fixture, bit-exact determinism, one-vs-rest
  * equivalence with the binary trainer, and argmax tie order. */
class LangIdSpec extends SparkSpec {

  import spark.implicits._

  test("charNgrams: hand-computed grams, lowercasing, short-text fallback") {
    val got = Seq(("AbCd", 1)).toDF("t", "i")
      .select(Text.charNgrams($"t", 3)).as[Seq[String]].head()
    assert(got === Seq("abc", "bcd"))
    val whole = Seq(("Hi", 1)).toDF("t", "i")
      .select(Text.charNgrams($"t", 3)).as[Seq[String]].head()
    assert(whole === Seq("hi"), "shorter-than-n text yields the whole text")
    val spaced = Seq(("a b", 1)).toDF("t", "i")
      .select(Text.charNgrams($"t", 2)).as[Seq[String]].head()
    assert(spaced === Seq("a ", " b"), "spaces are part of the gram alphabet")
  }

  /** Planted corpus: three "languages" with disjoint character
    * alphabets, deterministic doc generation. */
  private def planted: DataFrame = {
    val alpha = Map("aa" -> "abc ", "bb" -> "def ", "cc" -> "ghi ")
    val rows = for {
      (lang, chars) <- alpha.toSeq
      i <- 0 until 30
    } yield {
      // deterministic "sentence": rotate the alphabet by doc index
      val txt = (0 until 40).map(j => chars((i + j) % chars.length)).mkString
      (lang.hashCode.toLong * 100 + i, txt, lang)
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("train + predict recovers disjoint-alphabet languages exactly") {
    val df = planted
    val m = LangId.train(df, "text", "lang", "doc_id",
      langs = Seq("aa", "bb", "cc"), dim = 64, n = 3, iterations = 5)
    val joined = LangId.predict(df, "text", "doc_id", m)
      .join(df.select($"doc_id", $"lang"), Seq("doc_id"))
    assert(joined.filter($"pred" =!= $"lang").isEmpty,
      "disjoint character alphabets must classify perfectly")
  }

  test("training is bit-exact across runs (weights, biases, predictions)") {
    val df = planted
    def run() = LangId.train(df, "text", "lang", "doc_id",
      langs = Seq("aa", "bb", "cc"), dim = 32, n = 2, iterations = 3)
    val m1 = run(); val m2 = run()
    assert(m1.models.keySet === m2.models.keySet)
    for (l <- m1.langs) {
      assert(m1.models(l).bias == m2.models(l).bias)
      assert(m1.models(l).weights === m2.models(l).weights)
    }
  }

  test("one-vs-rest model == standalone binary Classifier.train per language") {
    val df = planted
    val m = LangId.train(df, "text", "lang", "doc_id",
      langs = Seq("aa", "bb"), dim = 32, n = 3, iterations = 2)
    for (l <- Seq("aa", "bb")) {
      val solo = Classifier.train(
        df.withColumn("y", ($"lang" === l).cast("double")),
        "text", "y", "doc_id", dim = 32, iterations = 2,
        tok = Text.charNgrams(_, 3))
      assert(m.models(l).bias == solo.bias, s"bias diverged for $l")
      assert(m.models(l).weights === solo.weights, s"weights diverged for $l")
    }
  }

  test("fused char-BoW kernel == composable featureArrays(charNgrams) bit-for-bit") {
    val docs = planted.unionByName(Seq(
      (900L, "Hi", "aa"),               // shorter than n: whole-text gram
      (901L, "", "aa"),                  // empty text: md5("") gram, total 1
      (902L, "MiXeD Case\nWith lines", "bb"),
      (903L, "café naïve résumé", "cc") // non-ASCII path
    ).toDF("doc_id", "text", "lang"))
    for ((n, dim) <- Seq((3, 64), (2, 16), (4, 1024))) {
      val fused = Classifier.featureArraysCharBow(docs, "text", "doc_id", dim, n)
      val composable = Classifier.featureArrays(docs, "text", "doc_id", dim,
        graft.functions.Text.charNgrams(_, n))
      assert(fused.exceptAll(composable).isEmpty &&
        composable.exceptAll(fused).isEmpty,
        s"kernel diverged from the composable path at n=$n dim=$dim")
    }
    // the fused plan is a pure narrow projection: no exchange at all
    val plan = Classifier.featureArraysCharBow(docs, "text", "doc_id", 64, 3)
      .queryExecution.executedPlan
    val exchanges = collectPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty, "fused feature extraction must not shuffle")
  }

  test("predict is stateless: streamed docs == batch predictions") {
    import java.nio.file.Files
    val df = planted
    val model = LangId.train(df, "text", "lang", "doc_id",
      langs = Seq("aa", "bb", "cc"), dim = 32, n = 3, iterations = 2)
    val src = Files.createTempDirectory("langid_src").toString
    val out = Files.createTempDirectory("langid_out").toString
    val ckpt = Files.createTempDirectory("langid_ckpt").toString
    df.select($"doc_id", $"text").write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema(df.select($"doc_id", $"text").schema).parquet(src)
    // the scoring plan is one narrow kernel projection — valid
    // mid-stream with no state, so language ID composes below any
    // downstream stateful gate in the same streaming query
    val q = LangId.predict(stream, "text", "doc_id", model)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out).as[(Long, String)].collect().toSet
    val batch = LangId.predict(df, "text", "doc_id", model)
      .as[(Long, String)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("argmax ties break to the earliest language in langs order") {
    // two languages given IDENTICAL training data -> identical models ->
    // exact margin ties everywhere; the first listed language must win
    val rows = (0 until 10).map(i =>
      (i.toLong, "xyz xyz xyz", if (i % 2 == 0) "l1" else "l2"))
    val df = rows.toDF("doc_id", "text", "lang")
    val same = Classifier.train(df.withColumn("y", lit(0.0)),
      "text", "y", "doc_id", dim = 16, iterations = 1,
      tok = Text.charNgrams(_, 3))
    val model = LangId.Model(Seq("zz", "aa"), 16, 3,
      Map("zz" -> same, "aa" -> same))
    val preds = LangId.predict(df, "text", "doc_id", model)
      .select($"pred").distinct().as[String].collect().toSeq
    assert(preds === Seq("zz"), "first language in langs order wins exact ties")
  }
}
