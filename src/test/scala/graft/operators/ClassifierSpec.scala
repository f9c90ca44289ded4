package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Logistic hashed-BoW scoring: hand-computed scores via an independent
  * Java-side md5, prior for evidence-less docs, gate behavior, and the
  * zero-shuffle plan contract. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32
  private val weights = (0 until dim).map(i => i -> (i - 16) / 16.0).toMap
  private val bias = 0.25

  /** Independent witness: bucket via java.security MessageDigest. */
  private def jBucket(tok: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % dim).toInt
  }

  private def jScore(text: String): Double = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val z = toks.foldLeft(0.0)((acc, t) => acc + weights(jBucket(t)))
    val zz = if (toks.isEmpty) bias else bias + z / toks.length
    BigDecimal(1.0 / (1.0 + math.exp(-zz)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("scores match an independent hand computation; empty/null score the prior") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "zeta zeta zeta"),
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Classifier.score(df, "text", "doc_id", weights, bias, dim)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((4L, jScore("alpha beta gamma delta"))))
    assert(got(2L) == ((3L, jScore("zeta zeta zeta"))))
    val prior = BigDecimal(1.0 / (1.0 + math.exp(-bias)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(3L) == ((0L, prior)) && got(4L) == ((0L, prior)),
      "no evidence -> sigmoid(bias), for empty AND null text")
  }

  test("gate keeps exactly the rows whose score clears tau, payload intact") {
    val df = Seq(
      (1L, "alpha beta gamma delta", "keepme"),
      (2L, "zeta zeta zeta", "metoo"),
      (3L, "", "prior")
    ).toDF("doc_id", "text", "payload")
    val scores = Classifier.score(df, "text", "doc_id", weights, bias, dim)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val tau = scores.values.toSeq.sorted.apply(1) // keep top 2 of 3
    val kept = Classifier.gate(df, "text", "doc_id", weights, bias, dim, tau)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "payload"))
    assert(kept.select($"doc_id").as[Long].collect().toSet ==
      scores.filter(_._2 >= tau).keySet)
  }

  /** Reference GD: same math as Classifier.train, independently coded
    * driver-side (jBucket witness, ordered folds — docs by id, buckets
    * ascending) so the distributed trainer has a bit-exact twin. */
  private def jTrain(docs: Seq[(Long, String, Double)], d: Int,
                     iters: Int, lr: Double): (Map[Int, Double], Double) = {
    val feats = docs.sortBy(_._1).map { case (id, text, y) =>
      val toks = Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty)
      val n = toks.length.toDouble
      val xs = toks.groupBy(t => (java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString,
        16) % d).toInt)
        .view.mapValues(_.length / n).toSeq.sortBy(_._1)
      (id, y, xs)
    }
    val m = feats.length.toDouble
    var w = Map.empty[Int, Double]
    var b = 0.0
    (1 to iters).foreach { _ =>
      val rs = feats.map { case (id, y, xs) =>
        val z = xs.foldLeft(b)((acc, bx) =>
          acc + w.getOrElse(bx._1, 0.0) * bx._2)
        (id, 1.0 / (1.0 + math.exp(-z)) - y, xs)
      }
      val bg = rs.foldLeft(0.0)((acc, r) => acc + r._2) / m
      val wg = rs.flatMap { case (id, r, xs) =>
        xs.map { case (bk, x) => (bk, id, r * x) } }
        .groupBy(_._1).view.mapValues(ts =>
          ts.sortBy(_._2).foldLeft(0.0)((acc, t) => acc + t._3) / m).toMap
      w = (w.keySet ++ wg.keySet).iterator
        .map(k => k -> (w.getOrElse(k, 0.0) - lr * wg.getOrElse(k, 0.0)))
        .toMap
      b -= lr * bg
    }
    (w, b)
  }

  test("train walks the exact reference-GD weight trajectory and separates the fixture") {
    val docs = Seq(
      (1L, "good solid prose with substance and depth", 1.0),
      (2L, "good writing clear and thorough", 1.0),
      (3L, "solid good analysis with depth", 1.0),
      (4L, "bad spam junk noise", 0.0),
      (5L, "junk bad spam spam", 0.0),
      (6L, "noise junk bad garbage", 0.0))
    val df = docs.toDF("doc_id", "text", "y")
    val model = Classifier.train(df, "text", "y", "doc_id",
      dim = dim, iterations = 20, lr = 1.0)
    val (jw, jb) = jTrain(docs, dim, iters = 20, lr = 1.0)
    assert(model.bias == jb, "bias must match the ordered-fold reference exactly")
    assert(model.weights == jw, "weights must match the ordered-fold reference exactly")
    val preds = Classifier.predict(df, "text", "y", "doc_id", model, dim)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(preds == docs.map(d => d._1 -> d._3.toLong).toMap,
      "20 GD iterations must separate an obviously separable fixture")
  }

  test("trainPredict == train-then-predict, row for row (one shared " +
      "feature frame must not change anything)") {
    val df = Seq(
      (1L, "good solid prose with substance and depth", 1.0),
      (2L, "good writing clear and thorough", 1.0),
      (3L, "solid good analysis with depth", 1.0),
      (4L, "bad spam junk noise", 0.0),
      (5L, "junk bad spam spam", 0.0),
      (6L, "noise junk bad garbage", 0.0))
      .toDF("doc_id", "text", "y")
    val twoPass = Classifier.predict(df, "text", "y", "doc_id",
      Classifier.train(df, "text", "y", "doc_id", dim = dim,
        iterations = 5, lr = 0.5), dim)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val onePass = Classifier.trainPredict(df, "text", "y", "doc_id",
      dim = dim, iterations = 5, lr = 0.5)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(onePass.toSeq == twoPass.toSeq)
  }

  test("train rejects non-binary labels with a clear error") {
    val df = Seq((1L, "some text", 0.5)).toDF("doc_id", "text", "y")
    val e = intercept[Exception] {
      Classifier.train(df, "text", "y", "doc_id", dim = dim, iterations = 1)
    }
    assert(e.getMessage != null)
  }

  test("plan: scoring is narrow — zero exchanges, no explode") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Classifier.score(df, "text", "doc_id", weights, bias, dim)
      .queryExecution.executedPlan
    val exchanges = collectPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    val generates = collectPlan(plan) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(exchanges.isEmpty && generates.isEmpty,
      s"classifier inference must be a narrow map:\n$plan")
  }
}
