package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Content-addressed corpus mixing: reproducible membership, rates
  * within sampling tolerance, independent draws per source salt. */
class MixSpec extends SparkSpec {

  import spark.implicits._

  test("sampleByHash is deterministic and close to the target rate") {
    val docs = Tables.load(spark, sf("sf0.01"), "documents")
    val n = docs.count().toDouble
    val a = Mix.sampleByHash(docs, "doc_id", 0.3)
    val b = Mix.sampleByHash(docs, "doc_id", 0.3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "same ids every run")
    val rate = a.count() / n
    assert(math.abs(rate - 0.3) < 0.1, s"rate $rate too far from 0.3")
    // rate 1.0 keeps everything; 0.0 keeps nothing
    assert(Mix.sampleByHash(docs, "doc_id", 1.0).count() == n.toLong)
    assert(Mix.sampleByHash(docs, "doc_id", 0.0).count() == 0L)
  }

  test("selectByTokenBudget: strict fit in score order, deterministic ties") {
    val docs = Seq(
      // (id, tokens, score): quality order is 4, 1, 3(ties->id), 5(tie), 2
      (1L, 40L, 0.9),
      (2L, 10L, 0.1),
      (3L, 30L, 0.5),
      (4L, 20L, 1.0),
      (5L, 25L, 0.5)
    ).toDF("doc_id", "n_tokens", "score")
    def ids(budget: Long): Seq[Long] =
      Mix.selectByTokenBudget(docs, "score", "n_tokens", "doc_id", budget)
        .select($"doc_id").as[Long].collect().sorted.toSeq
    // cum in order 4,1,3,5,2: 20, 60, 90, 115, 125
    assert(ids(125) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(ids(124) == Seq(1L, 3L, 4L, 5L))   // 2 falls off
    assert(ids(114) == Seq(1L, 3L, 4L))       // tie order: 3 (lower id) first
    assert(ids(90) == Seq(1L, 3L, 4L))        // inclusive boundary kept
    assert(ids(89) == Seq(1L, 4L))            // strict: crossing doc dropped
    assert(ids(19) == Seq())                  // best doc alone over budget
    // cum_tokens carries the selection-order running total
    val cum = Mix.selectByTokenBudget(docs, "score", "n_tokens", "doc_id", 90)
      .orderBy($"cum_tokens").select($"doc_id", $"cum_tokens")
      .as[(Long, Long)].collect().toSeq
    assert(cum == Seq((4L, 20L), (1L, 60L), (3L, 90L)))
    assert(intercept[IllegalArgumentException](
      Mix.selectByTokenBudget(docs, "score", "n_tokens", "doc_id", 0))
      .getMessage.contains("positive"))
  }

  test("selectByTokenBudget: null scores are unscored — filtered out, " +
    "never budget-priority") {
    val docs = Seq(
      (1L, 40L, Some(0.9)), (2L, 10L, None), (3L, 30L, Some(0.5)),
      (4L, 20L, None)
    ).toDF("doc_id", "n_tokens", "score")
    // a negated NULL would sort nulls-first: docs 2 and 4 would eat 30
    // tokens of the 70 budget ahead of every scored doc. The contract:
    // they are not selected at all, and the scored docs fill the budget.
    val got = Mix.selectByTokenBudget(docs, "score", "n_tokens", "doc_id", 70L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L))
    // grouped variant: same contract
    val g = Mix.selectByTokenBudgetByGroup(
      docs.withColumn("lang", lit("en")), "lang", "score", "n_tokens",
      "doc_id", Seq(("en", 70L)).toDF("lang", "budget"))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(g == Seq(1L, 3L))
  }

  test("selectByTokenBudget == a single-partition window on real docs") {
    val tk = graft.functions.Text.tokens($"text")
    val scored = Tables.load(spark, sf("sf0.01"), "documents")
      .select($"doc_id", size(tk).cast("long").as("n_tokens"),
        (size(array_distinct(tk)).cast("double") / size(tk)).as("score"))
      .filter($"n_tokens" > 0)
      .repartition(8) // the two-pass scan must not depend on layout
    val got = Mix.selectByTokenBudget(scored, "score", "n_tokens",
      "doc_id", 10000L)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"score".desc, $"doc_id")
    val naive = scored
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .filter($"cum_tokens" <= 10000L)
    assert(got.count() > 0 && got.count() < scored.count(), "the cut bites")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("selectByTokenBudgetByGroup: per-group strict fit, unbudgeted " +
    "groups dropped, budgets frame validated") {
    val docs = Seq(
      // en quality order 2, 1: cum 10, 30
      (1L, "en", 20L, 0.5), (2L, "en", 10L, 0.9),
      // de quality order 3, 4: cum 15, 40
      (3L, "de", 15L, 0.8), (4L, "de", 25L, 0.2),
      // zh has no budget row -> dropped wholesale
      (5L, "zh", 5L, 1.0)
    ).toDF("doc_id", "lang", "n_tokens", "score")
    val budgets = Seq(("en", 10L), ("de", 39L)).toDF("lang", "budget")
    val got = Mix.selectByTokenBudgetByGroup(docs, "lang", "score",
      "n_tokens", "doc_id", budgets)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    // en: only doc 2 fits 10; de: doc 3 fits, doc 4 would cross 39
    assert(got == Seq(2L, 3L))
    assert(intercept[IllegalArgumentException](
      Mix.selectByTokenBudgetByGroup(docs, "lang", "score", "n_tokens",
        "doc_id", budgets.withColumnRenamed("budget", "alloc")))
      .getMessage.contains("lacks 'budget'"))
  }

  test("unimaxPlan water-fills the budget under the epoch cap") {
    // counts a=1, b=2, c=7; budget = 2.0 * 10 = 20, caps = 3, 6, 21.
    // Water level: a and b saturate (3 + 6), c takes the rest at 11.
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(7)("c"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "lang")
    val out = Mix.unimaxPlan(df, "lang", avgEpochs = 2.0, maxEpochs = 3.0)
      .select($"lang", $"alloc", $"epochs").as[(String, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a") == ((3.0, 3.0)))
    assert(out("b") == ((6.0, 3.0)))
    assert(out("c") == ((11.0, 11.0 / 7)))
    assert(out.values.map(_._1).sum == 20.0, "allocations exhaust the budget")
    // avgEpochs == maxEpochs: everyone saturates, surplus-free
    val flat = Mix.unimaxPlan(df, "lang", avgEpochs = 3.0, maxEpochs = 3.0)
      .select($"lang", $"epochs").as[(String, Double)].collect().toMap
    assert(flat.values.forall(_ == 3.0))
  }

  test("property: unimax invariants hold on randomized language skews") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    (0 until 12).foreach { c =>
      val nLangs = 3 + c % 5
      val counts = Gen.listOfN(nLangs, Gen.choose(1, 50))
        .apply(Gen.Parameters.default, Seed(7000L + c)).get
      val rows = counts.zipWithIndex.flatMap { case (n, l) =>
        (0 until n).map(i => (l * 1000L + i, s"lang$l"))
      }
      val avg = 1.0 + (c % 3) * 0.5 // 1.0, 1.5, 2.0
      val out = Mix.unimaxPlan(rows.toDF("id", "lang"), "lang",
        avgEpochs = avg, maxEpochs = 3.0)
        .select($"lang", $"n_docs", $"cap", $"alloc", $"epochs")
        .as[(String, Long, Double, Double, Double)].collect()
      val budget = counts.sum * avg
      val totalCap = out.map(_._3).sum
      out.foreach { case (lang, n, cap, alloc, epochs) =>
        assert(alloc <= cap + 1e-9, s"case $c $lang: alloc $alloc > cap $cap")
        assert(epochs <= 3.0 + 1e-9, s"case $c $lang: epochs $epochs > max")
        assert(alloc > 0, s"case $c $lang: non-positive alloc")
      }
      val spent = out.map(_._4).sum
      assert(math.abs(spent - math.min(budget, totalCap)) < 1e-6,
        s"case $c: spent $spent != min(budget $budget, caps $totalCap)")
    }
  }

  test("corpora salts draws per source and tags provenance") {
    val docs = Tables.load(spark, sf("sf0.01"), "documents")
    val mixed = Mix.corpora(Seq(
      ("half_a", docs, 0.5), ("half_b", docs, 0.5)), "doc_id")
    val bySource = mixed.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource.keySet == Set("half_a", "half_b"))
    // independent salts: the two 50% draws must not pick the same ids
    val aIds = mixed.where($"source" === "half_a").select($"doc_id").as[Long].collect().toSet
    val bIds = mixed.where($"source" === "half_b").select($"doc_id").as[Long].collect().toSet
    val overlap = aIds.intersect(bIds).size.toDouble / math.max(1, aIds.size)
    assert(overlap < 0.7, s"draws look correlated: overlap $overlap")
    assert(aIds != bIds)
  }

  test("balanceSources: sqrt rule, smallest source whole, deterministic reruns") {
    // sizes 400 / 100 / 25 -> thresholds sqrt(25/400)=0.25, sqrt(25/100)=0.5, 1.0
    val docs = (1L to 525L).map { i =>
      val src = if (i <= 400) "big" else if (i <= 500) "mid" else "small"
      (i, src)
    }.toDF("doc_id", "src")
    val kept = Mix.balanceSources(docs, "doc_id", "src")
    val bySource = kept.groupBy($"src").count().as[(String, Long)].collect().toMap
    // smallest source survives whole (threshold 10000)
    assert(bySource("small") == 25L)
    // hash rates approach the sqrt targets (400*0.25=100, 100*0.5=50)
    assert(math.abs(bySource("big") - 100L) <= 20, s"big kept ${bySource("big")}")
    assert(math.abs(bySource("mid") - 50L) <= 15, s"mid kept ${bySource("mid")}")
    // content-addressed: a rerun keeps the identical id set
    val ids1 = kept.select($"doc_id").as[Long].collect().toSet
    val ids2 = Mix.balanceSources(docs, "doc_id", "src")
      .select($"doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // kept rows are a subset of the input rows
    assert(ids1.subsetOf((1L to 525L).toSet))
  }

  test("upsample: whole copies + content-addressed fractional extras") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(1, 2001).select($"id".as("doc_id"))
    // factor 2.4: every doc gets 2 copies, ~40% get a third
    val up = Mix.upsample(docs, "doc_id", lit(2.4), salt = "e1")
      .select($"doc_id", $"copy").as[(Long, Long)].collect()
    val byDoc = up.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byDoc.size == 2000, "factor >= 1 keeps every doc")
    assert(byDoc.values.forall(c => c == (0L until c.length).toSeq),
      "copy indices are dense 0-based")
    val thirds = byDoc.values.count(_.length == 3)
    assert(byDoc.values.forall(c => c.length == 2 || c.length == 3))
    assert(math.abs(thirds - 800) <= 120, s"~40% of 2000 get the extra: $thirds")
    // rerun-identical; different salt redraws the extras
    val again = Mix.upsample(docs, "doc_id", lit(2.4), salt = "e1")
      .select($"doc_id", $"copy").as[(Long, Long)].collect()
    assert(up.sorted.toSeq == again.sorted.toSeq)
    val other = Mix.upsample(docs, "doc_id", lit(2.4), salt = "e2")
      .select($"doc_id", $"copy").as[(Long, Long)].collect()
    assert(other.sorted.toSeq != up.sorted.toSeq)

    // sub-1 factors degenerate to keep/drop; zero factor drops everything
    val frac = Mix.upsample(docs, "doc_id", lit(0.3), salt = "e1")
      .select($"doc_id", $"copy").as[(Long, Long)].collect()
    assert(frac.forall(_._2 == 0L) && math.abs(frac.length - 600) <= 80,
      s"factor 0.3 keeps ~30%: ${frac.length}")
    assert(Mix.upsample(docs, "doc_id", lit(0.0)).count() == 0L)

    // a negative factor is a caller bug (a miscomputed weight), not a
    // silent drop: the contract is enforced at run time
    val neg = intercept[Exception] {
      Mix.upsample(docs, "doc_id", lit(-0.5)).count()
    }
    val messages = Iterator.iterate[Throwable](neg)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(messages.contains("factor must be >= 0"),
      s"unexpected failure shape: $messages")
  }
}
