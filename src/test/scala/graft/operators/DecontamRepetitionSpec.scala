package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Decontamination and intra-doc repetition: hand-computable fixtures,
  * differential between the narrow literal path and the general
  * broadcast-join path, and plan pins for the zero-shuffle claims. */
class DecontamRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    // doc 1: fully inside the benchmark text (contaminated)
    (1L, "the quick brown fox jumps"),
    // doc 2: one shared 3-gram ("quick brown fox") of its four
    (2L, "a very quick brown fox runs home"),
    // doc 3: disjoint
    (3L, "completely unrelated words entirely"),
    // doc 4: too short for a 3-gram
    (4L, "too short"),
    // doc 5: null text
    (5L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  private val benchmark = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  test("overlapStats: hand-computed overlap, gram-less docs score 0") {
    val out = Decontam.overlapStats(corpus, benchmark, "text", "doc_id",
        n = 3, threshold = 0.5)
      .select($"doc_id", $"n_grams", $"matched", $"contamination", $"contaminated")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((3L, 3L, 1.0, true)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((5L, 1L, 0.2, false)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((2L, 0L, 0.0, false)))
    assert(out(4L) == ((0L, 0L, 0.0, false)), "short doc must score 0, not null")
    assert(out(5L) == ((0L, 0L, 0.0, false)), "null text must score 0, not null")
  }

  test("nearDupOverlap catches a reworded benchmark doc that 13-grams miss") {
    // benchmark doc: 48 distinct tokens; the "training leak" rewords
    // every 12th token — the longest unchanged run is 11 tokens, so NO
    // 13-gram survives and exact decontamination scores it clean, while
    // most 3-shingles are untouched and the near-dup form flags it
    val benchTokens = (0 until 48).map(i => s"tok$i")
    val reworded = benchTokens.zipWithIndex
      .map { case (t, i) => if (i % 12 == 11) s"CHANGED$i" else t }
    val bench = Seq((900L, benchTokens.mkString(" "))).toDF("doc_id", "text")
    val leak = Seq(
      (1L, reworded.mkString(" ")),
      (2L, "an entirely different document about other things")
    ).toDF("doc_id", "text")

    val exact = Decontam.overlapStats(leak, bench, "text", "doc_id",
        n = 13, threshold = 0.01)
      .select($"doc_id", $"contaminated").as[(Long, Boolean)].collect().toMap
    assert(!exact(1L), "rewording every 12th token defeats exact 13-grams")

    val near = Decontam.nearDupOverlap(leak, bench, "text", "doc_id",
        shingle = 3, minJaccard = 0.5)
      .select($"doc_id", $"bench_id", $"jaccard")
      .as[(Long, Long, Double)].collect()
    assert(near.map(r => (r._1, r._2)).toSet == Set((1L, 900L)),
      s"the reworded doc (and only it) must flag: ${near.toSeq}")
    assert(near.head._3 > 0.5 && near.head._3 < 1.0)

    val kept = Decontam.decontaminateNearDup(leak, bench, "text", "doc_id",
        shingle = 3, minJaccard = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), "the acting form drops exactly the flagged doc")
  }

  test("nearDupOverlap: over-budget benchmark fails fast (broadcast contract)") {
    val bench = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Decontam.nearDupOverlap(bench, bench, "text", "doc_id",
        maxBenchDocs = 2L)
    }
    assert(e.getMessage.contains("nearDupCandidates"), e.getMessage)
    // raised deliberately, the same call plans fine
    Decontam.nearDupOverlap(bench, bench, "text", "doc_id",
      maxBenchDocs = 3L).collect()
  }

  test("nearDupOverlap: corpus side reaches the candidate join unshuffled") {
    val d = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val flagged = Decontam.nearDupOverlap(
      d.filter($"doc_id" % 10 =!= 0), d.filter($"doc_id" % 10 === 0),
      "text", "doc_id")
    flagged.collect()
    // the band-signature join must be broadcast (benchmark side) — the
    // corpus's signature stream joins it without an exchange below
    val bhj = collectPlan(flagged.queryExecution.executedPlan) {
      case j if j.nodeName.contains("BroadcastHashJoin") => j }
    assert(bhj.nonEmpty, "benchmark signatures must broadcast")
    val sigJoins = bhj.filter(_.schema.fieldNames.contains("__band"))
    assert(sigJoins.nonEmpty, "expected the (band, sig) candidate join")
    val shuffled = sigJoins.flatMap(_.collect { case e: ShuffleExchangeLike => e })
    assert(shuffled.isEmpty,
      s"the corpus must stream into the candidate join unshuffled: $shuffled")
  }

  test("overlapStats: literal-intersect path == broadcast-join path") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val bench = docs.filter($"doc_id" % 7 === 0)
    // include a DUPLICATED id and a NULL id: scoring is per row, so the
    // two branches must agree even when idCol is not a key
    val dup = docs.filter($"doc_id" === 7).limit(1)
    val nullId = bench.limit(1)
      .select(lit(null).cast("long").as("doc_id"), $"text", $"lang",
        $"source", $"n_chars")
    val rest = docs.filter($"doc_id" % 7 =!= 0)
      .unionByName(dup).unionByName(nullId)
    def run(limit: Int) =
      Decontam.overlapStats(rest, bench, "text", "doc_id", n = 3,
          threshold = 0.05, literalLimit = limit)
        .select($"doc_id", $"matched", $"n_grams").as[(Option[Long], Long, Long)]
        .collect().sortBy(r => (r._1.getOrElse(-1L), r._2)).toSeq
    val viaLiteral = run(Decontam.LiteralGramLimit)
    val viaJoin = run(0)
    assert(viaLiteral.nonEmpty && viaLiteral == viaJoin)
    assert(viaLiteral.exists(_._2 > 0), "fixture should produce some overlap")
    // the null-id row is verbatim benchmark text: fully contaminated on
    // BOTH branches (it would silently score 0 if scoring keyed on id)
    assert(viaLiteral.filter(_._1.isEmpty).forall(r => r._2 == r._3 && r._3 > 0))
  }

  test("plan: literal decontamination path never shuffles the corpus") {
    val out = Decontam.overlapStats(corpus, benchmark, "text", "doc_id", n = 3)
    val shuffles = collectPlan(out.queryExecution.executedPlan) {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, s"expected a fully narrow plan: $shuffles")
  }

  test("decontaminate drops exactly the flagged documents") {
    val kept = Decontam.decontaminate(corpus, benchmark, "text", "doc_id",
        n = 3, threshold = 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L, 4L, 5L))
  }

  test("repetition signals: hand-computed runs, zero-shuffle plan") {
    val df = Seq(
      // 3-grams: [a b a, b a b, a b a, b a b, a b c] -> total 5, distinct
      // 3, dups 2/5, top "a b a"=2 -> 2/5
      (1L, "a b a b a b c"),
      // grams [x y x, y x y, x y x] -> total 3, distinct 2,
      // dup 1/3, top 2/3
      (2L, "x y x y x"),
      // no repeats
      (3L, "one two three four"),
      (4L, "too short"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Repetition.signals(df, "text", n = 3)
      .select($"doc_id", $"total_grams", $"distinct_grams",
        $"dup_fraction", $"top_fraction")
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(m(1L) == ((5L, 3L, 0.4, 0.4)), s"doc1: ${m(1L)}")
    assert(m(2L) == ((3L, 2L, 1.0 / 3, 2.0 / 3)), s"doc2: ${m(2L)}")
    assert(m(3L) == ((2L, 2L, 0.0, 0.5)))
    assert(m(4L) == ((0L, 0L, 0.0, 0.0)))
    assert(m(5L) == ((0L, 0L, 0.0, 0.0)))
    val shuffles = collectPlan(out.queryExecution.executedPlan) {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, s"repetition scoring must be narrow: $shuffles")
  }

  test("repetition: native kernel == composable HOF fold over the corpus") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"total_grams", $"distinct_grams",
          $"dup_fraction", $"top_fraction")
        .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val native = snap(Repetition.signals(docs, "text"))
    val composable = snap(Repetition.signalsComposable(docs, "text"))
    assert(native.nonEmpty && native == composable)
  }

  test("Repetition.filter keeps docs under both ceilings") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),   // top_fraction 1.0 -> dropped
      (2L, "assorted words with no repeats at all")
    ).toDF("doc_id", "text")
    val kept = Repetition.filter(df, "text", n = 3).select($"doc_id")
      .as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }
}
