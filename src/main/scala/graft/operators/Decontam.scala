package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Benchmark decontamination: flag (and drop) training documents that
  * overlap a held-out evaluation set by shared word n-grams — the
  * standard "13-gram overlap" check run before any LLM training job.
  *
  * Scale shape (the IVF/withNearest pattern applied to text): the
  * benchmark side of a decontamination run is megabytes (eval sets),
  * the corpus side is the 100 TB. So the benchmark's distinct grams are
  * collected once, bounded, and the corpus-side check is a fully NARROW
  * codegen'd kernel call per row (`graft_gram_overlap`: shingle + dedup
  * + count members of the per-plan benchmark hash set in one pass) —
  * zero shuffles, zero joins, the corpus never moves. Past
  * [[LiteralGramLimit]] the same semantics run as a broadcast-hash join
  * + per-doc count (one small post-join aggregation; the corpus still
  * never shuffles its full width).
  */
object Decontam {

  /** Above this many benchmark grams the literal-array form would bloat
    * every task's serialized plan; switch to the broadcast-join form
    * (batch only — [[graft.streaming.DecontamGate]] requires the
    * literal branch and fails fast past this). */
  private[graft] val LiteralGramLimit: Int = 1 << 16

  /** [[semanticOverlap]]'s benchmark budget: total embedding VALUES
    * (rows × dim) before the O(corpus × benchmark) eval-gate design
    * fails fast. 2²¹ doubles ≈ 16 MB broadcast ≈ 32 k vectors at
    * dim 64 — an order of magnitude above any real eval suite, an
    * order of magnitude below where the nested loop starts to hurt. */
  val MaxBenchValues: Long = 1L << 21

  /** Per-document overlap stats against `benchmark`:
    * `n_grams` (distinct grams in the doc), `matched` (of those, how many
    * appear anywhere in the benchmark), `contamination` (= matched /
    * n_grams, 0.0 for gram-less docs), `contaminated`
    * (contamination > `threshold`). Input columns are preserved. Scoring
    * is strictly per ROW — `idCol` never keys it, so null or duplicated
    * ids score identically on both execution branches.
    */
  def overlapStats(corpus: DataFrame, benchmark: DataFrame,
                   textCol: String, idCol: String,
                   n: Int = 13, threshold: Double = 0.01,
                   literalLimit: Int = LiteralGramLimit): DataFrame =
    overlapCore(corpus, Text.tokens(col(textCol)),
      benchmark, Text.tokens(col(textCol)), n, threshold, literalLimit)

  /** [[overlapStats]] in MODEL-TOKEN space — decontamination run AFTER
    * tokenization, so the check meters exactly what the trainer sees
    * (the q107/q117 motif): grams are `n`-runs of token IDS from an
    * `array<int>` column (the [[Tokenizer.encode]] output), matched
    * against the tokenized benchmark's id-grams. Id-grams are
    * SUBWORD-granular (an n-id run is typically shorter than n words)
    * and live in exactly the normalization the model memorizes, so the
    * check neither misses spans that word-grams straddle nor depends on
    * a second, text-side normalization agreeing with the tokenizer's;
    * this is the form modern pipelines gate on. Same two execution
    * branches and scale posture as [[overlapStats]] — the corpus never
    * shuffles. */
  def idOverlapStats(corpus: DataFrame, benchmark: DataFrame,
                     idsCol: String, n: Int = 13, threshold: Double = 0.01,
                     literalLimit: Int = LiteralGramLimit): DataFrame = {
    def idToks = transform(
      coalesce(col(idsCol), array().cast("array<int>")), i => i.cast("string"))
    overlapCore(corpus, idToks, benchmark, idToks, n, threshold, literalLimit)
  }

  /** The shared two-branch engine of [[overlapStats]] /
    * [[idOverlapStats]]: token columns in, per-row overlap stats out. */
  private def overlapCore(corpus: DataFrame, corpusToks: Column,
                          benchmark: DataFrame, benchToks: Column,
                          n: Int, threshold: Double,
                          literalLimit: Int): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def gramsCol(toks: Column): Column =
      coalesce(array_distinct(Text.shinglesNative(toks, n)),
        array().cast("array<string>"))
    val benchGrams = benchmark
      .select(explode(gramsCol(benchToks)).as("__gram"))
      .distinct()

    // Pre-compute the decision on the benchmark (small by contract): if it
    // fits the literal budget, the corpus-side plan is narrow end-to-end.
    val grams: Array[String] =
      benchGrams.limit(literalLimit + 1).as[String](spark.implicits.newStringEncoder)
        .collect()

    val counted =
      if (grams.length <= literalLimit) {
        // One native codegen'd call per row (graft_gram_overlap): shingle,
        // dedup, and count benchmark members in a single kernel pass. The
        // benchmark hash set is built once per plan — NOT per row, the way
        // `array_intersect` against a literal re-hashes its argument, and
        // NOT through the interpreted `Text.shingles` HOF, which dominates
        // wall time when evaluated per corpus row.
        graft.functions.GraftFunctions.ensureRegistered(spark)
        val toks = coalesce(corpusToks, array().cast("array<string>"))
        corpus
          .withColumn("__ov", call_function(graft.functions.GramOverlap.name,
            toks, lit(grams), lit(n)))
          .withColumn("__n_grams", col("__ov.n_grams"))
          .withColumn("__matched", col("__ov.matched"))
          .drop("__ov")
      } else {
        // General form: explode corpus grams, broadcast-join the benchmark
        // grams, count matches per ROW, stitch back. The stitch key is an
        // internal per-row id, NOT idCol: a null or duplicated idCol must
        // not change scoring vs the per-row literal branch (null keys
        // never left-join back; duplicate keys would sum matches across
        // rows). monotonically_increasing_id is stable across the two
        // subtrees because both recompute the same deterministic scan
        // with the same partitioning. The only corpus shuffle is the
        // final row-id join; everything upstream of it carries
        // (row-id, gram) pairs, not document text.
        val withGrams = corpus.withColumn("__grams", gramsCol(corpusToks))
          .withColumn("__rid", monotonically_increasing_id())
        val matched = withGrams
          .select(col("__rid"), explode(col("__grams")).as("__gram"))
          .join(broadcast(benchGrams), "__gram")
          .groupBy(col("__rid"))
          .agg(count(lit(1)).as("__matched"))
        withGrams
          .withColumn("__n_grams", size(col("__grams")))
          .join(matched, Seq("__rid"), "left")
          .withColumn("__matched", coalesce(col("__matched"), lit(0L)))
          .drop("__grams", "__rid")
      }

    counted
      .withColumn("n_grams", col("__n_grams").cast("long"))
      .withColumn("matched", col("__matched").cast("long"))
      .withColumn("contamination",
        when(col("n_grams") > 0, col("matched").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", col("contamination") > threshold)
      .drop("__grams", "__n_grams", "__matched")
  }

  /** The filtering form: corpus minus contaminated documents. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    textCol: String, idCol: String,
                    n: Int = 13, threshold: Double = 0.01): DataFrame =
    overlapStats(corpus, benchmark, textCol, idCol, n, threshold)
      .filter(!col("contaminated"))
      .drop("n_grams", "matched", "contamination", "contaminated")

  /** The filtering form of [[idOverlapStats]] — decontamination in
    * MODEL-TOKEN space: corpus minus documents whose token-ID n-gram
    * overlap with the tokenized benchmark clears `threshold`. Both
    * frames' `idsCol` must come from the SAME tokenizer merges, or the
    * grams never collide and the check silently passes everything —
    * the caller owns that invariant (the Pipeline `decontamIds` stage
    * enforces it by encoding the benchmark with the run's own trained
    * merges). */
  def decontaminateIds(corpus: DataFrame, benchmark: DataFrame,
                       idsCol: String, n: Int = 13,
                       threshold: Double = 0.01): DataFrame =
    idOverlapStats(corpus, benchmark, idsCol, n, threshold)
      .filter(!col("contaminated"))
      .drop("n_grams", "matched", "contamination", "contaminated")

  /** NEAR-duplicate decontamination — the paraphrase-leak check exact
    * n-gram overlap cannot make: a benchmark document reworded every
    * dozen tokens shares no 13-gram with its training-set twin, yet
    * their small-shingle sets stay mostly identical. This is the cross-
    * corpus form of [[Dedup.nearDupCandidates]]: corpus and benchmark
    * MinHash band signatures (one narrow kernel projection each) meet in
    * a band-signature JOIN with the benchmark side broadcast — never the
    * within-frame bucket groupBy, because candidates here are corpus ×
    * benchmark only — and every candidate pair is re-scored on its exact
    * distinct-shingle Jaccard (the [[Dedup.nearDupVerified]] stage), so
    * banding false positives die before anyone acts on a flag. Returns
    * (`idCol`, bench_id, jaccard) for pairs with jaccard >= `minJaccard`.
    *
    * Scale: the corpus never shuffles into the candidate join — its
    * signature rows stream against the broadcast benchmark signatures;
    * the only shuffled frames afterwards are candidate-bounded (the
    * distinct + the gram joins, where AQE broadcasts the candidate list
    * against the corpus gram projection). Cost is O(corpus scan +
    * candidates), the decontamination analogue of the LSH dedup
    * posture. Benchmark smallness is a CONTRACT (eval sets are
    * megabytes); a benchmark too big to broadcast belongs in
    * [[Dedup.nearDupCandidates]] over the union instead. */
  /** SEMANTIC decontamination — the embedding-space member of the
    * family: a corpus row is contaminated when its embedding's cosine
    * against ANY benchmark embedding exceeds `tau` (paraphrases and
    * translations that n-gram overlap — [[overlapStats]] — and MinHash
    * — [[nearDupOverlap]] — both miss). Output: corpus `idCol`,
    * `max_cos` (6-dp, the nearest-benchmark evidence), `contaminated`.
    *
    * Benchmark-size BUDGET: the whole design is O(corpus × benchmark) —
    * sound only under the eval-gate contract that the benchmark is
    * megabytes. That contract is now ENFORCED, not just documented: a
    * benchmark carrying more than `maxBenchValues` embedding values
    * fails fast with a pointer at the SemDedup machinery, instead of
    * quietly turning the per-row fold into an hours-long nested loop
    * (the round-11 scale study measured exactly this when a fixture
    * grew the benchmark with the corpus). Raising the budget is a
    * deliberate caller decision, visible at the call site.
    *
    * Scale shape (the overlapStats contract in vector space, same two
    * branches): under `literalLimit` total benchmark values, the
    * benchmark rides the expression tree as a plan literal and the
    * per-row check is one narrow fold — ZERO shuffles, zero joins, the
    * corpus never moves. Above it, a broadcast nested-loop + one
    * map-side-combined (id, max) aggregate — the corpus still never
    * shuffles its width. The reduction is a MAX, which is exactly
    * order-independent (unlike a sum), so both branches and both
    * engines agree bit-for-bit. An empty benchmark yields null
    * `max_cos`/`contaminated` (no evidence — the caller decides the
    * policy). A benchmark at corpus scale wants the LSH-bucketed
    * [[SemDedup]] machinery instead — this is the eval-gate form. */
  def semanticOverlap(corpus: DataFrame, benchmark: DataFrame,
                      idCol: String, embCol: String, tau: Double = 0.95,
                      literalLimit: Int = LiteralGramLimit,
                      maxBenchValues: Long = MaxBenchValues): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    import graft.functions.Vectors
    val bench = benchmark.select(col(embCol).cast("array<double>").as("__b"))
    val nVals = bench.agg(coalesce(sum(size(col("__b"))), lit(0L)))
      .head().getLong(0)
    if (nVals > maxBenchValues) throw new IllegalArgumentException(
      s"semanticOverlap: benchmark carries $nVals embedding values, over " +
        s"the $maxBenchValues budget. The eval-gate contract is a " +
        "megabyte-scale benchmark (cost is O(corpus x benchmark)); a " +
        "benchmark at corpus scale wants the LSH-bucketed SemDedup " +
        "machinery instead, or pass a deliberately larger maxBenchValues")
    val mc: Column =
      if (nVals == 0) lit(null).cast("double")
      else if (nVals <= literalLimit) {
        val bvecs: Seq[Seq[Double]] =
          bench.collect().map(_.getSeq[Double](0).toSeq).toSeq
        aggregate(typedlit(bvecs), lit(Double.NegativeInfinity),
          (acc, bv) => greatest(acc, Vectors.cosine(col(embCol), bv)))
      } else null // broadcast branch below
    if (mc != null)
      corpus.select(col(idCol), round(mc, 6).as("max_cos"),
        (mc > tau).as("contaminated"))
    else {
      val b = benchmark.select(col(embCol).as("__bemb"))
      corpus.select(col(idCol), col(embCol))
        .join(broadcast(b), lit(true), "left")
        .select(col(idCol),
          Vectors.cosine(col(embCol), col("__bemb")).as("__cos"))
        .groupBy(col(idCol))
        .agg(max(col("__cos")).as("__mc"))
        .select(col(idCol), round(col("__mc"), 6).as("max_cos"),
          (col("__mc") > tau).as("contaminated"))
    }
  }

  def nearDupOverlap(corpus: DataFrame, benchmark: DataFrame,
                     textCol: String, idCol: String,
                     shingle: Int = 5, bands: Int = 4,
                     minJaccard: Double = 0.5,
                     maxBenchDocs: Long = MaxBenchValues): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // the same benchmark-smallness contract semanticOverlap enforces:
    // this design broadcasts the benchmark's signatures AND gram sets —
    // a benchmark that grew to corpus scale belongs in the union-side
    // Dedup.nearDupCandidates machinery, not a broadcast
    val nBench = benchmark.count()
    if (nBench > maxBenchDocs) throw new IllegalArgumentException(
      s"nearDupOverlap: benchmark carries $nBench documents, over the " +
        s"$maxBenchDocs budget. The eval-gate contract is a megabyte-" +
        "scale benchmark (its signatures and gram sets broadcast); a " +
        "benchmark at corpus scale wants Dedup.nearDupCandidates over " +
        "the union, or pass a deliberately larger maxBenchDocs")
    def sigs(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId), Text.tokens(col(textCol)).as("__tk"))
        .select(col(outId),
          posexplode(Text.minhashBandsNative(col("__tk"), shingle, bands)))
        .select(col(outId), col("pos").as("__band"), col("col").as("__sig"))
        .filter(col("__sig").isNotNull)
    def grams(df: DataFrame, outId: String, outSh: String): DataFrame =
      df.select(col(idCol).as(outId),
        array_distinct(Text.shinglesNative(Text.tokens(col(textCol)), shingle))
          .as(outSh))
    val cand = sigs(corpus, "__cid")
      .join(broadcast(sigs(benchmark, "__bid")), Seq("__band", "__sig"))
      .select(col("__cid"), col("__bid")).distinct()
    cand
      .join(grams(corpus, "__cid", "__sh_a"), Seq("__cid"))
      .join(broadcast(grams(benchmark, "__bid", "__sh_b")), Seq("__bid"))
      .select(col("__cid").as(idCol), col("__bid").as("bench_id"),
        (size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** The acting form of [[nearDupOverlap]]: corpus minus every document
    * with a verified near-duplicate in the benchmark (left-anti on the
    * flagged minority — the flagged list is contamination-sized). */
  def decontaminateNearDup(corpus: DataFrame, benchmark: DataFrame,
                           textCol: String, idCol: String,
                           shingle: Int = 5, bands: Int = 4,
                           minJaccard: Double = 0.5): DataFrame =
    corpus.join(
      nearDupOverlap(corpus, benchmark, textCol, idCol, shingle, bands,
        minJaccard).select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
