package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixing — the "data mixture" step of a training
  * pipeline: down-sample each source to its target rate and union, with
  * membership decided by a content-addressed hash (the same device as
  * [[Splits]]): a document's keep/drop fate depends only on its id and
  * the source's salt, so mixtures are reproducible across reruns,
  * cluster sizes, and partitionings, and never need a global count or
  * shuffle — sampling is a map-side filter.
  */
object Mix {

  /** 0..9999 bucket from the salted id hash (0.01% rate resolution). */
  def bucket(id: Column, salt: String): Column =
    bucketSalted(id, lit(salt))

  /** [[bucket]] with a per-ROW salt column (e.g. the source name). */
  def bucketSalted(id: Column, salt: Column): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":"), salt)), 1, 8), 16, 10)
      .cast("long") % 10000

  /** Keep ~`rate` of rows, deterministically by id. */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double,
                   salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.where(bucket(col(idCol), salt) < lit((rate * 10000).round))
  }

  /** Temperature-balanced source mixing at α = 0.5 (the multilingual
    * corpus-balancing rule: sampling mass ∝ size^α, so each source keeps
    * `sqrt(min_size / size)` of its documents — big sources shrink
    * toward the smallest, which survives whole). α = 0.5 on purpose:
    * `sqrt` is IEEE-correctly-rounded, so thresholds derived from exact
    * integer counts are bit-identical in any engine — a general-α `pow`
    * is not, and a last-ulp difference flips keep/drop decisions at the
    * threshold. No float summation anywhere: the rule needs only each
    * source's count and the global min, both exact integers.
    *
    * Shape at 100 TB: one source-cardinality count (map-side combined),
    * a one-row min, thresholds broadcast back onto the corpus, then the
    * same map-side content-addressed filter as [[sampleByHash]] — the
    * corpus never shuffles. */
  def balanceSources(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__min_n"))
    val thresholds = counts.crossJoin(broadcast(minN))
      .select(col(sourceCol),
        round(sqrt(col("__min_n").cast("double") / col("__n")) * 10000)
          .cast("long").as("__thr"))
    df.join(broadcast(thresholds), Seq(sourceCol))
      .where(bucketSalted(col(idCol), col(sourceCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Deterministic UP-sampling — the other half of mixture weighting:
    * a repeat `factor` >= 0 per row (usually per source: epoch weights,
    * "see this corpus 2.5 times per epoch"). Each row is emitted
    * `floor(factor)` times plus one more when its content-addressed
    * bucket falls below the fractional part — so factor 2.5 yields 2 or
    * 3 copies (expectation 2.5), factor 0.3 degenerates to
    * [[sampleByHash]]'s keep/drop, and factor 0 drops the row; the
    * realized copy count depends only on (id, salt), reproducible
    * anywhere. Output adds a `copy` index (0-based) so downstream
    * shuffles/permutations treat copies as distinct rows.
    *
    * Shape at 100 TB: one narrow projection + an in-partition explode
    * (the [[Chunk]] posture, with the same explode_outer discipline so
    * the factor arithmetic is computed once, not inlined into an
    * inferred filter); no shuffle, no count, no global state. */
  def upsample(df: DataFrame, idCol: String, factor: Column,
               salt: String = ""): DataFrame = {
    // fail fast on factor < 0 (or null): floor(-0.3) = -1 would silently
    // DROP the row, masking a miscomputed weight upstream — the
    // "factor >= 0" contract is enforced, not just documented
    val checked = when(factor >= 0, factor).otherwise(raise_error(concat(
      lit("upsample factor must be >= 0, got "),
      coalesce(factor.cast("string"), lit("null")))).cast("double"))
    val whole = floor(checked).cast("long")
    val extra = when(
      bucket(col(idCol), salt) < round((checked - floor(checked)) * 10000),
      1L).otherwise(0L)
    // guard on the realized count, not the factor: Spark's sequence()
    // infers a NEGATIVE step when start > stop, so sequence(0, -1) is
    // [0, -1], not empty
    val k = whole + extra
    val copies = when(k > 0, sequence(lit(0L), k - 1L))
      .otherwise(array().cast("array<bigint>"))
    df.withColumn("__copies", copies)
      .select(col("*"), explode_outer(col("__copies")).as("copy"))
      .filter(col("copy").isNotNull)
      .drop("__copies")
  }

  /** Mix `(name, source, rate)` corpora: each source sampled at its rate
    * (salted by its name, so the same id draws independently per source)
    * and tagged with a `source` column. */
  def corpora(sources: Seq[(String, DataFrame, Double)], idCol: String): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    sources.map { case (name, df, rate) =>
      sampleByHash(df, idCol, rate, salt = name)
        .withColumn("source", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** UniMax sampling plan (Chung et al. 2023): distribute a total
    * training budget of `avgEpochs` × corpus size across languages as
    * UNIFORMLY as possible, subject to no language repeating more than
    * `maxEpochs` times — the published alternative to temperature
    * sampling ([[balanceSources]]) that never over-repeats low-resource
    * languages. The closed form is water-filling: each language gets
    * min(cap_l, c) docs where cap_l = maxEpochs·n_l and the water level
    * c is set so the allocations sum to the budget (languages below the
    * level saturate at their cap; if the budget exceeds Σ cap, every
    * language saturates and the surplus is unspent).
    *
    * Returns one row per language: `lang, n_docs, cap, alloc, epochs`
    * (epochs = alloc/n_docs ≤ maxEpochs). Feed `epochs` to [[upsample]]
    * to materialize the mixture.
    *
    * Implementation is fully declarative — the water level falls out of
    * one ordered window over the LANGUAGE frame (caps ascending: the
    * saturated set is a prefix, so the unique level is the row whose
    * candidate `(B − prefix_before) / langs_remaining` lies between its
    * neighbors' caps). Window state is one row per language — bounded
    * by the language inventory, never the corpus — and every arithmetic
    * step is exact-integer-derived doubles, so the plan is
    * bit-reproducible in any engine. The corpus itself contributes one
    * map-side-combined count. */
  def unimaxPlan(df: DataFrame, langCol: String,
                 avgEpochs: Double = 2.0, maxEpochs: Double = 3.0): DataFrame =
    unimaxPlanBy(df, langCol, lit(1L), avgEpochs, maxEpochs)

  /** [[unimaxPlan]] with a per-ROW mass column instead of a document
    * count — the budget a trainer actually allocates is TOKENS, so pass
    * the token count (`n_docs`/`cap`/`alloc` are then token masses and
    * `epochs` stays a pure ratio). Any non-negative integral weight
    * keeps the exact-arithmetic parity contract (sums stay exact
    * integers below 2^53). */
  def unimaxPlanBy(df: DataFrame, langCol: String, weight: Column,
                   avgEpochs: Double = 2.0, maxEpochs: Double = 3.0): DataFrame = {
    require(avgEpochs > 0 && maxEpochs > 0 && maxEpochs >= avgEpochs,
      s"unimaxPlan: need 0 < avgEpochs <= maxEpochs, got $avgEpochs/$maxEpochs")
    val langs = df.groupBy(col(langCol).as("lang"))
      .agg(sum(weight.cast("long")).as("n_docs"))
      .withColumn("cap", col("n_docs") * lit(maxEpochs))
    // the whole water-filling runs over ONE packed language array —
    // bounded by the language inventory, never the corpus — instead of
    // unpartitioned windows over the language frame (same serial state,
    // but the plan carries no empty-partition-spec WindowExec, r19's
    // zero-global-windows contract). array_sort on (cap, lang, …)
    // structs is exactly the old ORDER BY cap, lang; the cumulative cap
    // is a left-to-right double fold over the same sorted prefix, so
    // every value is bit-identical to the window form.
    val sorted = langs
      .agg(collect_list(struct(col("cap"), col("lang"), col("n_docs")))
        .as("__a"))
      .select(array_sort(col("__a")).as("__s"))
    val ord = sorted
      .withColumn("__budget",
        aggregate(col("__s"), lit(0L),
          (a, x) => a + x.getField("n_docs")) * lit(avgEpochs))
      .withColumn("__nl", size(col("__s")))
      .select(col("__s"), col("__budget"), col("__nl"),
        posexplode(col("__s")).as(Seq("__i", "__x")))
      .select(
        col("__x.lang").as("lang"),
        col("__x.n_docs").as("n_docs"),
        col("__x.cap").as("cap"),
        col("__budget"),
        (col("__i") + 1).as("__r"),
        aggregate(slice(col("__s"), lit(1), col("__i") + 1), lit(0.0),
          (a, x) => a + x.getField("cap")).as("__cum"),
        col("__nl"),
        when(col("__i") >= 1,
          element_at(col("__s"), col("__i")).getField("cap"))
          .as("__prev_cap"))
    // candidate level assuming the first __r - 1 languages saturate
    val lvl = ord
      .withColumn("__c", (col("__budget") - (col("__cum") - col("cap")))
        / (col("__nl") - col("__r") + 1))
      .filter(col("__c") <= col("cap") &&
        (col("__prev_cap").isNull || col("__c") >= col("__prev_cap")))
      .agg(min(col("__c")).as("__level")) // unique when B < Σcap; null else
    ord.crossJoin(broadcast(lvl))
      .select(col("lang"), col("n_docs"), col("cap"),
        when(col("__level").isNull, col("cap"))
          .otherwise(least(col("cap"), col("__level"))).as("alloc"))
      .withColumn("epochs", col("alloc") / col("n_docs"))
  }

  /** Quality-ordered token-budget selection — the step that turns "a
    * scored corpus" into "the B-token training set": keep documents in
    * descending `scoreCol` order (ties by ascending `idCol`, so the
    * cut is deterministic) while the running token total still fits
    * `budget`; the first document that would cross the budget, and
    * everything below it in quality order, is dropped (strict fit — a
    * trainer would rather under-fill than truncate a document). Adds
    * `cum_tokens`, the inclusive running total in selection order.
    *
    * Null-score contract: a NULL `scoreCol` means UNSCORED, and an
    * unscored document is never selected — it is filtered out before
    * the scan, not ordered. (The ordering struct negates the score, and
    * a negated NULL would sort nulls-FIRST, silently handing unscored
    * documents top budget priority — the exact inversion of the
    * documented descending-quality order.)
    *
    * Scale shape: ONE range shuffle + materialization
    * ([[Prefix.cumsum]]'s two-pass scan — interior sums are
    * partition-local; the only unpartitioned window is over the
    * per-partition subtotal frame, bounded by partition COUNT) + a
    * filter. The naive `sum over (order by score)` would funnel the
    * corpus through one window task. */
  def selectByTokenBudget(df: DataFrame, scoreCol: String, tokenCol: String,
                          idCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"selectByTokenBudget: budget must be positive: $budget")
    Prefix.cumsum(
        df.filter(col(scoreCol).isNotNull).withColumn("__ord",
          struct((-col(scoreCol)).as("s"), col(idCol).as("i"))),
        "__ord", tokenCol, "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .drop("__ord")
  }

  /** [[selectByTokenBudget]] with a PER-GROUP budget — the multilingual
    * assembly step: [[unimaxPlanBy]] (or any allocator) decides each
    * language's token mass, THIS fills each allocation with that
    * language's best documents. `budgets` is a group-frame-bounded
    * `(groupCol, budgetCol)` frame (broadcast); groups without a budget
    * row are dropped — an allocator that wants a language kept whole
    * says so with a budget, it doesn't get it by omission. The running
    * totals restart per group ([[Prefix.cumsumByGroup]]), so with a
    * group key there is no unpartitioned window anywhere. NULL scores
    * are filtered out, not ordered — the [[selectByTokenBudget]]
    * null-score contract. */
  def selectByTokenBudgetByGroup(df: DataFrame, groupCol: String,
                                 scoreCol: String, tokenCol: String,
                                 idCol: String, budgets: DataFrame,
                                 budgetCol: String = "budget"): DataFrame = {
    require(budgets.columns.contains(groupCol),
      s"selectByTokenBudgetByGroup: budgets frame lacks '$groupCol'")
    require(budgets.columns.contains(budgetCol),
      s"selectByTokenBudgetByGroup: budgets frame lacks '$budgetCol'")
    Prefix.cumsumByGroup(
        df.filter(col(scoreCol).isNotNull).withColumn("__ord",
          struct((-col(scoreCol)).as("s"), col(idCol).as("i"))),
        Seq(groupCol), "__ord", tokenCol, "cum_tokens")
      .join(broadcast(budgets.select(col(groupCol),
        col(budgetCol).as("__budget"))), Seq(groupCol))
      .filter(col("cum_tokens") <= col("__budget"))
      .drop("__ord", "__budget")
  }
}
