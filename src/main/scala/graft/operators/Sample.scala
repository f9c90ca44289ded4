package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}

/** Deterministic uniform sampling — the inspection/eval primitive a
  * curation pipeline needs ("show me k random documents per domain /
  * per split / per cluster") in a form that is stable across reruns,
  * engines, and cluster sizes.
  *
  * Rank rows by `md5(id:salt)` — a uniform draw on [0, 2^32) that any
  * engine reproduces bit-for-bit (the [[Splits]] construction) — and
  * keep each group's k SMALLEST via the k-bounded heap aggregate
  * ([[graft.functions.TopKByScore]]). The shuffle therefore carries
  * groups × k rows, never the population: the `ORDER BY rand() LIMIT k`
  * anti-pattern this replaces shuffles and sorts every candidate row
  * per group onto one task, and `rand()` changes under reruns, retries,
  * and repartitioning. Changing `salt` redraws an independent sample.
  */
object Sample {

  /** Deterministic global corpus permutation — the "shuffle the corpus
    * before sharding" step of a training-data pipeline, reproducible
    * across reruns, engines, and cluster sizes (unlike
    * `orderBy(rand())`): every row gets `pos` = its 1-based rank in
    * md5(id:salt) order. At scale this is a range-partitioned sort plus
    * the [[Prefix.cumsum]] two-pass position assignment — no global
    * window, no single-task sort; the only unpartitioned state is one
    * row per partition. `salt` redraws the permutation; md5 keys are
    * unique per id short of a digest collision, so the order is total.
    * Output: (`idCol`, pos). */
  def permute(df: DataFrame, idCol: String, salt: String = ""): DataFrame = {
    val key = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    Prefix.cumsum(
      df.select(col(idCol), key.as("__key"), lit(1L).as("__one")),
      "__key", "__one", "pos")
      .select(col(idCol), col("pos"))
  }

  /** WEIGHTED sampling without replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): each row draws the
    * exponential key `-ln(u) / w` from its deterministic uniform
    * `u = (h + 1) / 2^32` (the md5(id:salt) draw, +1 keeps u in (0, 1]
    * so the log is finite) and the n SMALLEST keys win — exactly the
    * distribution of sequential weighted draws without replacement, so
    * a quality-weighted corpus subsample ("keep 1M documents, prefer
    * high-scoring ones, but keep diversity") falls out of one
    * expression plus a top-n. Deterministic across engines (the md5
    * arithmetic is the [[Splits]] construction; IEEE log/divide
    * reproduce bit-for-bit), rerun- and layout-stable, and `salt`
    * redraws independently.
    *
    * Scale shape: the key is a narrow codegen'd column; the n smallest
    * rows come from the heap-aggregate top-k ([[bottomK]]'s machinery,
    * one global group) — each partition keeps its own n candidates
    * map-side, ONE reduce task merges heaps of size n, the corpus never
    * sorts globally and never moves. Rows with NULL, zero, or negative
    * weight are excluded up front (a weightless row must not win by
    * numeric accident — the [[graft.operators.Mix]] null contract).
    * Output: (`idCol`, sample_key), n rows (fewer when the corpus is
    * smaller); winners re-join the source for their payload.
    *
    * Id types: the heap carries a LONG id, so an integral `idCol` rides
    * it directly. Any other type (a `readWarc` record_id string, a UUID)
    * takes the hashed detour: the heap ranks `xxhash64(id)` stand-ins,
    * the winning hashes semi-join back to the (id, key) rows — a
    * broadcast of n hashes, never a corpus shuffle — and an exact
    * re-selection over that ≤ n + collisions candidate set (bounded, so
    * the sort-limit is a TakeOrdered over driver-sized data) returns
    * precisely the n smallest keys even if two ids collide in the
    * 64-bit stand-in. The draw itself is IDENTICAL either way (the key
    * hashes the id's STRING form), so the selected set doesn't depend
    * on which path ran — the cost is one extra narrow pass over
    * (id, weight), nothing else. Silent wrongness is not on the menu:
    * before this detour a string id casted to NULL long inside the heap
    * and the sample came back empty. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, n: Int,
                     salt: String = ""): DataFrame = {
    require(n >= 1, s"sample size must be positive: $n")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val h = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long").cast("double")
    val u = (h + 1.0) / 4294967296.0 // (h + 1) / 2^32 ∈ (0, 1]
    val key = -log(u) / col(weightCol).cast("double")
    val eligible = df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
    if (integralId(df, idCol)) {
      eligible
        .select(col(idCol), col(weightCol), key.as("sample_key"))
        .groupBy()
        // negated: the max-heap keeps the smallest exponential keys; ties
        // are impossible short of a digest collision, so selection is total
        .agg(graft.functions.TopKByScore.topk(
          -col("sample_key"), col(idCol), n).as("__s"))
        .select(explode(col("__s")).as("__e"))
        .select(col("__e.id").as(idCol), (-col("__e.score")).as("sample_key"))
    } else {
      val keyed = eligible
        .select(col(idCol), key.as("sample_key"),
          xxhash64(col(idCol).cast("string")).as("__hid"))
      val winners = keyed
        .groupBy()
        .agg(graft.functions.TopKByScore.topk(
          -col("sample_key"), col("__hid"), n).as("__s"))
        .select(explode(col("__s")).as("__e"))
        .select(col("__e.id").as("__hid"))
        .distinct()
      keyed.join(broadcast(winners), Seq("__hid"), "left_semi")
        // candidate set is ≤ n + hash collisions BY CONSTRUCTION, so the
        // global sort is a bounded TakeOrdered, not a corpus sort; the id
        // tiebreak only fires on a full 128-bit digest collision
        .orderBy(col("sample_key"), col(idCol))
        .limit(n)
        .select(col(idCol), col("sample_key"))
    }
  }

  /** Per-GROUP weighted sampling without replacement — the stratified
    * form of [[weightedSample]]: n quality-weighted winners per group
    * (fewer when the group is smaller), e.g. "keep the best-weighted
    * 10k documents PER LANGUAGE, diversity included". Same
    * Efraimidis–Spirakis key, same heap aggregate, now one k-bounded
    * heap per group key: the shuffle carries groups × n entries, never
    * the population, and no group ever window-sorts. Output:
    * (groupCols..., `idCol`, sample_key). Integral ids only (the
    * [[bottomK]] contract — the heap's long slot; the global
    * [[weightedSample]] takes the hashed detour for strings because its
    * single-group re-selection is bounded, a per-group re-selection
    * would reintroduce the per-group top-k this aggregate exists to
    * avoid). */
  def weightedSampleByGroup(df: DataFrame, groupCols: Seq[String],
                            idCol: String, weightCol: String, n: Int,
                            salt: String = ""): DataFrame = {
    require(n >= 1, s"sample size must be positive: $n")
    require(groupCols.nonEmpty,
      "weightedSampleByGroup needs at least one group column")
    require(integralId(df, idCol),
      s"weightedSampleByGroup: idCol '$idCol' must be an integral type " +
        s"(got ${df.schema(idCol).dataType.simpleString}); the heap " +
        "carries long ids — derive a surrogate long id first, or sample " +
        "globally with weightedSample (which hashes non-integral ids).")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val h = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long").cast("double")
    val u = (h + 1.0) / 4294967296.0
    val key = -log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(groupCols.map(col) :+ col(idCol) :+ key.as("__k"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.TopKByScore.topk(
        -col("__k"), col(idCol), n).as("__s"))
      .select(groupCols.map(col) :+ explode(col("__s")).as("__e"): _*)
      .select(groupCols.map(col) :+ col("__e.id").as(idCol) :+
        (-col("__e.score")).as("sample_key"): _*)
  }

  /** Can `idCol` ride [[graft.functions.TopKByScore]]'s long id slot
    * losslessly? (The heap casts — a string would cast to NULL and
    * silently vanish.) */
  private def integralId(df: DataFrame, idCol: String): Boolean =
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }

  /** k-row uniform sample per group (fewer when the group is smaller):
    * (groupCols..., `idCol`). Ties (equal 32-bit hash prefixes) break
    * toward the smaller id — fully deterministic.
    *
    * `idCol` must be integral (it rides the heap's long id slot; a
    * string would cast to NULL inside the aggregate and the sample
    * would come back silently empty — so non-integral ids fail fast
    * here instead; hash or zip a surrogate long id first, or use
    * [[weightedSample]] with unit weights, which takes the hashed
    * detour automatically). */
  def bottomK(df: DataFrame, groupCols: Seq[String], idCol: String, k: Int,
              salt: String = ""): DataFrame = {
    require(k >= 1, s"sample size must be positive: $k")
    require(groupCols.nonEmpty, "bottomK needs at least one group column")
    require(integralId(df, idCol),
      s"bottomK: idCol '$idCol' must be an integral type (byte/short/int/" +
        s"long) — got ${df.schema(idCol).dataType.simpleString}; the heap " +
        "carries long ids, and a lossy cast would silently drop rows. " +
        "Derive a surrogate long id, or use weightedSample (unit weights) " +
        "which hashes non-integral ids.")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val h = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long").cast("double")
    df.select(groupCols.map(col) :+ col(idCol) :+ h.as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      // negated score: the max-heap keeps the smallest hashes
      .agg(graft.functions.TopKByScore.topk(-col("__h"), col(idCol), k).as("__s"))
      .select(groupCols.map(col) :+ explode(col("__s")).as("__e"): _*)
      .select(groupCols.map(col) :+ col("__e.id").as(idCol): _*)
  }
}
