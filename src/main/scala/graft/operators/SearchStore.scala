package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The INCREMENTAL member of the retrieval family — the "index is a
  * store too" symmetry with the dedup stores ([[Dedup.fingerprintStore]]
  * et al.): instead of a materialized score table that every append
  * would invalidate (BM25 weights depend on the GLOBAL N/avgdl/df, so
  * they all change when documents arrive), the store persists the raw
  * sufficient statistics —
  *
  *   - `<name>_postings`: (token, id, tf, dl), bucketed on `token`;
  *   - `<name>_docs`:     (id, dl),            bucketed on `id`
  *
  * — and [[search]] computes fresh BM25 at query time from whatever the
  * store currently holds: scores are never stale, appends never rewrite,
  * and a query touches only its own terms' buckets (bucket pruning on
  * the `token IN (...)` filter — spec-pinned; df comes from the probed
  * postings alone, N/avgdl from one narrow doc-store aggregate).
  * Commits follow the family's anti-join discipline: a crash-retry
  * double-commit cannot double tf rows, and re-appending a committed
  * snapshot is a no-op.
  */
object SearchStore {

  /** (token, id, tf, dl, positions) — the per-(term, doc) sufficient
    * statistics, POSITIONAL: `positions` holds the 0-based token offsets
    * of every occurrence, sorted ascending (per-group aggregate state is
    * doc-length-bounded). BM25 never reads the column — parquet column
    * pruning keeps the score path's scan at (token, id, tf, dl), so the
    * positional store costs the ranking queries nothing (spec-pinned);
    * phrase/proximity queries ([[phraseSearch]]) are what it buys. */
  def postings(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        coalesce(Text.tokens(col(textCol)), array().cast("array<string>"))
          .as("__tk"))
      .select(col("id"), size(col("__tk")).cast("long").as("dl"),
        // outer + isNotNull, NOT a bare posexplode: the non-outer form
        // trips InferFiltersFromGenerate, which inlines the tokenize
        // into a pre-Generate filter and runs split() twice per row
        posexplode_outer(col("__tk")).as(Seq("pos", "token")))
      .filter(col("token").isNotNull)
      .groupBy(col("token"), col("id"), col("dl"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .select(col("token"), col("id"), col("tf"), col("dl"), col("positions"))

  /** (id, dl) for every document — token-less ones included (they count
    * in N and avgdl, the [[Bm25.weights]] convention). */
  def docLengths(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      coalesce(size(Text.tokens(col(textCol))), lit(0)).cast("long").as("dl"))

  /** Creates `<name>_postings` + `<name>_docs` bucketed stores. */
  def write(corpus: DataFrame, textCol: String, idCol: String,
            name: String, buckets: Int): Unit = {
    graft.sinks.Bucketing.writeBucketed(
      postings(corpus, textCol, idCol), s"${name}_postings",
      Seq("token"), buckets)
    graft.sinks.Bucketing.writeBucketed(
      docLengths(corpus, textCol, idCol), s"${name}_docs",
      Seq("id"), buckets)
  }

  /** The COMMIT step: appends a new snapshot's statistics, anti-joined
    * against the store first (docs on `id`, postings on (token, id)) so
    * double-commits cannot double term frequencies. Bucket layouts are
    * preserved; compact with
    * [[graft.sinks.Bucketing.compactBucketed]] as rounds accumulate. */
  def append(batch: DataFrame, textCol: String, idCol: String,
             name: String): Unit = {
    val spark = batch.sparkSession
    def buckets(t: String): Int =
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t))
        .bucketSpec.getOrElse(throw new IllegalArgumentException(
          s"'$t' is not a bucketed store table")).numBuckets
    postings(batch, textCol, idCol)
      .join(spark.table(s"${name}_postings").select(col("token"), col("id")),
        Seq("token", "id"), "left_anti")
      .repartition(buckets(s"${name}_postings"), col("token"))
      .write.mode("append").insertInto(s"${name}_postings")
    docLengths(batch, textCol, idCol)
      .join(spark.table(s"${name}_docs").select(col("id")),
        Seq("id"), "left_anti")
      .repartition(buckets(s"${name}_docs"), col("id"))
      .write.mode("append").insertInto(s"${name}_docs")
  }

  /** Top-`k` documents by summed BM25 over `terms`, from pure frames —
    * the scoring algebra [[search]] runs against the store tables,
    * exposed for composition and the q119 oracle. Per-term weights are
    * the [[Bm25.weights]] formula (rounded 6 dp), summed per document
    * and re-rounded; ties break on the id. The top-k is a distributed
    * TakeOrdered heap, never a global sort. */
  def searchFrames(postings: DataFrame, docLens: DataFrame,
                   terms: Seq[String], k: Int,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(k >= 1, s"k must be positive: $k")
    val probed = postings.filter(col("token").isin(terms: _*))
    val stats = docLens.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val dft = probed.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1)
    probed
      .join(broadcast(dft), "token")
      .crossJoin(broadcast(stats))
      .select(col("id"),
        round(idf * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))), 6)
          .as("__w"))
      .groupBy(col("id"))
      .agg(round(sum(col("__w")), 6).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** [[searchFrames]] over the persisted store: only `terms`' buckets of
    * the postings table are read (bucket pruning), df covers exactly the
    * probed terms, and N/avgdl come from one narrow doc-store pass —
    * query cost scales with the TERMS, not the corpus. */
  def search(spark: SparkSession, name: String, terms: Seq[String], k: Int,
             k1: Double = 1.2, b: Double = 0.75): DataFrame =
    searchFrames(spark.table(s"${name}_postings"),
      spark.table(s"${name}_docs"), terms, k, k1, b)

  /** Top-`k` documents containing the exact token `phrase`, with the
    * occurrence count — positional intersection over the postings:
    * phrase slot i's positions are shifted by −i, and the intersection
    * of all shifted arrays is exactly the set of match START offsets
    * (overlapping matches included — "a a a" matches "a a" twice).
    *
    * The probe reads only the phrase's tokens' rows (bucket-pruned on a
    * store table, same as [[search]]); each candidate doc's work is one
    * ordered fold of `array_intersect` over its ≤ |phrase| shifted
    * arrays (slot-sorted — one defined order), so per-doc state is
    * doc-length-bounded and the shuffle carries phrase-term postings,
    * never the corpus. Duplicate phrase tokens are handled by slot
    * identity: each slot joins the token's single posting row, docs
    * must cover ALL slots. Ranking = occurrences desc, id tiebreak, via
    * a distributed TakeOrdered heap. */
  def phraseSearchFrames(postings: DataFrame, phrase: Seq[String],
                         k: Int): DataFrame = {
    require(phrase.nonEmpty, "need a non-empty phrase")
    require(k >= 1, s"k must be positive: $k")
    val spark = postings.sparkSession
    import spark.implicits._
    val slots = phrase.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("__slot", "token")
    val probed = postings.filter(col("token").isin(phrase.distinct: _*))
    probed.join(broadcast(slots), "token")
      .select(col("id"), col("__slot"),
        transform(col("positions"), p => p - col("__slot")).as("__sp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__nslots"),
        array_sort(collect_list(struct(col("__slot"), col("__sp"))))
          .as("__sl"))
      .filter(col("__nslots") === phrase.length)
      .select(col("id"),
        transform(col("__sl"), s => s.getField("__sp")).as("__arrs"))
      .select(col("id"),
        size(aggregate(
          slice(col("__arrs"), 2, phrase.length - 1),
          element_at(col("__arrs"), 1),
          (acc, x) => array_intersect(acc, x))).cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
      .orderBy(col("n_matches").desc, col("id"))
      .limit(k)
  }

  /** [[phraseSearchFrames]] over the persisted store — the phrase reads
    * only its own tokens' buckets. */
  def phraseSearch(spark: SparkSession, name: String, phrase: Seq[String],
                   k: Int): DataFrame =
    phraseSearchFrames(spark.table(s"${name}_postings"), phrase, k)
}
