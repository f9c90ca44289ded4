package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Text, Vectors}

/** One-call corpus DATA CARD — the observability pass a curation run
  * publishes next to its output (docs, token mass, length quantiles,
  * emptiness, exact-dup mass, per-language / per-source composition) as
  * a long (section, key, value) frame: pipeline-diffable (join two
  * cards on (section, key) to see what a code change did to the
  * corpus), trivially unionable across snapshots, and schema-stable no
  * matter which dimensions exist.
  *
  * Scale posture: one narrow tokenize pass feeds everything; the only
  * shuffles are the exact-distinct on 16-byte text fingerprints (never
  * text), the [[Percentiles.quantileContHist]] value-histogram pass for
  * the exact token quantiles (token counts are discrete, so the corpus
  * collapses to |distinct counts| rows in one shuffle and the rank
  * window runs over THAT — a report pins numbers, so it uses an exact
  * form; the one-pass [[graft.functions.QuantileSketch]] is the
  * monitoring/streaming alternative), and report-sized group-bys on
  * the low-cardinality dimension columns. Output is report-sized;
  * nothing corpus-sized ever reaches the driver.
  *
  * Determinism: counts are exact; token quantiles are the q58-proven
  * interpolation; `mean` is one IEEE division of two exact values —
  * every cell hash-reproducible cross-engine (q194). */
object CorpusReport {

  /** Null/whitespace-only texts count as 0-token documents (they are
    * still documents — `n_empty` reports them). `exact_dup_docs` =
    * non-null texts minus distinct texts: the mass an exact-dedup pass
    * would remove.
    *
    * `urlCol` adds a `domain` section — the crawl-ops dimension ("which
    * ORIGINS did the gate hit"): per-domain doc counts for the TOP
    * `domainTopK` domains (by count desc, domain asc — deterministic at
    * the boundary), one `__other` row rolling up the rest (always
    * present, 0 when nothing rolls up — diff rows stay aligned), and
    * `__n_domains` = the exact distinct domain count. Unlike lang/
    * source, domain cardinality GROWS with a crawl, so the section is
    * capped to stay report-sized; the cut is a sort-limit
    * (TakeOrderedAndProject), never a global window, and the
    * |domains|-sized group frame is checkpointed once so the corpus is
    * not re-grouped per cell family. */
  def build(docs: DataFrame, textCol: String, idCol: String,
            langCol: Option[String] = None,
            sourceCol: Option[String] = None,
            urlCol: Option[String] = None,
            quantiles: Seq[(String, Double)] =
              Seq("p50" -> 0.5, "p90" -> 0.9),
            domainTopK: Int = 100): DataFrame = {
    require(domainTopK >= 1, s"domainTopK must be >= 1, got $domainTopK")
    val spark = docs.sparkSession
    val nTok = when(col(textCol).isNotNull,
      size(Text.tokens(col(textCol)))).otherwise(lit(0))
    val base = docs.select(col(idCol), col(textCol).as("__t"),
      nTok.as("__n"))
    def row(section: String, key: Column, value: Column): Column =
      struct(lit(section).as("section"), key.as("key"),
        value.cast("double").as("value"))
    val scalars = base.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__n") === 0, 1L).otherwise(0L)).as("n_empty"),
        sum(col("__n")).as("tok_total"),
        count(col("__t")).as("n_text"),
        countDistinct(md5(col("__t"))).as("n_distinct"))
      .select(explode(array(
        row("corpus", lit("n_docs"), col("n_docs")),
        row("corpus", lit("n_empty"), col("n_empty")),
        row("corpus", lit("exact_dup_docs"),
          col("n_text") - col("n_distinct")),
        row("tokens", lit("total"), col("tok_total")),
        row("tokens", lit("mean"),
          col("tok_total").cast("double") / col("n_docs").cast("double"))
      )).as("__r"))
      .select(col("__r.*"))
    val qrows =
      if (quantiles.isEmpty) spark.emptyDataFrame.select() // unreachable shape
      else Percentiles.quantileContHist(base, "__n", quantiles)
        .select(explode(array(quantiles.map { case (name, _) =>
          row("tokens", lit(name), col(name))
        }: _*)).as("__r"))
        .select(col("__r.*"))
    def dim(section: String, c: Option[String]): Seq[DataFrame] = c.toSeq.map {
      name =>
        docs.groupBy(coalesce(col(name).cast("string"), lit("null")).as("key"))
          .agg(count(lit(1)).as("n"))
          .select(lit(section).as("section"), col("key"),
            col("n").cast("double").as("value"))
    }
    val domainRows: Seq[DataFrame] = urlCol.toSeq.map { name =>
      val dom = docs
        .groupBy(coalesce(UrlOps.domainOf(col(name)), lit("null")).as("key"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // |domains|-sized; reused by cut/rollup/count
      val top = dom.orderBy(col("n").desc, col("key").asc).limit(domainTopK)
      val topRows = top.select(lit("domain").as("section"), col("key"),
        col("n").cast("double").as("value"))
      val totals = dom.agg(count(lit(1)).as("nd"), sum(col("n")).as("tot"))
      val topSum = top.agg(coalesce(sum(col("n")), lit(0L)).as("ts"))
      val summary = totals.crossJoin(broadcast(topSum)) // two one-row frames
        .select(explode(array(
          row("domain", lit("__n_domains"), col("nd")),
          row("domain", lit("__other"), col("tot") - col("ts"))
        )).as("__r"))
        .select(col("__r.*"))
      topRows.unionByName(summary)
    }
    (Seq(scalars) ++ (if (quantiles.isEmpty) Nil else Seq(qrows)) ++
      dim("lang", langCol) ++ dim("source", sourceCol) ++ domainRows)
      .reduce(_.unionByName(_))
  }

  /** Vector-corpus data card — the embedding-side sibling of [[build]],
    * same long (section, key, value) shape (so [[diff]] works on it
    * unchanged): vector count and nullness, DIMENSION consistency
    * (`dims/min` ≠ `dims/max` means ragged vectors — the malformation
    * every downstream kernel assumes away), norm quantiles, optional
    * label composition. Norms round to 6 dp first (the library's shared
    * cross-engine round, the q56 device). No cell ever SUMS doubles —
    * counts are exact longs and quantiles interpolate two picked values
    * ([[Percentiles.quantileContScan]]: norms are continuous, so the
    * rank scan, not the histogram) — the whole card hash-reproduces
    * cross-engine. */
  def vectorCard(df: DataFrame, vecCol: String,
                 labelCol: Option[String] = None,
                 quantiles: Seq[(String, Double)] =
                   Seq("p50" -> 0.5, "p90" -> 0.9)): DataFrame = {
    val v = col("__v")
    def row(section: String, key: Column, value: Column): Column =
      struct(lit(section).as("section"), key.as("key"),
        value.cast("double").as("value"))
    val base = df.select(col(vecCol).as("__v"))
      .withColumn("__n", when(v.isNotNull, size(v)))
      .withColumn("__norm", when(v.isNotNull, round(Vectors.norm(v), 6)))
    val scalars = base.agg(
        count(lit(1)).as("n_vecs"),
        sum(when(v.isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("__n")).as("dim_min"),
        max(col("__n")).as("dim_max"))
      .select(explode(array(
        row("corpus", lit("n_vecs"), col("n_vecs")),
        row("corpus", lit("n_null"), col("n_null")),
        row("dims", lit("min"), col("dim_min")),
        row("dims", lit("max"), col("dim_max"))
      )).as("__r"))
      .select(col("__r.*"))
    val qrows =
      if (quantiles.isEmpty) Nil
      else Seq(Percentiles.quantileContScan(base, "__norm", quantiles)
        .select(explode(array(quantiles.map { case (name, _) =>
          row("norm", lit(name), col(name))
        }: _*)).as("__r"))
        .select(col("__r.*")))
    val lab = labelCol.toSeq.map { c =>
      df.groupBy(coalesce(col(c).cast("string"), lit("null")).as("key"))
        .agg(count(lit(1)).as("n"))
        .select(lit("label").as("section"), col("key"),
          col("n").cast("double").as("value"))
    }
    (Seq(scalars) ++ qrows ++ lab).reduce(_.unionByName(_))
  }

  /** Cross-corpus exact-overlap report — the merge-planning statistic
    * ("how much of this new snapshot do we already hold"): ONE row of
    * distinct-text counts per side, the shared count, Jaccard, and
    * containment in both directions. Texts compare by the exact-dedup
    * fingerprint ([[graft.functions.Text.fingerprint]]: md5 of the
    * lowercased whitespace-normalized text — formatting noise doesn't
    * break overlap), nulls ignored, and all counts are over DISTINCT
    * texts, so duplicate mass inside one side never inflates overlap.
    *
    * Scale shape: each corpus collapses to its distinct 16-byte
    * fingerprint set (one shuffle per side, text never shuffles), the
    * sides full-outer join on the fingerprint (co-partitioned by the
    * same key), and one global aggregate folds the flags — output is
    * one row. Near-duplicate overlap is a different question with a
    * different budget: run [[Dedup]]'s banded signatures over the
    * union and count cross-side candidate pairs. */
  def overlap(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def fps(df: DataFrame, flag: String) =
      df.select(Text.fingerprint(col(textCol)).as("__fp"))
        .where(col("__fp").isNotNull)
        .distinct().withColumn(flag, lit(1L))
    fps(a, "__ina").join(fps(b, "__inb"), Seq("__fp"), "full_outer")
      .agg(
        sum(coalesce(col("__ina"), lit(0L))).as("n_a"),
        sum(coalesce(col("__inb"), lit(0L))).as("n_b"),
        sum(when(col("__ina").isNotNull && col("__inb").isNotNull, 1L)
          .otherwise(0L)).as("n_both"))
      .select(col("n_a"), col("n_b"), col("n_both"),
        (col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double"))
          .as("jaccard"),
        (col("n_both").cast("double") / col("n_a").cast("double"))
          .as("contain_a_in_b"),
        (col("n_both").cast("double") / col("n_b").cast("double"))
          .as("contain_b_in_a"))
  }

  /** NEAR-duplicate cross-corpus overlap — [[overlap]]'s companion for
    * the question exact fingerprints can't answer: how many documents
    * of each side have a banded-MinHash candidate on the OTHER side
    * (superset of exact overlap: an edited re-crawl keeps most of its
    * shingles, so it still collides on most bands). One row:
    * per-side signature-bearing doc counts, near counts, fractions.
    *
    * MEMBERSHIP, not pairs: each side left-SEMI joins the other side's
    * (band, sig) frame, so a boilerplate bucket costs its row count,
    * never |bucket_a|×|bucket_b| — no `maxBucket` star guard needed,
    * unlike the pair-emitting [[Dedup.candidatesFromSigs]]. Two
    * (band, sig) shuffles + distinct-id counts; the one-row stats
    * frames broadcast-join into the final row. Docs too short to
    * shingle carry no signature and are not counted on either axis
    * (`n_a`/`n_b` here = signature-bearing docs — compare [[overlap]]
    * for the exact-text axis over everything). */
  def nearOverlap(a: DataFrame, b: DataFrame, textCol: String,
                  idColA: String, idColB: String,
                  shingle: Int = 5, bands: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(a.sparkSession)
    def sigs(df: DataFrame, idCol: String) =
      df.select(col(idCol).as("__id"), Text.tokens(col(textCol)).as("__tk"))
        .select(col("__id"),
          posexplode(Text.minhashBandsNative(col("__tk"), shingle, bands)))
        .select(col("__id"), col("pos").as("__band"), col("col").as("__sig"))
        .filter(col("__sig").isNotNull)
    // each side's signature frame feeds TWO aggregates (its own count
    // and the semi-join); materialize once so the shingle→md5 kernel
    // pass runs once per side, not twice (the q188 artifact lesson)
    val sa = sigs(a, idColA).localCheckpoint()
    val sb = sigs(b, idColB).localCheckpoint()
    def n(s: DataFrame, name: String) =
      s.agg(countDistinct(col("__id")).as(name))
    def near(s: DataFrame, other: DataFrame, name: String) =
      n(s.join(other.select(col("__band"), col("__sig")),
        Seq("__band", "__sig"), "left_semi"), name)
    n(sa, "n_a").crossJoin(broadcast(n(sb, "n_b")))
      .crossJoin(broadcast(near(sa, sb, "n_a_near")))
      .crossJoin(broadcast(near(sb, sa, "n_b_near")))
      .select(col("n_a"), col("n_b"), col("n_a_near"), col("n_b_near"),
        (col("n_a_near").cast("double") / col("n_a").cast("double"))
          .as("frac_a_near"),
        (col("n_b_near").cast("double") / col("n_b").cast("double"))
          .as("frac_b_near"))
  }

  /** The exact column contract every store entry point validates: a
    * card is (section string, key string, value double) — the shape
    * [[build]]/[[vectorCard]] emit and [[diff]] joins on. */
  private val CardColumns = Seq("section", "key", "value")

  private def checkSnapshot(snapshot: String): Unit =
    require(snapshot.nonEmpty && snapshot.matches("[A-Za-z0-9._-]+"),
      s"card store: snapshot label must be path-safe " +
        s"([A-Za-z0-9._-]+): '$snapshot'")

  /** Persisted CARD STORE — the store discipline applied to the
    * observability artifacts: snapshots of (section, key, value) cards
    * land as hive-partitioned parquet under `path/snapshot=<label>/`,
    * so cross-snapshot diffs ([[diffSnapshots]]) and the streaming
    * twin ([[graft.streaming.CardStream.asCards]] publishing each
    * closed window as a snapshot) read the SAME artifact a batch run
    * published — not an in-session frame that dies with the job.
    *
    * Publishing a snapshot OVERWRITES its own partition directory and
    * nothing else: a re-publish (the crash-retry shape) converges to
    * the same bytes, and concurrent snapshots never touch each other's
    * directories. Cards are report-sized by construction, so each
    * snapshot coalesces to one file — a card store holding years of
    * snapshots is still tiny. The column contract is validated at the
    * door (a frame that isn't a card fails fast, not at some later
    * read), and labels must be path-safe — they become directory
    * names. */
  def writeCard(card: DataFrame, path: String, snapshot: String): Unit = {
    require(card.columns.toSeq == CardColumns,
      s"writeCard: a card is exactly ${CardColumns.mkString("(", ", ", ")")}" +
        s", got ${card.columns.mkString("(", ", ", ")")}")
    checkSnapshot(snapshot)
    card.select(col("section").cast("string"), col("key").cast("string"),
        col("value").cast("double"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/snapshot=$snapshot")
  }

  /** One stored snapshot back as the plain (section, key, value) card
    * frame — [[diff]]-composable with any other card, stored or
    * in-session. Fails (AnalysisException) when the snapshot was never
    * published. */
  def readCard(spark: org.apache.spark.sql.SparkSession, path: String,
               snapshot: String): DataFrame = {
    checkSnapshot(snapshot)
    spark.read.parquet(s"$path/snapshot=$snapshot")
  }

  /** The store's snapshot inventory: (snapshot, n_cells), one row per
    * published label — the "what do we hold" read before a diff. */
  def snapshots(spark: org.apache.spark.sql.SparkSession,
                path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("snapshot").cast("string").as("snapshot"))
      .agg(count(lit(1)).as("n_cells"))

  /** [[diff]] across two STORED snapshots — the cross-run read the
    * in-session diff can't do: `before`/`after` are labels previously
    * [[writeCard]]-published at `path`. */
  def diffSnapshots(spark: org.apache.spark.sql.SparkSession, path: String,
                    before: String, after: String): DataFrame =
    diff(readCard(spark, path, before), readCard(spark, path, after))

  /** Diff two cards (any (section, key, value) frames from [[build]]):
    * full-outer join on the key pair → (section, key, before, after,
    * delta). A cell absent on one side keeps a NULL on that side (and a
    * NULL delta) — absence is a fact worth seeing (a language that
    * vanished, a section only the new code emits), not a zero. THE
    * intended read: build the card before and after a pipeline change
    * and the diff answers "what did the change do to the corpus" —
    * e.g. whether a quality gate drops one language disproportionately.
    * Both sides are report-sized, so the join is trivially small. */
  def diff(before: DataFrame, after: DataFrame): DataFrame =
    before.as("b").join(after.as("a"),
        col("b.section") === col("a.section") && col("b.key") === col("a.key"),
        "full_outer")
      .select(
        coalesce(col("b.section"), col("a.section")).as("section"),
        coalesce(col("b.key"), col("a.key")).as("key"),
        col("b.value").as("before"),
        col("a.value").as("after"),
        (col("a.value") - col("b.value")).as("delta"))
}
