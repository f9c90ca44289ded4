package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level cleaning (Raffel et al. 2020, §2.2 — the public
  * heuristics behind the C4 corpus, parameterized): a document is split
  * into lines; a line survives only if it (a) ends in terminal
  * punctuation, (b) has at least `minWords` whitespace words, and
  * (c) contains no blocklisted phrase. The document itself survives only
  * if at least `minLines` lines remain (and its full text trips no
  * document-level blocklist term); surviving lines are reassembled in
  * their original order.
  *
  * This is the line-granular sibling of [[Scrub]] (span rewrites) and
  * [[Normalize]] (codepoint rewrites): boilerplate menus, cookie banners
  * and code fragments are whole-LINE noise that span/codepoint passes
  * cannot see.
  *
  * Scale posture: a pure narrow codegen'd projection + filter — no
  * shuffle, no state, no UDFs (split / filter / array_join built-ins);
  * the 100 TB cost is the scan itself, and the operator composes into
  * any pipeline plan without adding a stage boundary. Valid in batch and
  * streaming plans alike (stateless row-at-a-time).
  */
object LineFilter {

  /** Default line blocklist: the C4 paper drops any line with the word
    * "javascript" (cookie/JS-warning boilerplate). */
  val DefaultLineBlock: Seq[String] = Seq("javascript")

  /** Default document blocklist: C4 drops whole pages containing
    * "lorem ipsum" (placeholder text) or "{" (source code). */
  val DefaultDocBlock: Seq[String] = Seq("lorem ipsum", "{")

  /** Array of surviving lines of `text`, original order preserved. */
  def keptLines(text: Column, minWords: Int = 5,
                blocklist: Seq[String] = DefaultLineBlock): Column =
    filter(split(text, "\n"), ln => {
      val words = filter(split(trim(ln), "\\s+"), w => length(w) > 0)
      val noBlock = blocklist.map(t => !contains(lower(ln), lit(t)))
        .reduceOption(_ && _).getOrElse(lit(true))
      (size(words) >= minWords) && ln.rlike("[.!?]\"?$") && noBlock
    })

  /** Corpus-level boilerplate line removal (the RefinedWeb/FineWeb
    * repeated-line rule, complementing [[Dedup.segmentDedup]]'s
    * keep-first policy): a line whose exact content appears in at least
    * `minDf` DISTINCT documents is boilerplate — cookie banners,
    * navigation, license headers — and is dropped from EVERY document
    * (first occurrence included; a banner has no rightful owner).
    * Reassembles `textCol` in order and adds `n_lines_kept` /
    * `n_boiler_dropped`.
    *
    * Scale posture: lines shuffle ONCE as 16-byte md5 keys for the
    * distinct-document-frequency count (map-side combined); the df
    * frame joins back onto the line stream and the rebuild is one
    * groupBy(id) with document-bounded state. Text itself never keys a
    * shuffle. */
  def dropBoilerplate(df: DataFrame, textCol: String, idCol: String,
                      minDf: Int = 10): DataFrame = {
    require(minDf >= 2, s"dropBoilerplate: minDf >= 2, got $minDf")
    val others = df.columns.filter(c => c != idCol && c != textCol)
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("__i", "__ln")))
      .withColumn("__h", md5(col("__ln")))
    val boiler = lines.groupBy(col("__h"))
      .agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__h"), lit(true).as("__boiler"))
    val rebuilt = lines
      .join(boiler, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(array_sort(collect_list(when(col("__boiler").isNull,
          struct(col("__i"), col("__ln"))))).getField("__ln"), "\n")
          .as(textCol),
        count(when(col("__boiler").isNull, 1)).cast("long").as("n_lines_kept"),
        count(col("__boiler")).cast("long").as("n_boiler_dropped"))
    df.select(col(idCol) +: others.map(col): _*)
      .join(rebuilt, Seq(idCol), "left")
  }

  /** Clean every document: drops failing lines, reassembles `textCol`
    * (newline-joined), adds `n_lines_kept`, and drops documents with
    * fewer than `minLines` surviving lines or a doc-blocklist hit. */
  def cleanDocs(df: DataFrame, textCol: String,
                minWords: Int = 5, minLines: Int = 2,
                lineBlock: Seq[String] = DefaultLineBlock,
                docBlock: Seq[String] = DefaultDocBlock): DataFrame = {
    val docOk = docBlock.map(t => !contains(lower(col(textCol)), lit(t)))
      .reduceOption(_ && _).getOrElse(lit(true))
    // kernel floor (Par.widen, streaming-safe no-op): the line scan is
    // the per-row cost of this operator — don't serialize it on a
    // one-task scan
    val df0 = Par.widen(df)
    // graft_once: without the barrier, the minLines gate pushes below
    // this projection and re-inlines the whole keptLines chain into the
    // Filter (and docOk inlines it AGAIN when textCol is itself a
    // rewrite) — every row paid the line scan 2-3x (q143/q179 measured)
    df0.withColumn("__lines",
        graft.functions.Once.once(keptLines(col(textCol), minWords, lineBlock)))
      .withColumn("n_lines_kept", size(col("__lines")).cast("long"))
      .where(col("n_lines_kept") >= minLines && docOk)
      .withColumn(textCol, array_join(col("__lines"), "\n"))
      .drop("__lines")
  }
}
