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

  /** Clean every document: drops failing lines, reassembles `textCol`
    * (newline-joined), adds `n_lines_kept`, and drops documents with
    * fewer than `minLines` surviving lines or a doc-blocklist hit. */
  def cleanDocs(df: DataFrame, textCol: String,
                minWords: Int = 5, minLines: Int = 2,
                lineBlock: Seq[String] = DefaultLineBlock,
                docBlock: Seq[String] = DefaultDocBlock): DataFrame = {
    val docOk = docBlock.map(t => !contains(lower(col(textCol)), lit(t)))
      .reduceOption(_ && _).getOrElse(lit(true))
    df.withColumn("__lines", keptLines(col(textCol), minWords, lineBlock))
      .withColumn("n_lines_kept", size(col("__lines")).cast("long"))
      .where(col("n_lines_kept") >= minLines && docOk)
      .withColumn(textCol, array_join(col("__lines"), "\n"))
      .drop("__lines")
  }
}
