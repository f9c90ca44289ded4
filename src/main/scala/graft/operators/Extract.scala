package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the FIRST stage of every real crawl
  * pipeline (reference README positions the tool over log/crawl
  * indices: dump-es-parquet README.md:95-103), and the stage the rest
  * of the text chain here (Normalize → LineFilter → Gopher gates →
  * dedup) previously assumed had already happened. The shape is the
  * jusText/trafilatura one, reduced to what survives a byte-exact
  * cross-engine oracle:
  *
  *  1. drop non-content markup wholesale: `<script>…</script>`,
  *     `<style>…</style>`, `<!-- comments -->`;
  *  2. segment into BLOCKS on block-level tags (`p`, `div`, `li`,
  *     headings, table cells, `br`, …) — inline markup (`a`, `b`,
  *     `span`) stays inside its block;
  *  3. per block, recover the text: strip remaining tags to spaces,
  *     decode the common entities (`&amp;` LAST, so `&amp;lt;` comes
  *     out as the literal `&lt;` and never double-decodes), squeeze
  *     whitespace;
  *  4. gate each block on length AND text density: `minWords` kills
  *     titles/footers/button labels, and `textLen / rawLen >=
  *     minDensity` kills link farms and nav bars whose text is short
  *     relative to their markup (the boilerplate-density signal link
  *     lists can't fake — a 6-link nav has 6 words but ~0.2 density).
  *
  * Everything is a per-row chain of codegen'd `regexp_replace` /
  * higher-order-function calls over the row's own string: the operator
  * is NARROW (zero shuffles, no UDF), so at 100 TB it scales exactly as
  * the scan does and composes with the line/doc gates downstream.
  * Following the q143 lesson, the block array and the per-block
  * (text, rawLen) structs are each staged in their OWN projection —
  * HOF lambdas do not share codegen subexpressions, so an unstaged
  * form would re-run the strip/decode chain once per lambda. */
object Extract {

  /** Block-level tags (open or close, any attributes) — segment
    * boundaries. Shared-prefix alternatives are ordered longest-first
    * (`blockquote` before `br`, `header|footer` before `h[1-6]`,
    * `table` before `tr|td|th`, `pre` before `p`) so both Java regex
    * and RE2 leftmost-first semantics agree. */
  private[graft] val BlockTagRe =
    "(?i)</?(?:blockquote|br|section|article|header|footer|table|nav|pre|div|ul|ol|li|tr|td|th|p|h[1-6])[^>]*>"

  /** Tags whose whole SUBTREE is non-content: code, styling, vector
    * paths, frame fallbacks, and the head (its `<title>` is metadata —
    * [[title]] reads it from the RAW html). Order-independent. */
  private[graft] val DroppedContainers =
    Seq("script", "style", "noscript", "svg", "iframe", "head")

  /** Non-content subtrees removed wholesale, payload included, plus
    * comments. The open-tag form `<tag(?:\s[^>]*)?>` requires a space
    * or an immediate '>' after the name, so `head` cannot swallow
    * `<header>` (prefix collision); close-tag patterns spell the name
    * out rather than backreference (RE2 has none — the DuckDB oracle
    * runs the identical patterns). */
  def dropNonContent(html: Column): Column = {
    val dropped = DroppedContainers.foldLeft(html)((acc, t) =>
      regexp_replace(acc, s"(?is)<$t(?:\\s[^>]*)?>.*?</$t\\s*>", " "))
    regexp_replace(dropped, "(?s)<!--.*?-->", " ")
  }

  /** The common HTML entities, `&amp;` decoded LAST (decoding it first
    * would re-feed `&amp;lt;` into the later rules — the classic
    * double-decode). Unknown entities pass through as literal text. */
  def decodeEntities(text: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(text) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /** Raw block → clean text: strip tags to spaces, decode entities,
    * squeeze runs of whitespace, trim. */
  def blockText(block: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(block, "<[^>]*>", " ")), "\\s+", " "))

  /** Whole-document tag strip (no gate): the quick-and-dirty form for
    * callers that want every character, boilerplate included. */
  def stripTags(html: Column): Column = blockText(dropNonContent(html))

  /** All anchor href targets (double-quoted, single-quoted, and bare
    * attribute values — real crawl HTML has all three), entities
    * decoded (`&amp;` in query strings is the common case) — the crawl
    * FRONTIER feed: compose with [[UrlOps.normalizeUrl]]/`domainOf` for
    * canonical per-domain frontier reports (q178). Order is document
    * order WITHIN each quoting style (quoted first, then bare) — a
    * frontier consumer keys on the URL, not the position. Empty array
    * when the page has no links. Narrow per-row `regexp_extract_all`;
    * the three patterns are disjoint (a quote right after `=` is
    * excluded from the bare form), so no href extracts twice. */
  def links(html: Column): Column = {
    def hrefs(valueRe: String): Column =
      regexp_extract_all(html,
        lit(s"(?is)<a\\s[^>]*?href\\s*=\\s*$valueRe"), lit(1))
    transform(
      concat(hrefs("\"([^\"]*)\""), hrefs("'([^']*)'"),
        hrefs("([^\"'\\s>][^\\s>]*)")),
      decodeEntities(_))
  }

  /** The `<title>` text (tag-stripped, entity-decoded, squeezed); null
    * when the page has none — document metadata for index/report
    * stages. */
  def title(html: Column): Column = {
    val t = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title\\s*>", 1)
    when(t === "", lit(null).cast("string")).otherwise(blockText(t))
  }

  /** Main-content extraction over `htmlCol`: replaces it with the
    * extracted `text` and appends `n_blocks` (blocks with any text at
    * all) and `n_blocks_kept`. Kept blocks join with single newlines in
    * document order; a document with no surviving block keeps an empty
    * `text` (no row is dropped — the downstream doc gates decide). */
  def mainContent(df: DataFrame, htmlCol: String, minWords: Int = 5,
                  minDensity: Double = 0.25): DataFrame = {
    require(minWords >= 1, s"minWords must be positive: $minWords")
    require(minDensity >= 0.0 && minDensity <= 1.0,
      s"minDensity must be in [0, 1]: $minDensity")
    val passthrough = df.columns.filter(_ != htmlCol).map(col).toSeq
    val blocks = split(dropNonContent(col(htmlCol)), BlockTagRe)
    // kernel floor (Par.widen, streaming-safe no-op): the 7-regexp
    // dropNonContent + per-block clean chain rides the scan stage
    val staged = Par.widen(df).select(passthrough :+ blocks.as("__blocks"): _*)
    // one struct per block, computed once: (clean text, raw length).
    // graft_once guards the expensive tag-strip/regexp chain: without
    // it, a downstream gate on the extracted text (cleanDocs' doc
    // blocklist in q179) pushes below these projections and re-inlines
    // the whole chain into a Filter — measured 3x the per-row work.
    val bt = staged.select(passthrough :+
      graft.functions.Once.once(transform(col("__blocks"), b =>
        struct(blockText(b).as("txt"), length(b).as("raw")))).as("__bt"): _*)
    // each derived array is staged as its OWN column so later
    // references are attribute reads — referencing the filter() trees
    // directly re-evaluates the interpreted HOF per reference
    // (CollapseProject keeps multi-referenced non-cheap aliases staged)
    val withNe = bt.select(passthrough :+
      filter(col("__bt"), e => e.getField("txt") =!= "").as("__ne"): _*)
    val withKept = withNe.select(passthrough ++ Seq(col("__ne"),
      filter(col("__ne"), e =>
        size(split(e.getField("txt"), " ")) >= minWords &&
          length(e.getField("txt")).cast("double") /
            greatest(e.getField("raw"), lit(1)).cast("double") >= minDensity)
        .as("__kept")): _*)
    withKept.select(passthrough ++ Seq(
      array_join(transform(col("__kept"), _.getField("txt")), "\n").as("text"),
      size(col("__ne")).as("n_blocks"),
      size(col("__kept")).as("n_blocks_kept")): _*)
  }
}
