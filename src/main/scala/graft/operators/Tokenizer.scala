package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text → token IDS, end-to-end — the step a training job actually
  * consumes, completing the BPE family: [[Bpe.train]] learns merges,
  * [[Bpe.encode]] merges symbol arrays, and this operator goes from a
  * raw text column all the way to `array<int>` model tokens.
  *
  * Pipeline per document (all inside ONE narrow projection):
  *  1. pretokenize with the GPT-2-STYLE regex ([[PretokenPattern]]):
  *     contractions, optional-leading-space letter runs, digit runs,
  *     punctuation runs, whitespace runs. Lookahead-free on purpose —
  *     the original's `\s+(?!\S)` is not RE2-expressible, so multi-space
  *     runs attach to the whitespace token instead of the next word;
  *     deterministic, engine-portable (Java regex == RE2 == the DuckDB
  *     oracle on this pattern), and lossless: pretokens concatenate
  *     back to the exact input.
  *  2. per pretoken: code-point symbols → the standard pair-priority
  *     merge loop over the trained merge list → symbol ids. A merge
  *     product's id is `256 + rank` (first rank wins on collisions, the
  *     GPT-2 vocab convention); any other symbol falls back to its raw
  *     UTF-8 BYTES, one id per byte — ids below 256 ARE bytes, so every
  *     string encodes and there is no unknown-token escape hatch.
  *
  * Scale: the merge list and vocab ride the plan as constants
  * ([[graft.functions.BpeIdsExpr]] reference objects — the
  * GramOverlap/PqCodes discipline), the kernel runs once per row, and
  * nothing shuffles: token ids for a petabyte corpus are a narrow map
  * over the scan. Feed the output to [[Chunk.splitIds]] so context
  * windows count MODEL tokens, not whitespace words. */
object Tokenizer {

  /** GPT-2-style pretokenizer (see object doc for the one deliberate
    * deviation). Order of alternation matters: contractions first, then
    * space-prefixed runs, then bare whitespace. */
  val PretokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Pretoken array of a text column (null text → no pretokens). */
  def pretokens(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(PretokenPattern), lit(0))

  /** Token-id array of a text column under a trained merge list — one
    * codegen'd kernel call per row. */
  def tokenIds(text: Column, merges: Seq[(String, String)]): Column =
    call_function(graft.functions.BpeIdsExpr.name, pretokens(text),
      typedlit(merges.map(_._1)), typedlit(merges.map(_._2)))

  /** Appends `outCol` (array<int> token ids) to every row. */
  def encode(df: DataFrame, textCol: String,
             merges: Seq[(String, String)],
             outCol: String = "token_ids"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.withColumn(outCol, tokenIds(col(textCol), merges))
  }
}
