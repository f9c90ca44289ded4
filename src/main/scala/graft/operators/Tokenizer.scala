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
    // kernel floor (Par.widen): BPE encoding is the most CPU-dense
    // per-row kernel in the library — never let it ride a one-task scan
    Par.widen(df).withColumn(outCol, tokenIds(col(textCol), merges))
  }

  /** Token ids → text, the LOSSLESS inverse of [[tokenIds]] under the
    * same merge list — detokenization, the half a data pipeline needs
    * to render packed/chunked model tokens back into inspectable text
    * (and the round-trip property `decode(encode(t)) == t` that proves
    * the tokenizer loses nothing; q230 pins it corpus-wide against the
    * raw table).
    *
    * Reassembly happens at the BYTE layer, because that is where the
    * encoder bottoms out: ids < 256 ARE bytes, `256 + rank` is the
    * rank's merge-product string. Each id maps (via one plan-constant
    * table — the merges-as-typedlit discipline) to its bytes rendered
    * as an ISO-8859-1 string (one char per byte, lossless), the
    * per-document array joins flat, and ONE encode/decode pair
    * re-reads the byte stream as UTF-8 — so a multibyte code point
    * split across byte-fallback ids re-joins exactly. All codegen'd
    * built-ins, narrow, zero shuffles.
    *
    * An id outside the table (corrupt input, wrong merge list) NULLs
    * the row — never a silently-garbled document; byte streams that
    * are not valid UTF-8 decode with replacement chars (the lenient
    * stance: framing survived, the bytes were honest). */
  def decodeIds(ids: Column, merges: Seq[(String, String)]): Column = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val table: Map[Int, String] =
      (0 until 256).map(b =>
        b -> new String(Array(b.toByte), iso)).toMap ++
      merges.zipWithIndex.map { case ((l, r), i) =>
        (256 + i) -> new String(
          (l + r).getBytes(java.nio.charset.StandardCharsets.UTF_8), iso)
      }.toMap
    val m = typedlit(table)
    val mapped = transform(ids, i => element_at(m, i))
    when(ids.isNull, lit(null).cast("string"))
      .when(exists(mapped, x => x.isNull), lit(null).cast("string"))
      .otherwise(org.apache.spark.sql.functions.decode(
        org.apache.spark.sql.functions.encode(
          array_join(mapped, ""), "ISO-8859-1"), "UTF-8"))
  }

  /** Appends `outCol` (string) decoded from `idsCol` under `merges`. */
  def decode(df: DataFrame, idsCol: String,
             merges: Seq[(String, String)],
             outCol: String = "text"): DataFrame =
    df.withColumn(outCol, decodeIds(col(idsCol), merges))
}
