package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.UnicodeNormalize

/** Text normalization for training corpora: Unicode-normalize (the
  * codegen'd [[graft.functions.UnicodeNormalize]] kernel — Spark has no
  * built-in), strip non-printing control characters, collapse whitespace
  * runs, and trim. Mixed-source corpora carry the same glyph in composed
  * and decomposed encodings; every byte-keyed operator downstream
  * (fingerprint dedup, shingles, MinHash) needs this pass first or the
  * two encodings count as different documents.
  *
  * Everything is stateless row-at-a-time (batch- and streaming-valid,
  * zero shuffles), and the regex steps stay inside the RE2-compatible
  * subset so an external engine (the DuckDB oracle, a downstream
  * validator) reproduces the exact rewrite. The control-strip runs
  * BEFORE the whitespace collapse and removes \x0B and \x0C: stripping
  * \x0B is what aligns the engines (Java's `\s` matches it, RE2's
  * `[\t\n\f\r ]` does not), while \x0C — which both engines treat as
  * whitespace — is stripped for canonical output, so after this pass
  * both see the identical whitespace alphabet (space, \t, \n, \r).
  */
object Normalize {

  /** Non-printing C0/DEL controls, excluding \t \n \r (which are
    * whitespace, handled by the collapse step). */
  val ControlPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Unicode normalization under `form` (NFC/NFD/NFKC/NFKD). */
  def unicodeNorm(text: Column, form: String = "NFC"): Column =
    call_function(UnicodeNormalize.name, text, lit(form))

  /** The standard cleaning pass: normalize -> drop controls -> collapse
    * whitespace runs to single spaces -> trim (-> optionally lowercase,
    * for fingerprint keys rather than model input). */
  def cleanText(text: Column, form: String = "NFC",
                lowercase: Boolean = false): Column = {
    val cleaned = trim(regexp_replace(
      regexp_replace(unicodeNorm(text, form), ControlPattern, " "),
      "\\s+", " "))
    if (lowercase) lower(cleaned) else cleaned
  }
}
