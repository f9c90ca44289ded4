package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators
  * (SURVEY.md §2.3): tokenization, hashing, fingerprints, quality signals.
  *
  * Hashing contract: everything is built on md5 hex strings compared/min'd
  * lexicographically. md5 is available and bit-identical in Spark and
  * DuckDB, which makes MinHash/SimHash results oracle-checkable — unlike
  * xxhash64/murmur whose implementations differ across engines. At 100 TB
  * scale md5-per-shingle is still cheap relative to shuffle cost, and all
  * of it stays inside whole-stage codegen.
  */
object Text {

  /** Whitespace tokenization; collapses any whitespace runs (matching the
    * fingerprint normalization), drops empties. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish subword segmentation: letter runs, digit runs, single other
    * chars — the standard pre-tokenizer regex family. */
  def bpeTokens(text: Column): Column =
    call_function("regexp_extract_all", lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Word n-gram shingles of size n from a token array. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** One MinHash band value: the lexicographic min of md5(seed||elem) over
    * the array — a deterministic stand-in for "min over a random hash
    * permutation". Equal band values => likely-similar sets (LSH). */
  def minhash(elems: Column, seed: Int): Column =
    array_min(transform(elems, e => md5(concat(lit(s"$seed|"), e))))

  /** Document fingerprint: md5 of the lowercased, whitespace-normalized
    * text — the rolling-hash dedup key, exact under formatting noise. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** SimHash over the hex-nibble bits of each token's md5: bit i of the
    * result is the majority vote of bit 3 of hex digit i across tokens
    * (i.e. whether md5(tok)[i] >= '8'). 32-bit value as a long; built from
    * arithmetic only, so the DuckDB oracle can reproduce it exactly.
    *
    * md5 is computed ONCE per token (transform), then the 32 bit-votes
    * fold over the precomputed digests — not 32 re-hashes per token.
    */
  def simhash(toks: Column): Column = {
    val digests = transform(toks, t => md5(t))
    val hexOnes = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val votes = (0 until 32).map { i =>
      val ones = aggregate(
        digests, lit(0),
        (acc, d) => acc + when(substring(d, i + 1, 1).isin(hexOnes: _*), 1).otherwise(0))
      when(ones * 2 > size(toks), lit(1L << i)).otherwise(lit(0L))
    }
    votes.reduce(_ + _)
  }
}
