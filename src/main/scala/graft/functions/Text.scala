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

  /** Lowercased sliding CHARACTER n-grams over the whole text, spaces
    * included — the fastText-style subword surface for language ID
    * (word tokens carry no signal for languages sharing a vocabulary;
    * character statistics do). Shorter-than-n texts yield the single
    * whole-text gram, so every non-null document contributes at least
    * one feature; the gram count is length-n+1 (else 1), which the
    * LangId oracle reproduces exactly. */
  def charNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"charNgrams: n must be positive: $n")
    val t = lower(text)
    // Overlapping grams via a lookahead capture, NOT a transform over
    // positions: CSE does not cross HOF lambda boundaries (the q143
    // lesson), so `t.substr(i, n)` inside a lambda re-lowercases the
    // whole document per gram — O(len²) per row, measured 6.5 s for
    // 1.5 M grams at sf0.1 vs ~1 s for this single-pass regex. (?s) so
    // grams span newlines exactly like substr did.
    when(length(t) >= n,
      call_function("regexp_extract_all", t,
        lit(s"(?s)(?=(.{$n}))."), lit(1)))
      .otherwise(array(t))
  }

  /** Native codegen'd twin of [[shingles]] (ONE kernel call per row
    * instead of an interpreted HOF per gram — the hot path for
    * corpus-sized gram streams). Pinned equal by the differential spec;
    * requires the graft functions registered (GraftSession sessions
    * have them; others call GraftFunctions.ensureRegistered). */
  def shinglesNative(toks: Column, n: Int): Column =
    call_function(ShinglesExpr.name, toks, lit(n))

  /** One MinHash band value: the lexicographic min of md5(seed||elem) over
    * the array — a deterministic stand-in for "min over a random hash
    * permutation". Equal band values => likely-similar sets (LSH). */
  def minhash(elems: Column, seed: Int): Column =
    array_min(transform(elems, e => md5(concat(lit(s"$seed|"), e))))

  /** md5 digests of each element — the one-hash-pass base for the banded
    * MinHash below. Materialize this ONCE in its own projection; the band
    * extractors are then cheap substring folds over the digest array.
    * (Higher-order functions are interpreted, not codegen'd, so an inlined
    * digest expression would re-hash every element once per band.) */
  def digests(elems: Column): Column = transform(elems, e => md5(e))

  /** MinHash band `b` (1-based) from precomputed digests: min over the
    * b-th disjoint 8-hex-char (32-bit) slice of each element's md5 — the
    * standard "k independent min-hashes from one strong hash" construction
    * (disjoint bit ranges => independent band functions), at 1 hash per
    * element instead of `bands` hashes. Supports b in 1..4. */
  def minhashBand(dg: Column, b: Int): Column = {
    require(b >= 1 && b <= 4, s"md5 yields 4 disjoint 32-bit slices, got band $b")
    array_min(transform(dg, d => substring(d, 1 + 8 * (b - 1), 8)))
  }

  /** Document fingerprint: md5 of the lowercased, whitespace-normalized
    * text — the exact-dedup key, robust to formatting noise. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Rolling polynomial fingerprint over the token stream (Rabin-Karp
    * family): h_i = (h_{i-1} * 31 + x_i) mod (2^31 - 1), where x_i is the
    * leading 32 md5 bits of token i reduced mod the same prime. Order-
    * sensitive (unlike the set-shaped MinHash), single sequential fold per
    * document, empty doc -> 0. Every step stays far below long overflow,
    * and the per-step mod makes the DuckDB oracle reproduce it exactly. */
  val RollingMod: Long = 2147483647L

  def rollingFingerprint(toks: Column): Column = {
    val xs = transform(toks, t =>
      conv(substring(md5(t), 1, 8), 16, 10).cast("long") % RollingMod)
    aggregate(xs, lit(0L), (acc, x) => (acc * 31 + x) % RollingMod)
  }

  /** SimHash over the hex-nibble bits of each token's md5: bit i of the
    * result is the majority vote of bit 3 of hex digit i+1 across tokens
    * (i.e. whether md5(tok)[i] >= '8' — hex chars 8,9,a-f sort above "8",
    * so a plain string compare tests the top bit). 32-bit value as a long;
    * arithmetic only, so the DuckDB oracle reproduces it exactly.
    *
    * Single fold: ONE md5 per token, then one aggregate accumulating all
    * 32 bit-counters as an array (higher-order functions are interpreted,
    * so 32 separate folds would re-hash every token 32 times).
    */
  def simhash(toks: Column): Column = simhashFromDigests(digests(toks))

  /** Native codegen'd SimHash (graft.functions.SimHash32): one static
    * call per row. Value-identical to `simhash`; requires the function
    * registered (GraftSession does; else GraftFunctions.ensureRegistered). */
  def simhashNative(toks: Column): Column =
    call_function(SimHash32.name, toks)

  /** Native codegen'd 64-bit SimHash (graft.functions.SimHash64): bit i is
    * the majority of md5-digest bit i across tokens — the production
    * fingerprint for Dedup.simhashNearDup's default width. */
  def simhash64Native(toks: Column): Column =
    call_function(SimHash64.name, toks)

  /** Native codegen'd MinHash band signatures: array of `bands` sigs from
    * `shingle`-token shingles, null elements for short docs. Value-
    * identical to `minhashBand(digests(shingles(tk, n)), b)` per band. */
  def minhashBandsNative(toks: Column, shingle: Int, bands: Int): Column =
    call_function(MinHashBands.name, toks, lit(shingle), lit(bands))

  /** SimHash from precomputed per-token digests (see `digests`). */
  def simhashFromDigests(dg: Column): Column = {
    val idx = sequence(lit(1), lit(32))
    val counts = aggregate(
      dg,
      array_repeat(lit(0), 32),
      (acc, d) => zip_with(acc, idx,
        (a, i) => a + when(call_function("substr", d, i, lit(1)) >= "8", 1).otherwise(0)))
    val powers = array((0 until 32).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(counts, powers, (c, p) => when(c * 2 > size(dg), p).otherwise(0L)),
      lit(0L),
      (acc, v) => acc + v)
  }
}
