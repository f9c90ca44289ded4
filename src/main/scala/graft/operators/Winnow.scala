package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS selection rule): hash every k-gram, slide a window of `w`
  * consecutive hashes, and record the minimum of each window (with its
  * position); adjacent windows usually share their minimum, so the
  * distinct (pos, fp) pairs form a sparse fingerprint set with the
  * GUARANTEE that any shared substring of at least w + k − 1 tokens
  * contributes at least one shared fingerprint — the local-selection
  * upgrade over [[graft.functions.Text.rollingFingerprint]]'s global
  * mod-p sampling (q29), whose misses are unbounded.
  *
  * Tie rule: the LEFTMOST window minimum (array_position semantics in
  * both engines); the paper's robust variant prefers the rightmost —
  * same guarantee, slightly larger fingerprint density on repetitive
  * text, chosen here for exact cross-engine parity.
  *
  * Scale posture: a pure narrow projection (the digest array is staged
  * in its own projection — HOF lambdas do not share codegen
  * subexpressions, the q143 lesson) + one explode; per-document cost is
  * O(m·w) string compares with document-bounded m. No shuffle; at
  * 100 TB the fingerprint stream feeds the same fp-keyed machinery as
  * the span store (groupBy fp → winner election). */
object Winnow {

  /** One row per selected fingerprint: `idCol, pos, fp` — `pos` is the
    * 1-based k-gram index whose hash was selected, `fp` its md5 hex.
    * Documents with fewer than w k-grams emit nothing. */
  def fingerprints(df: DataFrame, textCol: String, idCol: String,
                   k: Int = 4, w: Int = 4): DataFrame = {
    val sel = selected(df, textCol, idCol, k, w)
      // explode_OUTER + null filter, not plain explode: the
      // InferFiltersFromGenerate rewrite would otherwise push a
      // size(__sel) > 0 filter BELOW the staging projection, inlining
      // the whole O(m·w) selection (digest array included) into an
      // interpreted Filter — measured 33 s -> ~2 s at sf0.1 from this
      // one device (the Chunk.scala precedent; the rule skips outer
      // generates)
      .select(col(idCol), explode_outer(col("__sel")).as("__s"))
      .filter(col("__s").isNotNull)
    sel.select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))
  }

  /** Per-document DISTINCT fingerprint set: `idCol, fps array<string>`
    * (possibly empty). The per-row set form the streaming gate needs —
    * a stream cannot afford a stateful `distinct` before its own
    * stateful op, and here the dedup runs inside the row's own
    * projection instead. Same narrow selection as [[fingerprints]]. */
  def fpSets(df: DataFrame, textCol: String, idCol: String,
             k: Int = 4, w: Int = 4, keep: Seq[String] = Nil): DataFrame =
    selected(df, textCol, idCol, k, w, keep)
      .select((col(idCol) +: keep.map(col)) :+ array_distinct(
        transform(col("__sel"), _.getField("fp"))).as("fps"): _*)

  /** The staged winnow selection: `idCol, __sel array<struct<pos,fp>>`
    * (distinct pairs, document order). Two projections on purpose — the
    * digest array is staged before the window lambdas read it. `keep`
    * columns ride through as PLAIN aliases (watermark metadata on an
    * event-time column survives to a downstream stateful op). */
  private def selected(df: DataFrame, textCol: String, idCol: String,
                       k: Int, w: Int, keep: Seq[String] = Nil): DataFrame = {
    require(k >= 1 && w >= 1, s"winnow: need k >= 1, w >= 1, got $k/$w")
    df.select((col(idCol) +: keep.map(col)) :+
        transform(Text.shinglesNative(Text.tokens(col(textCol)), k),
          x => md5(x)).as("__hs"): _*)
      .select((col(idCol) +: keep.map(col)) :+ when(size(col("__hs")) < w,
        array().cast("array<struct<pos:bigint,fp:string>>"))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(col("__hs")) - w + 1),
          i => {
            val win = slice(col("__hs"), i, lit(w))
            val m = array_min(win)
            struct(
              (i.cast("long") + array_position(win, m) - 1L).as("pos"),
              m.as("fp"))
          }))).as("__sel"): _*)
  }
}
