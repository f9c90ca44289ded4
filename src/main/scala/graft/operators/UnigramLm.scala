package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UnigramSegExpr

/** Unigram language-model tokenizer training, SentencePiece-style —
  * the second in-engine tokenizer trainer next to [[Bpe]]: instead of
  * greedy pair merges, a piece VOCABULARY with log-probabilities is
  * refined by EM, and encoding is the Viterbi-best segmentation of each
  * word under that vocabulary.
  *
  * Algorithm (hard-EM, the standard batch shape):
  *  1. seed: every substring of length <= `maxPieceLen` over the
  *     distinct-word table, weighted by corpus occurrences; the top
  *     `seedSize` by (weight desc, piece asc) plus ALL single
  *     characters (coverage guarantee — every word stays segmentable).
  *  2. E-step: Viterbi-segment each distinct word under the current
  *     piece log-probs ([[graft.functions.UnigramOps.segment]], one
  *     codegen'd kernel call per word), count pieces weighted by word
  *     frequency.
  *  3. M-step: drop multi-char pieces with zero count, floor single-char
  *     counts at 1 (characters are never pruned), renormalize to
  *     log-probs. Repeat from 2.
  *
  * Scale: the corpus is touched ONCE (the word-frequency groupBy — the
  * [[Bpe.train]] discipline); every EM round runs over the distinct-word
  * table with the vocabulary riding the plan as a constant, and the only
  * shuffle per round carries piece counts, bounded by `seedSize`. The
  * collected driver state (seed pieces, per-round counts) is
  * `seedSize`-bounded.
  *
  * Cross-engine determinism (the DuckDB oracle enumerates every
  * segmentation and must pick the same winners): piece scores are
  * DYADIC log-probs — `floor(ln(cnt/total) * 2^20) / 2^20`, an integer
  * multiple of 2^-20 exactly representable in a double — so path scores
  * (left-fold sums) are EXACT, ties are exact ties, and the tie-break
  * is the lexicographically smallest space-joined path. The only
  * engine-sensitive operation left is `ln` itself (one ulp would have
  * to land exactly on a floor boundary to matter).
  */
object UnigramLm {

  /** One trained piece: corpus count and dyadic log-prob numerator
    * (`lq = lqMicro / 2^20`). */
  final case class Piece(piece: String, cnt: Long, lqMicro: Long) {
    def lq: Double = lqMicro / LqScale
  }

  /** 2^20 — the dyadic log-prob denominator. */
  val LqScale: Double = 1048576.0

  private def toLqMicro(cnt: Long, total: Long): Long =
    math.floor(math.log(cnt.toDouble / total.toDouble) * LqScale).toLong

  private def mkModel(counts: Seq[(String, Long)]): Seq[Piece] = {
    val total = counts.iterator.map(_._2).sum
    counts.map { case (p, c) => Piece(p, c, toLqMicro(c, total)) }
      .sortBy(_.piece)
  }

  /** Distinct lower-cased letter-run words with corpus frequencies;
    * words longer than `maxWordLen` are excluded from training. */
  def wordTable(df: DataFrame, textCol: String, maxWordLen: Int = 12): DataFrame =
    df.select(explode(call_function("regexp_extract_all",
        lower(col(textCol)), lit("[a-z]+"), lit(0))).as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Seed pieces with substring-occurrence weights (see object doc §1).
    * The top-N cut is a TakeOrdered heap, never a global sort. */
  private def seedCounts(words: DataFrame, maxPieceLen: Int,
                         seedSize: Int): Seq[(String, Long)] = {
    val subs = words
      .select(col("freq"), col("word"),
        explode(sequence(lit(1), length(col("word")))).as("s"))
      .select(col("freq"), col("word"), col("s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("s") + col("l") <= length(col("word")) + 1)
      .select(col("word").substr(col("s"), col("l")).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("w"))
    val top = subs.orderBy(col("w").desc, col("piece")).limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val singles = subs.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    (top ++ singles).distinct.toSeq
  }

  /** Viterbi-best segmentation column of one word under a trained
    * vocabulary (array<string>; null when some character of the word
    * has no piece — impossible for words whose characters were in the
    * training alphabet). */
  def segmentWord(word: Column, vocab: Seq[Piece]): Column =
    call_function(UnigramSegExpr.name, word,
      typedlit(vocab.map(_.piece)), typedlit(vocab.map(_.lq)))

  /** Piece array of a whole text column: letter-run words, each
    * Viterbi-segmented, concatenated in order. */
  def segmentText(text: Column, vocab: Seq[Piece],
                  maxWordLen: Int = 12): Column =
    flatten(transform(
      filter(call_function("regexp_extract_all", lower(text), lit("[a-z]+"), lit(0)),
        w => length(w) <= maxWordLen),
      w => segmentWord(w, vocab)))

  /** One hard-EM round: piece counts under the current model. The
    * kernel runs once per DISTINCT word; the groupBy carries at most
    * vocabulary-many rows. */
  private def emCounts(words: DataFrame, vocab: Seq[Piece]): Seq[(String, Long)] =
    words.select(col("freq"),
        explode(segmentWord(col("word"), vocab)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** M-step piece retention: multi-char pieces survive on evidence,
    * single chars always survive (count floored at 1). */
  private def smooth(vocab: Seq[Piece],
                     counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val cmap = counts.toMap
    vocab.flatMap { p =>
      val c = cmap.getOrElse(p.piece, 0L)
      if (p.piece.length == 1) Some((p.piece, math.max(c, 1L)))
      else if (c > 0) Some((p.piece, c)) else None
    }
  }

  /** Token-id array of a text column under a trained vocabulary — the
    * [[graft.operators.Tokenizer.tokenIds]] analog for the unigram
    * model, so [[graft.operators.Chunk]] sequence packing can meter
    * unigram tokens exactly as it does BPE tokens. Ids are the piece's
    * index in the (piece-sorted) trained vocab — stable for a given
    * model, dense in [0, |vocab|). */
  def pieceIds(text: Column, vocab: Seq[Piece], maxWordLen: Int = 12): Column = {
    val ids = map_from_arrays(typedlit(vocab.map(_.piece)),
      typedlit(vocab.indices.map(_.toLong)))
    transform(segmentText(text, vocab, maxWordLen), p => element_at(ids, p))
  }

  /** Per-document score under a trained vocabulary — the
    * tokenizer-aware quality gate the model buys (a fluent doc
    * segments into few, probable pieces; gibberish shatters into
    * improbable characters): each letter-run word Viterbi-segments and
    * the doc scores `(n_pieces, Σ lqMicro)` over its pieces. The sum
    * is over INTEGER dyadic numerators, exact in any aggregation order
    * — no float drift by construction. Docs with no scorable words
    * keep n_pieces = 0 and a null score.
    *
    * Shape at scale: the vocab rides the plan twice (segmentation
    * kernel + a map literal for the lookup), the whole scoring is one
    * narrow pass plus one groupBy(id) — zero joins. */
  def scoreDocs(df: DataFrame, textCol: String, idCol: String,
                vocab: Seq[Piece], maxWordLen: Int = 12): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val lq = map_from_arrays(
      typedlit(vocab.map(_.piece)), typedlit(vocab.map(_.lqMicro)))
    val scored = df
      .select(col(idCol), explode(filter(
        call_function("regexp_extract_all", lower(col(textCol)),
          lit("[a-z]+"), lit(0)),
        w => length(w) <= maxWordLen)).as("__w"))
      .select(col(idCol), explode(segmentWord(col("__w"), vocab)).as("__p"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pieces"),
        sum(element_at(lq, col("__p"))).as("score_micro"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        col("score_micro"))
  }

  /** Train a unigram vocabulary by `iterations` rounds of hard EM over
    * the corpus' distinct words. Returns the final model sorted by
    * piece. */
  def train(df: DataFrame, textCol: String, iterations: Int = 2,
            maxPieceLen: Int = 4, seedSize: Int = 400,
            maxWordLen: Int = 12): Seq[Piece] = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val words = wordTable(df, textCol, maxWordLen).localCheckpoint()
    var model = mkModel(seedCounts(words, maxPieceLen, seedSize))
    var i = 0
    while (i < iterations) {
      model = mkModel(smooth(model, emCounts(words, model)))
      i += 1
    }
    model
  }
}
