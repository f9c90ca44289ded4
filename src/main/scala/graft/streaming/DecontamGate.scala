package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Decontam

/** Streaming DECONTAMINATION gate — the eval-leak member of the gate
  * family: [[DocPrep]] stops exact re-deliveries, [[NearDupGate]]
  * reworded shapes, [[SemGate]] paraphrase meaning, [[WinnowGate]]
  * shared spans — but a crawler ingest could still land a benchmark
  * document VERBATIM in the training store, and the batch
  * decontamination sweep ([[graft.operators.Decontam.decontaminate]],
  * q69) only catches it after the fact. This gate runs the same
  * 13-gram overlap criterion ON THE INGEST PATH, so contaminated
  * documents never land at all.
  *
  * Unlike the other gates this one is STATELESS: the benchmark is a
  * static eval suite, not an accumulating corpus, so there is no
  * cross-batch state to hold — the gate is the per-row
  * `graft_gram_overlap` kernel (shingle → dedup → count benchmark
  * members, one codegen call per row) against the benchmark's gram set
  * riding the plan as a literal. That makes it valid mid-stream in
  * Append mode with no watermark, no state store, and no shuffle; the
  * batch twin is bit-identical BY CONSTRUCTION (same kernel, same
  * grams), which DecontamGateSpec pins across micro-batch boundaries.
  *
  * The literal branch is therefore REQUIRED, and its budget is the
  * contract: a benchmark over [[graft.operators.Decontam.LiteralGramLimit]]
  * distinct grams (2¹⁶ — an order of magnitude above real eval suites)
  * fails fast here with a pointer at the batch machinery, whose
  * broadcast-join branch handles oversized benchmarks but needs a
  * per-row-id groupBy a stream cannot run statelessly.
  *
  * Cite: reference has no streaming or decontamination surface; this
  * extends SURVEY §2.3's streaming + decontam families. Criterion:
  * Brown et al. 2020 appendix C / Gao et al. 2020 (13-gram overlap). */
object DecontamGate {

  /** `stream` minus documents whose distinct word-`n`-gram overlap with
    * the STATIC `benchmark` exceeds `threshold` — the streaming twin of
    * [[graft.operators.Decontam.decontaminate]] (gram-less documents
    * pass, the batch convention). All payload columns survive. One
    * bounded batch job up front (the benchmark gram collect + budget
    * check); per micro-batch the plan is one narrow kernel projection. */
  def admitted(stream: DataFrame, benchmark: DataFrame, textCol: String,
               idCol: String, n: Int = 13,
               threshold: Double = 0.01): DataFrame = {
    val nGrams = benchmark
      .select(explode(coalesce(
        array_distinct(Text.shinglesNative(Text.tokens(col(textCol)), n)),
        array().cast("array<string>"))).as("__gram"))
      .distinct().count()
    if (nGrams > Decontam.LiteralGramLimit) throw new IllegalArgumentException(
      s"DecontamGate: benchmark carries $nGrams distinct $n-grams, over " +
        s"the ${Decontam.LiteralGramLimit} literal budget the stateless " +
        "streaming gate requires. Gate against a smaller (real eval " +
        "suite) benchmark, or run batch Decontam.decontaminate over the " +
        "landed corpus, whose broadcast-join branch handles this size")
    Decontam.decontaminate(stream, benchmark, textCol, idCol, n, threshold)
  }
}
