package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Byte-pair-encoding vocabulary training — the real tokenizer-training
  * loop, shaped for scale: the corpus is touched ONCE (a word-frequency
  * groupBy); every merge round after that runs over the distinct-word
  * vocabulary table, which is bounded by vocabulary size, not corpus
  * size. A 100 TB corpus and a 100 GB corpus train at the same per-round
  * cost once the word table exists.
  *
  * Per round: weighted adjacent-pair counts over the vocab (one small
  * shuffle), a deterministic argmax (count desc, then pair lexicographic
  * — reproducible across runs and engines), ONE collected row (bounded
  * driver state), then a codegen'd `graft_bpe_merge` pass rewrites the
  * symbol arrays. `localCheckpoint` keeps the vocab frame's lineage flat
  * across rounds (the k-means/connected-components lesson).
  */
object Bpe {

  /** (left, right) adjacent-symbol pairs of one symbol-array column. */
  private def pairs(syms: Column): Column =
    zip_with(slice(syms, lit(1), size(syms) - 1), slice(syms, lit(2), size(syms) - 1),
      (l, r) => struct(l.as("left"), r.as("right")))

  /** The distinct-word frequency table with each word split to symbols
    * (characters initially) — the frame the merge loop iterates on. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))

  /** Corpus-weighted adjacent-pair counts over a word table. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(pairs(col("syms"))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("freq")).as("cnt"))

  /** Learned merges in rank order plus the final word table. Stops early
    * when no adjacent pair is left (fully merged vocab). */
  def train(df: DataFrame, textCol: String, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    var words = wordTable(df, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, c))
        words = words.withColumn("syms",
          call_function(graft.functions.BpeMergeExpr.name,
            col("syms"), lit(l), lit(r)))
          .localCheckpoint()
        rank += 1
      }
    }
    (merges.result(), words)
  }

  /** Applies an already-learned merge list to a symbol-array column, in
    * rank order — the encode half, a narrow chain of codegen'd passes. */
  def applyMerges(df: DataFrame, symsCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    merges.foldLeft(df) { case (d, (l, r)) =>
      d.withColumn(symsCol,
        call_function(graft.functions.BpeMergeExpr.name,
          col(symsCol), lit(l), lit(r)))
    }
  }
}
