package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Text, TopKByScore}

/** Inverted-index build: token -> (document frequency, collection
  * frequency, bounded posting list) — the batch retrieval structure a
  * RAG/eval pipeline derives from a corpus.
  *
  * Shape at 100 TB: two shuffles, both on bounded keys. Tokenize +
  * explode is narrow; `groupBy(token, id)` partial-aggregates term
  * frequencies map-side before its exchange; `groupBy(token)` carries
  * df/cf counters plus a k-bounded heap ([[TopKByScore]]) — the posting
  * list is trimmed to k on the map side, so the second shuffle moves at
  * most vocabulary × k entries, never the corpus. The window
  * formulation of the same cut would shuffle and sort every (token,
  * doc) pair onto one task per token — exactly the hot-token skew an
  * index build hits (stopwords), and exactly what the heap avoids.
  * Hot-token rows in the FIRST shuffle pre-combine map-side (per-task
  * cardinality is bounded by that task's distinct (token, doc) pairs).
  *
  * Postings rank by tf desc, doc id asc (deterministic, rerun-stable);
  * `minDf` prunes the hapax tail that dominates vocabulary size.
  */
object InvertedIndex {

  /** One row per surviving token: (token, df, cf,
    * postings: array<struct<id, score>> best-first, size <= k).
    *
    * `idCol` must be a numeric (long-castable) document id — the heap
    * aggregate keys postings by long ids and would otherwise silently
    * drop every row; validated here so a string-id corpus fails fast
    * instead of returning populated df/cf with empty posting lists. */
  def build(df: DataFrame, textCol: String, idCol: String,
            k: Int, minDf: Long = 1L): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "int", "bigint", "tinyint", "smallint")
        .contains(idType.simpleString) || idType.simpleString.startsWith("decimal"),
      s"build() requires a numeric (long-castable) id column, " +
        s"got $idCol: ${idType.simpleString} — map string ids to longs first")
    df.select(col(idCol).as("id"), explode(Text.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("id"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        TopKByScore.topk(col("tf"), col("id"), k).as("postings"))
      .filter(col("df") >= minDf)
  }
}
