package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Okapi BM25 term weighting over a corpus — the scoring half of the
  * retrieval path (the structure half is [[InvertedIndex]]): for every
  * (document, token), `idf(df) * tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
  * with the Robertson idf `ln(1 + (N−df+0.5)/(df+0.5))`.
  *
  * Shape at 100 TB: ONE corpus-sized shuffle (the (token, doc) term
  * frequencies, partial-aggregated map-side; dl rides the group key from
  * a narrow `size(tokens)` — no second pass over the corpus). The df
  * table is vocabulary-sized and joins back BROADCAST, and the
  * (N, avgdl) scalars are a one-row global aggregate cross-joined in —
  * neither moves the corpus again. Token-less documents still count in
  * N/avgdl but produce no weight rows (they have no terms).
  */
object Bm25 {

  /** (doc `id`, token, tf, dl, df, bm25) — one row per distinct term
    * per document; `bm25` rounded to 6 dp for cross-engine parity. */
  def weights(df: DataFrame, textCol: String, idCol: String,
              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // null text coerces to ZERO tokens (not null): with ANSI off,
    // size(null) = -1 and would silently skew avgdl by -1 per null doc;
    // coalescing keeps token-less documents counted correctly in N/avgdl
    val base = df.select(col(idCol).as("id"),
      coalesce(Text.tokens(col(textCol)), array().cast("array<string>")).as("tk"))
    val tf = base
      .select(col("id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("token"))
      .groupBy(col("token"), col("id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      avg(size(col("tk"))).as("avgdl"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1)
    tf.join(broadcast(dft), "token")
      .crossJoin(broadcast(stats))
      .select(col("id"), col("token"), col("tf"), col("dl"), col("df"),
        round(idf * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))), 6)
          .as("bm25"))
  }
}
