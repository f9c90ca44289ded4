package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The prep pipeline's quality gate — ONE definition of the signals and
  * thresholds, shared by the batch pipeline (q64) and the streaming form
  * (streaming.DocPrep) so the two can never silently diverge: the q64
  * oracle mirrors exactly this arithmetic. Stateless row-at-a-time
  * codegen; valid in batch and streaming plans alike.
  */
object Quality {

  /** Keep rows whose `textCol` has at least `minTokens` whitespace tokens
    * and a type-token ratio of at least `minTtr`; adds `n_tokens`. */
  def filter(df: DataFrame, textCol: String,
             minTokens: Int = 10, minTtr: Double = 0.2): DataFrame =
    df.withColumn("__tk", Text.tokens(col(textCol))) // staged: 3 refs below
      .withColumn("n_tokens", size(col("__tk")).cast("long"))
      .withColumn("__ttr",
        size(array_distinct(col("__tk"))).cast("double") / size(col("__tk")))
      .where(col("n_tokens") >= minTokens && col("__ttr") >= minTtr)
      .drop("__tk", "__ttr")
}
