package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Fixed-size token chunking with overlap — the document → context-window
  * splitter every RAG index and pretraining shard layout needs. Chunk i
  * covers tokens [i·step, i·step + chunkTokens) with
  * step = chunkTokens − overlap; starts advance while they are inside
  * the document, so every token lands in at least one chunk and the last
  * chunk may run short. Token-less documents produce no chunks.
  *
  * Scale shape: one narrow projection + explode per document — the row
  * expansion stays inside the partition (like the multimodal frame
  * sampler), nothing shuffles, and Catalyst prunes the text column away
  * if the caller keeps only token counts.
  */
object Chunk {

  def split(df: DataFrame, textCol: String, chunkTokens: Int = 128,
            overlap: Int = 32): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap/$chunkTokens")
    val step = chunkTokens - overlap
    val toks = Text.tokens(col(textCol))
    val chunks = when(size(toks) > 0,
      transform(
        // last chunk index = floor((n-1)/step); `/` on Columns is double
        // division, so divide then truncate back to int
        sequence(lit(0), ((size(toks) - 1) / step).cast("int")),
        i => struct(
          i.cast("long").as("chunk_idx"),
          slice(toks, i * step + 1, lit(chunkTokens)).as("toks"))))
      .otherwise(array().cast("array<struct<chunk_idx:bigint,toks:array<string>>>"))
    // explode_OUTER + a cheap null filter on the generated column, NOT a
    // plain explode: InferFiltersFromGenerate rewrites a non-outer
    // explode into a pre-Generate filter that INLINES the whole chunk
    // expression (tokenize + window transform) several times into an
    // interpreted Filter — measured ~5x the query cost. The rule skips
    // outer generates, so the chunk expression is computed exactly once.
    df.withColumn("__chunks", chunks)
      .select(col("*"), explode_outer(col("__chunks")).as("__c"))
      .filter(col("__c").isNotNull)
      .withColumn("chunk_idx", col("__c.chunk_idx"))
      .withColumn("chunk_tokens", size(col("__c.toks")).cast("long"))
      .withColumn("chunk_text", array_join(col("__c.toks"), " "))
      .drop("__chunks", "__c")
  }

  /** [[split]] re-pointed at MODEL tokens: chunks an `array<int>`
    * token-id column (the [[Tokenizer.encode]] output) with the same
    * start/step/overlap algebra, so context windows count what the
    * training job counts — BPE ids, not whitespace words. Emits
    * `chunk_idx`, `chunk_len`, `chunk_ids` per chunk; id-less documents
    * (empty or null array) produce no chunks. Same scale shape as
    * [[split]]: one narrow projection + in-partition explode. */
  def splitIds(df: DataFrame, idsCol: String, chunkTokens: Int = 128,
               overlap: Int = 32): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap/$chunkTokens")
    val step = chunkTokens - overlap
    val ids = col(idsCol)
    val chunks = when(size(ids) > 0,
      transform(
        sequence(lit(0), ((size(ids) - 1) / step).cast("int")),
        i => struct(
          i.cast("long").as("chunk_idx"),
          slice(ids, i * step + 1, lit(chunkTokens)).as("ids"))))
      .otherwise(array().cast("array<struct<chunk_idx:bigint,ids:array<int>>>"))
    // explode_outer + null filter for the same InferFiltersFromGenerate
    // reason as [[split]] — with the BPE id kernel upstream the inlined
    // pre-filter re-ran the kernel 4x per row (~8x q103's cost at sf0.1)
    df.withColumn("__chunks", chunks)
      .select(col("*"), explode_outer(col("__chunks")).as("__c"))
      .filter(col("__c").isNotNull)
      .withColumn("chunk_idx", col("__c.chunk_idx"))
      .withColumn("chunk_len", size(col("__c.ids")).cast("long"))
      .withColumn("chunk_ids", col("__c.ids"))
      .drop("__chunks", "__c")
  }
}
