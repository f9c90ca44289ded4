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

  /** Sentence-boundary chunking — the RAG splitter that respects
    * meaning units where [[split]] cuts mid-sentence: text splits into
    * SENTENCES (a terminator `[.!?]` followed by whitespace — kept
    * inside the RE2-compatible subset both engines share, so the oracle
    * replays the split), overlong sentences FORCE-SPLIT into runs of at
    * most `maxSentenceTokens` tokens (real corpora contain
    * thousand-token "sentences"; an unsplit one would blow every budget
    * downstream), and consecutive pieces pack GREEDILY into chunks — a
    * piece starts a new chunk exactly when adding it would push the
    * running token count past `maxTokens`, so no chunk exceeds the
    * budget and sentences never split EXCEPT by the force rule. Chunk
    * text re-joins tokens with single spaces (the fingerprint
    * normalization stance: original intra-sentence whitespace is not
    * preserved).
    *
    * Scale shape: entirely per-row — sentence split, force-split, and
    * the greedy fold are one expression chain over arrays
    * (`functions.aggregate` carries (chunks, run) across the pieces),
    * then the same in-partition `explode_outer` as [[split]]; nothing
    * shuffles. The greedy recurrence is sequential BY NATURE (each
    * boundary depends on the run since the previous one), which is why
    * it lives inside the per-document fold: documents parallelize, the
    * fold is bounded by document length.
    *
    * Emits (original columns, chunk_idx, chunk_tokens, chunk_text);
    * token-less documents produce no chunks. */
  def bySentence(df: DataFrame, textCol: String, maxTokens: Int = 128,
                 maxSentenceTokens: Int = 64): DataFrame = {
    require(maxTokens > 0 && maxSentenceTokens > 0 &&
      maxSentenceTokens <= maxTokens,
      s"need 0 < maxSentenceTokens <= maxTokens, got " +
        s"$maxSentenceTokens/$maxTokens")
    val sep = "\u001F" // unit separator: never in real text, RE2-safe
    val marked = regexp_replace(col(textCol), "([.!?])\\s+", "$1" + sep)
    val sents = filter(
      transform(org.apache.spark.sql.functions.split(marked, sep),
        s => Text.tokens(s)),
      a => size(a) > 0)
    val f = maxSentenceTokens
    val pieces = flatten(transform(sents, a =>
      transform(sequence(lit(0), ((size(a) - 1) / f).cast("int")),
        i => slice(a, i * f + 1, lit(f)))))
    val packed = aggregate(
      pieces,
      struct(array().cast("array<array<string>>").as("chunks"),
        lit(0).as("run")),
      (st, x) => {
        val cur = st.getField("chunks")
        val run = st.getField("run")
        val startNew = (size(cur) === 0) || (run + size(x) > maxTokens)
        struct(
          when(startNew, concat(cur, array(x)))
            .otherwise(concat(slice(cur, lit(1), size(cur) - 1),
              array(concat(element_at(cur, -1), x)))).as("chunks"),
          when(startNew, size(x)).otherwise(run + size(x)).as("run"))
      },
      st => st.getField("chunks"))
    // explode_outer + null filter, NOT plain explode — the
    // InferFiltersFromGenerate hazard documented on [[split]]
    df.withColumn("__sc", packed)
      .select(col("*"),
        posexplode_outer(col("__sc")).as(Seq("__ci", "__toks")))
      .filter(col("__toks").isNotNull)
      .withColumn("chunk_idx", col("__ci").cast("long"))
      .withColumn("chunk_tokens", size(col("__toks")).cast("long"))
      .withColumn("chunk_text", array_join(col("__toks"), " "))
      .drop("__sc", "__ci", "__toks")
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

  /** GPT-style SEQUENCE packing — the actual tensor layout a pretraining
    * job consumes, which [[splitIds]] (per-document windows) and
    * [[Prefix.packIntoShards]] (whole documents per shard) both stop
    * short of: every document's ids plus one `eosId` separator are
    * CONCATENATED in ascending `idCol` order and recut into fixed
    * `seqLen` rows, documents crossing sequence boundaries mid-token-run
    * (no padding waste — the only short row is the corpus's last).
    * Returns (seq_id, n_ids, ids, seg_lens); `seg_lens` is the length of
    * each document segment inside the sequence in order — the boundary
    * metadata a trainer needs to reset attention (block-diagonal
    * masking) at document boundaries instead of attending across
    * unrelated documents. Id-less documents contribute only their EOS
    * (the standard empty-document encoding).
    *
    * Shape at 100 TB: a document's absolute start offset comes from the
    * two-pass [[Prefix.cumsum]] (no data-sized window); each document
    * then explodes into one row PER SPANNED SEQUENCE — O(docs +
    * total_tokens / seqLen) rows, never one row per token — carrying the
    * id-slice that lands in that sequence; one shuffle on seq_id
    * reassembles each sequence from its ≤ few segments (sort by segment
    * offset, flatten). The output is token-level data re-laid-out, so
    * the one shuffle moves ~corpus-token volume once — the format's
    * irreducible cost. */
  def packSequences(df: DataFrame, idCol: String, idsCol: String,
                    seqLen: Int, eosId: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val withEos = df
      .select(col(idCol),
        concat(coalesce(col(idsCol), array().cast("array<int>")),
          array(lit(eosId))).as("__ids"))
      .withColumn("__n", size(col("__ids")).cast("long"))
    val placed = Prefix.cumsum(withEos, idCol, "__n", "__cum")
      .withColumn("__start", col("__cum") - col("__n"))
    // one row per (doc, spanned sequence): seq s covers absolute
    // positions [s·L, (s+1)·L); the doc contributes its ids in the
    // intersection, tagged with the segment's ABSOLUTE start so the
    // per-sequence reassembly sorts segments from different docs
    // correctly (disjoint intervals — the position is a unique key)
    val segs = placed
      .select(col("__ids"), col("__start"), col("__n"),
        explode_outer(sequence((col("__start") / seqLen).cast("long"),
          ((col("__start") + col("__n") - 1) / seqLen).cast("long")))
          .as("seq_id"))
      .filter(col("seq_id").isNotNull)
      .withColumn("__abs", greatest(col("seq_id") * seqLen, col("__start")))
      .withColumn("__end",
        least((col("seq_id") + 1) * seqLen, col("__start") + col("__n")))
      .select(col("seq_id"),
        struct(col("__abs").as("pos"),
          slice(col("__ids"), (col("__abs") - col("__start") + 1).cast("int"),
            (col("__end") - col("__abs")).cast("int")).as("ids")).as("__seg"))
    // per-sequence state is seqLen-bounded: the collected segments hold
    // exactly the sequence's L ids (fewer only for the corpus tail)
    segs
      .groupBy(col("seq_id"))
      .agg(array_sort(collect_list(col("__seg"))).as("__ss"))
      .select(col("seq_id"),
        flatten(transform(col("__ss"), s => s.getField("ids"))).as("ids"),
        transform(col("__ss"), s => size(s.getField("ids"))).as("seg_lens"))
      .select(col("seq_id"), size(col("ids")).cast("long").as("n_ids"),
        col("ids"), col("seg_lens"))
  }
}
