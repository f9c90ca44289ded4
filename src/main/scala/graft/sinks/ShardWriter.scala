package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.{Chunk, Prefix}

/** The LAST MILE of the ingest pipeline: q107/q108 compute shard
  * assignments, this writes the actual training shards — `shard=NNNN`
  * partitioned parquet of (doc_id, chunk_idx, chunk_ids), ONE file per
  * shard (the [[Bucketing]] one-file-per-key discipline, so a training
  * job maps one shard file per reader), plus a manifest with one row
  * per shard (doc count, token count, chunk count, content hash) that
  * certifies what actually landed on disk.
  *
  * Pipeline shape (every stage an already-proven operator): token
  * counts → [[Prefix.packIntoShards]] greedy first-fit in id order →
  * [[Chunk.splitIds]] context windows in MODEL-token space → write.
  * A document's chunks all land in its shard, so shard budgets meter
  * exactly what the training job meters (the q107 contract).
  *
  * Scale posture: the only data-sized shuffle is the repartition on
  * `shard` that buys one file per shard; packing itself is the two-pass
  * prefix scan (partition-count-bounded driver state), chunking is an
  * in-partition explode. The manifest is computed by READING BACK the
  * written files — one extra scan, and the content hashes certify the
  * bytes a trainer will actually read, not the plan that produced them.
  */
object ShardWriter {

  /** (shard, doc_id, chunk_idx, chunk_len, chunk_ids, __n_ids) for every
    * context window: the frame [[writeShards]] persists. Pure — shared
    * by the writer and its oracle query. */
  def chunkedWithShards(docs: DataFrame, idCol: String, idsCol: String,
                        budget: Long, chunkTokens: Int,
                        overlap: Int): DataFrame = {
    val n = docs.select(col(idCol), col(idsCol),
      size(col(idsCol)).cast("long").as("__n_ids"))
    val packed = Prefix.packIntoShards(n, idCol, "__n_ids", budget)
    Chunk.splitIds(packed, idsCol, chunkTokens, overlap)
      .select(col("shard"), col(idCol), col("chunk_idx"), col("chunk_len"),
        col("chunk_ids"), col("__n_ids"))
  }

  /** One row per shard over a [[chunkedWithShards]]-shaped frame:
    * (shard, n_docs, n_chunks, total_ids, total_chunk_ids,
    * content_hash). `total_ids` counts each document's model tokens
    * once (the per-doc max of `__n_ids` — a per-doc constant on the
    * planned path, and a per-row lower bound that ATTAINS the true
    * count on the read-back path, see [[writeShards]]);
    * `total_chunk_ids` counts written chunk entries (overlap included)
    * — the two diverge by exactly the overlap duplication.
    * `content_hash` is md5 over the (doc, chunk)-ordered chunk
    * fingerprints: deterministic across runs, partitionings, and
    * engines. Aggregates (shard, doc) first, then shard — ONE
    * chunk-level shuffle; the shard rollup moves doc-level rows only. */
  def manifest(chunked: DataFrame, idCol: String): DataFrame = {
    val perDoc = chunked
      .withColumn("__fp", md5(array_join(
        transform(col("chunk_ids"), i => i.cast("string")), " ")))
      .groupBy(col("shard"), col(idCol))
      .agg(
        max(col("__n_ids")).as("__doc_ids"),
        count(lit(1)).as("__nch"),
        sum(col("chunk_len")).as("__clen"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_idx"), col("__fp")))),
            x => x.getField("__fp")),
          " ").as("__docfps"))
    perDoc
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nch")).as("n_chunks"),
        sum(col("__doc_ids")).as("total_ids"),
        sum(col("__clen")).as("total_chunk_ids"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col(idCol), col("__docfps")))),
            x => x.getField("__docfps")),
          " ")).as("content_hash"))
  }

  /** Writes `dir/shards/shard=NNNN/` (one parquet file per shard) and
    * `dir/manifest/` (one parquet file), returning the manifest frame.
    * `docs` needs `idCol` plus `idsCol: array<int>` — the
    * [[graft.operators.Tokenizer.encode]] output shape. */
  def writeShards(docs: DataFrame, idCol: String, idsCol: String,
                  dir: String, budget: Long, chunkTokens: Int = 128,
                  overlap: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    val chunked = chunkedWithShards(docs, idCol, idsCol, budget,
      chunkTokens, overlap)
    // repartition on shard: every shard's rows land in one task, so
    // partitionBy emits exactly one file under each shard=NNNN dir
    chunked.drop("__n_ids")
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol), col("chunk_idx"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").parquet(s"$dir/shards")
    // the manifest certifies what LANDED, not what was planned: read the
    // written files back (partition discovery restores the shard column,
    // typed back to the planned long) and reconstruct each document's
    // token count from its own chunks: chunk i covers
    // [i·step, min(i·step + chunkTokens, n)), so the per-row quantity
    // chunk_idx·step + chunk_len equals min(i·step + chunkTokens, n) —
    // always ≤ n, attaining n at the last chunk — and manifest()'s
    // per-doc MAX recovers n exactly, with no doc-keyed window pass
    val step = chunkTokens - overlap
    // explicit schema: an empty input (or all-id-less docs) writes zero
    // data files under shards/, and schema inference would fail where
    // the honest answer is an empty manifest
    val written = spark.read.schema(chunked.drop("__n_ids").schema)
      .parquet(s"$dir/shards")
      .withColumn("shard", col("shard").cast("long"))
      .withColumn("__n_ids",
        (col("chunk_idx") * step + col("chunk_len")).cast("long"))
    val m = manifest(written, idCol)
    m.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/manifest")
    spark.read.parquet(s"$dir/manifest")
  }

  /** The PACKED variant of [[writeShards]] — the pretraining artifact
    * itself: [[graft.operators.Chunk.packSequences]] output (fixed
    * `seqLen` rows of concatenated ids + EOS separators, with
    * `seg_lens` boundary metadata for attention masking) written as
    * `shard=NNNN` partitioned parquet, `seqsPerShard` sequences per
    * shard, one file per shard. The manifest (one row per shard:
    * sequence count, id count, content hash over seq-ordered id
    * fingerprints) is computed from the files read back off disk — the
    * row a trainer checks before mapping a shard. Returns the manifest.
    *
    * Scale: packing's one seq-keyed shuffle is the only data-sized move
    * ([[graft.operators.Chunk.packSequences]]); the shard repartition
    * moves the same volume once more to buy one-file-per-shard — at
    * cluster scale fold the two by sizing `seqsPerShard` so shards
    * align with the packing partitioning if that move matters. */
  def writePackedShards(docs: DataFrame, idCol: String, idsCol: String,
                        dir: String, seqLen: Int, eosId: Int,
                        seqsPerShard: Long): DataFrame = {
    require(seqsPerShard >= 1, s"seqsPerShard must be positive: $seqsPerShard")
    val spark = docs.sparkSession
    val packed = graft.operators.Chunk
      .packSequences(docs, idCol, idsCol, seqLen, eosId)
      .withColumn("shard", (col("seq_id") / seqsPerShard).cast("long"))
    packed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("seq_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").parquet(s"$dir/shards")
    // explicit schema: zero packed sequences write zero data files and
    // inference would fail where the answer is an empty manifest
    val m = spark.read.schema(packed.schema).parquet(s"$dir/shards")
      .withColumn("shard", col("shard").cast("long"))
      .withColumn("__fp", md5(array_join(
        transform(col("ids"), i => i.cast("string")), " ")))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_seqs"),
        sum(col("n_ids")).as("total_ids"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("seq_id"), col("__fp")))),
            x => x.getField("__fp")), " ")).as("content_hash"))
    m.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/manifest")
    spark.read.parquet(s"$dir/manifest")
  }
}
