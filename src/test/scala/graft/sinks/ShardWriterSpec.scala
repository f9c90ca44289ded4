package graft.sinks

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Training-shard writer: one data file per shard=NNNN dir, read-back ==
  * the planned chunk frame, the manifest certifies landed bytes
  * (reconstructed token counts == planned), and content hashes are
  * rerun-deterministic. */
class ShardWriterSpec extends SparkSpec {

  import spark.implicits._

  private def tokenized() = {
    val d = Tables.load(spark, sf(), "documents").limit(200)
    graft.operators.Tokenizer
      .encode(d, "text", graft.queries.IncrementalOps.Merges)
      .select($"doc_id", $"token_ids")
  }

  test("writeShards: one file per shard, landed rows == planned, manifest certifies") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val enc = tokenized().localCheckpoint()
    val m = ShardWriter.writeShards(enc, "doc_id", "token_ids", dir,
      budget = 2048L, chunkTokens = 64, overlap = 16)

    // one parquet file per shard=NNNN directory — one reader per shard
    val shardDirs = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: ${files.length} files")
    }

    // landed rows == the planned chunk frame, chunk for chunk
    val planned = ShardWriter.chunkedWithShards(enc, "doc_id", "token_ids",
        2048L, 64, 16)
      .select($"shard", $"doc_id", $"chunk_idx", $"chunk_ids")
      .as[(Long, Long, Long, Seq[Int])].collect().toSet
    val landed = spark.read.parquet(s"$dir/shards")
      .select($"shard".cast("long"), $"doc_id", $"chunk_idx", $"chunk_ids")
      .as[(Long, Long, Long, Seq[Int])].collect().toSet
    assert(landed == planned)

    // the returned manifest == the persisted one == the planned algebra
    val persisted = spark.read.parquet(s"$dir/manifest")
    assert(m.collect().toSet == persisted.collect().toSet)
    val plannedManifest = ShardWriter.manifest(
      ShardWriter.chunkedWithShards(enc, "doc_id", "token_ids", 2048L, 64, 16),
      "doc_id").collect().toSet
    assert(persisted.collect().toSet == plannedManifest,
      "reconstructed-from-disk manifest must equal the planned algebra")

    // budget is respected in the q107 sense: every shard except possibly
    // the last holds at least one doc, shards are dense 0..max
    val shards = persisted.select($"shard").as[Long].collect().sorted
    assert(shards.toSeq == (0L to shards.max).toSeq, s"dense shards: ${shards.toSeq}")

    // determinism: a rerun into a fresh dir lands identical hashes
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString
    val m2 = ShardWriter.writeShards(enc, "doc_id", "token_ids", dir2,
      budget = 2048L, chunkTokens = 64, overlap = 16)
    assert(m2.collect().toSet == m.collect().toSet)
  }

  test("writePackedShards: one file per shard, landed sequences == packed, manifest deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("pshards").toString
    val enc = tokenized().localCheckpoint()
    val m = ShardWriter.writePackedShards(enc, "doc_id", "token_ids", dir,
      seqLen = 256, eosId = 0, seqsPerShard = 8)

    val shardDirs = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: ${files.length} files")
    }

    val landed = spark.read.parquet(s"$dir/shards")
      .select($"seq_id", $"ids").as[(Long, Seq[Int])].collect().toMap
    val packed = graft.operators.Chunk.packSequences(enc, "doc_id",
        "token_ids", 256, 0)
      .select($"seq_id", $"ids").as[(Long, Seq[Int])].collect().toMap
    assert(landed == packed, "landed sequences must equal the packed plan")

    // shards hold seqsPerShard sequences except possibly the last
    val counts = m.orderBy($"shard").select($"n_seqs").as[Long].collect()
    assert(counts.init.forall(_ == 8L) && counts.last <= 8L, counts.toSeq)

    val dir2 = java.nio.file.Files.createTempDirectory("pshards2").toString
    val m2 = ShardWriter.writePackedShards(enc, "doc_id", "token_ids", dir2,
      seqLen = 256, eosId = 0, seqsPerShard = 8)
    assert(m2.collect().toSet == m.collect().toSet, "rerun-identical manifests")
  }

  test("empty input yields an empty manifest, not a schema-inference crash") {
    val none = tokenized().limit(0).localCheckpoint()
    val d1 = java.nio.file.Files.createTempDirectory("eshards").toString
    val m1 = ShardWriter.writeShards(none, "doc_id", "token_ids", d1,
      budget = 2048L, chunkTokens = 64, overlap = 16)
    assert(m1.count() == 0L)
    val d2 = java.nio.file.Files.createTempDirectory("epshards").toString
    val m2 = ShardWriter.writePackedShards(none, "doc_id", "token_ids", d2,
      seqLen = 256, eosId = 0, seqsPerShard = 8)
    assert(m2.count() == 0L)
  }
}
