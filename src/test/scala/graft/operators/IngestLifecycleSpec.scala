package graft.operators

import graft.{SparkSpec, Tables}
import graft.sinks.Bucketing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The production ingest LIFECYCLE end to end, over real fixture text:
  * three ingest rounds against persisted fingerprint + signature + span
  * stores — each round probes, admits, COMMITS to all three, and
  * COMPACTS — with idempotence, file-count, and probe-correctness
  * invariants holding at every step. This is the scenario the round-7
  * pieces compose into; each individual property is pinned in its own
  * suite, this pins that they hold TOGETHER across rounds. */
class IngestLifecycleSpec extends SparkSpec {

  import spark.implicits._

  test("three ingest rounds with commits + compaction: idempotent, one file per bucket, probes exact") {
    val d = Tables.load(spark, sf(), "documents").select($"doc_id", $"text")
    val corpus = d.filter($"doc_id" % 4 === 0)
    Dedup.writeFingerprintStore(corpus, "text", "life_fp", buckets = 4)
    Dedup.writeSignatureStore(corpus, "text", "life_sig", buckets = 4)
    Spans.writeSpanStore(corpus, "text", "life_span", buckets = 4)
    try {
      var shippedIds = Set.empty[Long]
      (1 to 3).foreach { r =>
        // round r's snapshot: new docs + byte-exact re-deliveries of the
        // text committed the round before (round 1 re-delivers corpus)
        val fresh = d.filter($"doc_id" % 4 === lit(r))
          .select(($"doc_id" + r * 100000).as("doc_id"), $"text")
        val redelivered = d.filter($"doc_id" % 4 === lit(r - 1))
          .select(($"doc_id" + r * 200000).as("doc_id"), $"text")
        val batch = fresh.unionByName(redelivered).localCheckpoint()

        val exact = Dedup.againstCorpus(batch,
          spark.table("life_fp"), "text", "doc_id", bloomBitsPerKey = 10)
        val novel = Dedup.nearDupsAgainstCorpus(exact,
          spark.table("life_sig"), "text", "doc_id").localCheckpoint()

        // every re-delivered text (committed in an earlier round) must
        // fall at the exact screen; admissions come only from the fresh
        // set (minus any NATURAL cross-snapshot near-dups in the fixture
        // corpus, which the signature screen is there to drop)
        val admitted = novel.select($"doc_id").as[Long].collect().toSet
        val freshIds = fresh.select($"doc_id").as[Long].collect().toSet
        val redeliveredIds = redelivered.select($"doc_id").as[Long].collect().toSet
        assert(admitted.nonEmpty && admitted.subsetOf(freshIds),
          s"round $r: admitted $admitted must come from fresh $freshIds")
        assert(admitted.intersect(redeliveredIds).isEmpty,
          s"round $r: no re-delivery may pass")

        // COMMIT to all three stores, then COMPACT all three
        Dedup.appendToFingerprintStore(novel, "text", "life_fp")
        Dedup.appendToSignatureStore(novel, "text", "life_sig")
        Spans.appendToSpanStore(novel, "text", "life_span")
        Seq("life_fp", "life_sig", "life_span").foreach { t =>
          Bucketing.compactBucketed(spark, t)
          val files = Bucketing.bucketFileStats(spark, t)
            .select($"files").as[Long].collect()
          assert(files.forall(_ == 1L),
            s"round $r, $t: compaction must leave one file per bucket: ${files.toSeq}")
        }

        // mid-lifecycle growth response: after round 2's commit the
        // fingerprint store has outgrown its write-time layout — rebucket
        // it (4 -> 8) driven by the same stats the compaction trigger
        // reads; rounds continue against the rebucketed store unchanged
        if (r == 2) {
          val grown = Bucketing.bucketFileStats(spark, "life_fp")
            .agg(sum($"bytes")).as[Long].head()
          assert(grown > 0L)
          Bucketing.rebucketStore(spark, "life_fp", 8)
          val meta = spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier("life_fp"))
          assert(meta.bucketSpec.exists(_.numBuckets == 8),
            s"mid-lifecycle rebucket must land: ${meta.bucketSpec}")
        }

        // post-commit: the SAME snapshot replays to zero admissions
        // through the compacted stores (idempotent ingest, all layers —
        // committed docs fall at the exact screen, the round's natural
        // near-dup rejects fall at the signature screen again)
        val replay = Dedup.nearDupsAgainstCorpus(
          Dedup.againstCorpus(batch, spark.table("life_fp"), "text", "doc_id"),
          spark.table("life_sig"), "text", "doc_id")
        assert(replay.count() == 0L,
          s"round $r: replay must admit nothing after commit")
        // ... and the span store scrubs a committed doc to empty
        val one = novel.limit(1).localCheckpoint()
        if (one.count() > 0) {
          val scrubbed = Spans.removeCorpusSpans(one,
            spark.table("life_span"), "text", "doc_id")
          val kept = scrubbed.select($"n_kept").as[Long].head()
          val total = scrubbed.select($"n_tokens").as[Long].head()
          assert(kept == 0L || total < 10L, // docs shorter than w have no spans
            s"round $r: committed doc must re-scrub to empty ($kept/$total)")
        }
        shippedIds ++= admitted
      }
      // the stores stayed distinct through 3 commit+compact cycles
      Seq("life_fp", "life_sig", "life_span").foreach { t =>
        val st = spark.table(t)
        assert(st.count() == st.distinct().count(), s"$t must stay distinct")
      }
    } finally Seq("life_fp", "life_sig", "life_span").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}__compacting")
      spark.sql(s"DROP TABLE IF EXISTS ${t}__rebucketing")
    }
  }
}
