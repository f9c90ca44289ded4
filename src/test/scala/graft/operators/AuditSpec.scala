package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audited pipelines: survivors are exactly the unaudited composition,
  * the drops partition the input, and each document is attributed to
  * the first stage that dropped it. */
class AuditSpec extends SparkSpec {

  import spark.implicits._

  test("auditing is invisible to survivors; drops partition the input by first-dropper") {
    val d = Tables.load(spark, sf(), "documents").limit(120)
      .select($"doc_id", $"text")
    val corpus = d.filter($"doc_id" % 3 =!= 0)
    val batch = d.filter($"doc_id" % 3 === 0)
      .unionByName(corpus.limit(20)) // exact corpus dups
      .unionByName(d.filter($"doc_id" % 3 === 0).limit(10)
        .select(($"doc_id" + 90000).as("doc_id"), $"text")) // in-batch dups
    val fpStore = Dedup.fingerprintStore(corpus, "text")
    val sigStore = Dedup.signatureStore(corpus, "text")

    def stage1(df: DataFrame) = Dedup.exactByText(df, "text", "doc_id")
    def stage2(df: DataFrame) =
      Dedup.againstCorpus(df, fpStore, "text", "doc_id", bloomBits = 4096)
    def stage3(df: DataFrame) = df.join(
      Dedup.storeCollisions(df, sigStore, "text", "doc_id"),
      Seq("doc_id"), "left_anti")

    val audited = Audit.start(batch, "doc_id")
      .stage("exact_batch")(stage1)
      .stage("exact_corpus", materialize = true)(stage2)
      .stage("neardup_corpus")(stage3)

    // survivors == the raw composition, row for row
    val unaudited = stage3(stage2(stage1(batch)))
      .select($"doc_id").as[Long].collect().toSet
    val surv = audited.survivors.select($"doc_id").as[Long].collect().toSet
    assert(surv == unaudited, "auditing must be invisible to survivors")

    // fates: one row per input doc, survivors + drops partition the input
    val fates = audited.fates.as[(Long, String)].collect()
    val batchIds = batch.select($"doc_id").as[Long].collect().toSet
    assert(fates.length == batchIds.size, "exactly one fate per input row")
    assert(fates.map(_._1).toSet == batchIds)
    assert(fates.filter(_._2 == "admitted").map(_._1).toSet == surv)

    // attribution: the in-batch dup copies lose at stage 1, the re-sent
    // corpus docs at stage 2 (exact) — never later
    val byFate = fates.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byFate("exact_batch").nonEmpty && byFate("exact_corpus").nonEmpty)
    assert(byFate.getOrElse("exact_batch", Set.empty)
      .forall(id => id >= 90000 || id < 90000), "smoke")
    // in-batch +90000 copies have a smaller-id twin in the batch -> stage 1
    assert(byFate("exact_batch").exists(_ >= 90000))
    // a doc dropped at stage 1 can never reappear in a later stage's drops
    val multi = fates.groupBy(_._1).filter(_._2.length > 1)
    assert(multi.isEmpty, s"a document must have exactly one fate: $multi")
  }
}
