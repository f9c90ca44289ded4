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

  test("materialize default: each stage executes once, fates re-executes nothing") {
    val d = Tables.load(spark, sf(), "documents").limit(60)
      .select($"doc_id", $"text").localCheckpoint()
    // an executed-row counter INSIDE stage 1's transform: under the lazy
    // form every downstream lost-branch re-runs it (the documented O(k²)
    // trap); under the materialized default it runs exactly once, at
    // stage() call time, and fates only reads pins
    val acc = spark.sparkContext.longAccumulator("audit_stage1_rows")
    val tick = udf((id: Long) => { acc.add(1L); id })
    def s1(df: DataFrame) = df.filter($"doc_id" % 2 === 0)
      .withColumn("doc_id", tick($"doc_id"))
    def s2(df: DataFrame) = df.filter($"doc_id" % 3 =!= 0)
    def s3(df: DataFrame) = df.filter($"doc_id" % 5 =!= 0)

    val audited = Audit.start(d, "doc_id")
      .stage("s1")(s1).stage("s2")(s2).stage("s3")(s3)
    val n1 = d.filter($"doc_id" % 2 === 0).count()
    // the pins are LAZY (r19): building the audited chain launches no
    // jobs at all — stage 1 has not run yet
    assert(acc.value == 0,
      s"building must be free — no stage may execute yet: ${acc.value} != 0")

    val fates = audited.fates.collect()
    assert(acc.value == n1,
      s"the fates action must execute stage 1 exactly once: ${acc.value} != $n1")
    assert(fates.length == d.count(), "one fate per input row")

    // a SECOND action over the chain reads the pins — still no re-run
    audited.fates.collect()
    assert(acc.value == n1,
      s"fates must read the stage pins, not re-execute: ${acc.value} != $n1")

    // survivors still equal the raw composition under the default
    val surv = audited.survivors.select($"doc_id").as[Long].collect().toSet
    val raw = s3(s2(s1(d))).select($"doc_id").as[Long].collect().toSet
    assert(surv == raw)
  }
}
