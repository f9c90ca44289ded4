package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Incremental search index: append-then-search == build-from-scratch,
  * commits are idempotent under crash-retry, a query reads only its
  * terms' buckets (bucket pruning), and the table path equals the pure
  * frames path. */
class SearchStoreSpec extends SparkSpec {

  import spark.implicits._

  test("append-then-search == from-scratch; double-commit == single; buckets pruned") {
    val d = Tables.load(spark, sf(), "documents").select($"doc_id", $"text")
    val corpus = d.filter($"doc_id" % 3 =!= 0)
    val batch = d.filter($"doc_id" % 3 === 0)
    val terms = d.select(explode(graft.functions.Text.tokens($"text")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"t").limit(4)
      .as[(String, Long)].collect().map(_._1).toSeq

    SearchStore.write(corpus, "text", "doc_id", "ss_spec", buckets = 8)
    try {
      SearchStore.append(batch, "text", "doc_id", "ss_spec")
      val viaStore = SearchStore.search(spark, "ss_spec", terms, k = 15)
        .as[(Long, Double, Long)].collect().toSeq
      // the pure-frames twin over the full corpus (what q119 pins to SQL)
      val viaFrames = SearchStore.searchFrames(
          SearchStore.postings(d, "text", "doc_id"),
          SearchStore.docLengths(d, "text", "doc_id"), terms, k = 15)
        .as[(Long, Double, Long)].collect().toSeq
      assert(viaStore == viaFrames,
        s"store after append must score like the full corpus\n$viaStore\n$viaFrames")

      // crash-retry: the same commit again changes nothing
      val before = (spark.table("ss_spec_postings").count(),
        spark.table("ss_spec_docs").count())
      SearchStore.append(batch, "text", "doc_id", "ss_spec")
      assert((spark.table("ss_spec_postings").count(),
        spark.table("ss_spec_docs").count()) == before,
        "double-commit must not double term frequencies")
      assert(SearchStore.search(spark, "ss_spec", terms, k = 15)
        .as[(Long, Double, Long)].collect().toSeq == viaStore)

      // the search plan reads only the query terms' buckets of the
      // postings table (pruning shows on the scan the real query runs —
      // a bare probe would be un-bucketed by DisableUnnecessaryBucketedScan)
      val q = SearchStore.search(spark, "ss_spec", terms, k = 15)
      q.collect()
      val scans = collectPlan(q.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("ss_spec_postings")) => f
      }
      val selected = scans.flatMap(_.metadata.get("SelectedBucketsCount"))
      assert(selected.exists(_.matches(".*\\b[1-4] out of 8.*")),
        s"query terms must prune to their own buckets: " +
          s"$selected / ${scans.map(_.metadata)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ss_spec_postings")
      spark.sql("DROP TABLE IF EXISTS ss_spec_docs")
    }
  }
}
