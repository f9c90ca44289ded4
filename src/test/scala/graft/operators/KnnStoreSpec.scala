package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Persistent k-NN graph store lifecycle: append == from-scratch,
  * double-commit no-op, crash-retry convergence, geometry fail-fast. */
class KnnStoreSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf(), "embeddings")

  private def dropStore(table: String): Unit =
    Seq(Similarity.knnVectorsTable(table), Similarity.knnEdgesTable(table),
      Similarity.knnEdgesTable(table) + "__rewriting").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
    }

  private def edges(table: String) =
    Similarity.openKnnStore(spark, table)
      .select($"q_id", $"vec_id", $"cos")

  test("append to a persisted store == from-scratch rebuild; retry converges") {
    val t = "knnstore_spec_a"
    dropStore(t)
    val old = emb.filter($"vec_id" % 4 =!= 0)
    val batch = emb.filter($"vec_id" % 4 === 0)
    Similarity.writeKnnStore(old, "vec_id", "embedding", t, k = 5)
    Similarity.appendToKnnStore(batch, "vec_id", "embedding", t)
    val full = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5)
    assert(edges(t).exceptAll(full).isEmpty && full.exceptAll(edges(t)).isEmpty,
      "appended store must equal the from-scratch graph")
    // vectors table carries everything exactly once
    assert(spark.table(Similarity.knnVectorsTable(t)).count() == emb.count())
    // double-commit of the same snapshot: a no-op on both tables
    Similarity.appendToKnnStore(batch, "vec_id", "embedding", t)
    assert(edges(t).exceptAll(full).isEmpty && full.exceptAll(edges(t)).isEmpty)
    assert(spark.table(Similarity.knnVectorsTable(t)).count() == emb.count())
    // crash-retry shape: edges committed, vectors append lost — simulate
    // by deleting the batch rows from the vectors table, then retrying
    val vt = Similarity.knnVectorsTable(t)
    val keep = spark.table(vt).filter($"vec_id" % 4 =!= 0).localCheckpoint()
    graft.sinks.Bucketing.overwriteBucketedStaged(keep, vt, Seq("vec_id"), 8)
    Similarity.appendToKnnStore(batch, "vec_id", "embedding", t)
    assert(edges(t).exceptAll(full).isEmpty && full.exceptAll(edges(t)).isEmpty,
      "retry after a lost vectors append must converge")
    assert(spark.table(vt).count() == emb.count())
    dropStore(t)
  }

  test("compaction after append preserves edges, geometry stamp, and probes") {
    val t = "knnstore_spec_c"
    dropStore(t)
    val old = emb.filter($"vec_id" % 3 =!= 0)
    Similarity.writeKnnStore(old, "vec_id", "embedding", t, k = 4)
    Similarity.appendToKnnStore(emb.filter($"vec_id" % 3 === 0),
      "vec_id", "embedding", t)
    val before = edges(t).collect().toSet
    graft.sinks.Bucketing.compactBucketed(spark, Similarity.knnEdgesTable(t))
    graft.sinks.Bucketing.compactBucketed(spark, Similarity.knnVectorsTable(t))
    assert(edges(t).collect().toSet == before, "compaction must not change rows")
    // the geometry stamp survives the staged swap (carryPropsAndSwap)
    assert(Similarity.openKnnStore(spark, t).count() == before.size)
    // and one more append still works against the compacted tables
    Similarity.appendToKnnStore(emb.filter($"vec_id" % 3 === 0),
      "vec_id", "embedding", t) // no-op double-commit
    assert(edges(t).collect().toSet == before)
    dropStore(t)
  }

  test("regeomKnnStore: migration == from-scratch rebuild at the new geometry") {
    val t = "knnstore_spec_g"
    val t2 = "knnstore_spec_g2"
    dropStore(t); dropStore(t2)
    Similarity.writeKnnStore(emb, "vec_id", "embedding", t, k = 4, bits = 2)
    Similarity.regeomKnnStore(spark, t, k = 4, bits = 6)
    Similarity.writeKnnStore(emb, "vec_id", "embedding", t2, k = 4, bits = 6)
    assert(edges(t).exceptAll(edges(t2)).isEmpty &&
      edges(t2).exceptAll(edges(t)).isEmpty,
      "migrated store must equal a from-scratch build at the new geometry")
    // stamps agree on the new geometry; appends work against it
    Similarity.appendToKnnStore(emb.limit(1), "vec_id", "embedding", t)
    assert(edges(t).exceptAll(edges(t2)).isEmpty)  // no-op append
    // AutoBits re-sizes from the stored corpus: n=500, dim=64 -> 3 bits
    Similarity.regeomKnnStore(spark, t, k = 4)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        Similarity.knnEdgesTable(t)))
    assert(meta.properties(Similarity.KnnGeometryProp) == "k=4;bits=3;tables=2")
    dropStore(t); dropStore(t2)
  }

  test("regeomKnnStore: a half-migrated store fails fast, rerun converges") {
    val t = "knnstore_spec_h"
    dropStore(t)
    Similarity.writeKnnStore(emb, "vec_id", "embedding", t, k = 3, bits = 2)
    // simulate a crash right after the vectors re-stamp (step 1)
    spark.sql(s"ALTER TABLE `${Similarity.knnVectorsTable(t)}` " +
      s"SET TBLPROPERTIES ('${Similarity.KnnGeometryProp}' = 'k=3;bits=5;tables=2')")
    intercept[IllegalArgumentException] { Similarity.openKnnStore(spark, t) }
    intercept[IllegalArgumentException] {
      Similarity.appendToKnnStore(emb.limit(1), "vec_id", "embedding", t)
    }
    // the rerun completes the migration and the store reads again
    Similarity.regeomKnnStore(spark, t, k = 3, bits = 5)
    assert(Similarity.openKnnStore(spark, t).count() > 0)
    val full = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3,
      bits = 5, tables = 2)
    assert(edges(t).exceptAll(full).isEmpty && full.exceptAll(edges(t)).isEmpty)
    dropStore(t)
  }

  test("geometry stamp: missing or diverged stamps fail fast") {
    val t = "knnstore_spec_b"
    dropStore(t)
    Similarity.writeKnnStore(emb, "vec_id", "embedding", t, k = 3, bits = 4)
    // a probe under the stamped geometry works
    assert(Similarity.openKnnStore(spark, t).count() > 0)
    // diverge one stamp
    spark.sql(s"ALTER TABLE `${Similarity.knnEdgesTable(t)}` SET TBLPROPERTIES " +
      s"('${Similarity.KnnGeometryProp}' = 'k=9;bits=4;tables=2')")
    intercept[IllegalArgumentException] {
      Similarity.openKnnStore(spark, t)
    }
    intercept[IllegalArgumentException] {
      Similarity.appendToKnnStore(emb.limit(1), "vec_id", "embedding", t)
    }
    // strip the stamp entirely
    spark.sql(s"ALTER TABLE `${Similarity.knnEdgesTable(t)}` UNSET TBLPROPERTIES " +
      s"('${Similarity.KnnGeometryProp}')")
    intercept[IllegalStateException] {
      Similarity.openKnnStore(spark, t)
    }
    dropStore(t)
  }
}
