package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round 18: column-mapping rename — `renameColumn` is one METADATA
  * commit (no file rewritten); reads of every snapshot, before and
  * after, stay correct through the logical→physical projection; type
  * changes remain rejected; the reserved-physical-name and SQL-refusal
  * gates fail loudly instead of poisoning reads. */
class RenameColumnSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ren").toString
    new java.io.File(d).delete()
    d
  }

  test("rename is a metadata commit: zero files rewritten; old and new snapshots both read correctly") {
    val dir = freshDir()
    Snapshots.writeAppend(
      (0 until 50).map(i => (i.toLong, s"d$i")).toDF("id", "text"), dir) // v1
    val v1Files = Snapshots.versions(spark, dir).last.files
    assert(Snapshots.renameColumn(spark, dir, "id", "doc_id") == 2)     // v2
    val v2 = Snapshots.versions(spark, dir).last
    assert(v2.files == v1Files, "a rename must rewrite NOTHING")
    // new snapshot: logical name doc_id, data intact
    val now = Snapshots.read(spark, dir)
    assert(now.columns.toSeq == Seq("doc_id", "text"))
    assert(now.agg(sum($"doc_id")).as[Long].head() == (0 until 50).sum)
    // old snapshot still reads under ITS schema
    val before = Snapshots.read(spark, dir, Some(1))
    assert(before.columns.toSeq == Seq("id", "text"))
    assert(before.count() == 50)
    // filters on the new name work (pushed through the projection)
    assert(now.where($"doc_id" < 10).count() == 10)
  }

  test("appends after a rename land physical names; mixed-era files read as one table") {
    val dir = freshDir()
    Snapshots.writeAppend(
      (0 until 20).map(i => (i.toLong, s"a$i")).toDF("id", "text"), dir)
    Snapshots.renameColumn(spark, dir, "id", "doc_id")
    // post-rename writers use the LOGICAL name; the landed file stores
    // the physical one, so every file of the table agrees
    Snapshots.writeAppend(
      (100 until 120).map(i => (i.toLong, s"b$i")).toDF("doc_id", "text"), dir)
    val all = Snapshots.read(spark, dir)
    assert(all.count() == 40)
    assert(all.where($"doc_id" >= 100).count() == 20)
    assert(all.where($"doc_id" < 100).count() == 20)
    // CoW upsert keyed by the logical name still bounds its search
    Snapshots.upsert(Seq((5L, "upd")).toDF("doc_id", "text"), dir, "doc_id")
    assert(Snapshots.read(spark, dir).where($"doc_id" === 5)
      .select($"text").as[String].head() == "upd")
    assert(Snapshots.read(spark, dir).count() == 40)
    // CDC across the rename: the rename commit itself is silent
    // (metadata-only), later commits report normally
    val ch = Snapshots.changes(spark, dir, 1)
    assert(ch.where($"_commit_version" === 2).count() == 0,
      "a rename changes no rows")
    assert(ch.where($"_commit_version" === 3).count() == 20)
  }

  test("type changes stay rejected; the old physical name stays reserved; SQL refuses mapped tables") {
    val dir = freshDir()
    Snapshots.writeAppend(
      Seq((1L, "a")).toDF("id", "text"), dir)
    Snapshots.renameColumn(spark, dir, "id", "doc_id")
    // type change through the renamed column: still refused, naming it
    val e1 = intercept[IllegalArgumentException](
      Snapshots.writeAppend(Seq(("x", "b")).toDF("doc_id", "text"), dir))
    assert(e1.getMessage.contains("doc_id") &&
      e1.getMessage.contains("type conflicts"), e1.getMessage)
    // re-adding a column under the RESERVED physical name: refused at
    // the write, not poisoned at read
    val e2 = intercept[IllegalArgumentException](
      Snapshots.writeAppend(
        Seq((2L, "c", 9L)).toDF("doc_id", "text", "id"), dir))
    assert(e2.getMessage.contains("physical"), e2.getMessage)
    // renaming onto an existing name / from a missing column: refused
    intercept[IllegalArgumentException](
      Snapshots.renameColumn(spark, dir, "doc_id", "text"))
    intercept[IllegalArgumentException](
      Snapshots.renameColumn(spark, dir, "nope", "x"))
    // SQL reads the mapped table through the injected
    // SnapshotMappedReadRule (GraftSession installs it): the renamed
    // column answers under its LOGICAL name
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sql.SnapshotCatalog")
    assert(spark.sql(s"SELECT doc_id FROM graft.`$dir` WHERE doc_id = 1")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // writeOverwrite drops the mapping — the zero-IO shim path again
    Snapshots.writeOverwrite(Snapshots.read(spark, dir), dir)
    assert(spark.sql(s"SELECT doc_id FROM graft.`$dir`").count() == 1)
  }

  test("rename survives vacuum checkpoints and re-rename chains") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir)
    Snapshots.renameColumn(spark, dir, "id", "mid")
    Snapshots.renameColumn(spark, dir, "mid", "final_id")
    val got = Snapshots.read(spark, dir)
    assert(got.columns.toSeq == Seq("final_id", "text"))
    assert(got.select($"final_id").as[Long].head() == 1L)
    // chain keeps pointing at the ORIGINAL physical column
    Snapshots.writeAppend(Seq((2L, "b")).toDF("final_id", "text"), dir)
    Snapshots.vacuum(spark, dir, keepVersions = 2)
    val after = Snapshots.read(spark, dir)
    assert(after.select(sum($"final_id")).as[Long].head() == 3L)
  }
}
