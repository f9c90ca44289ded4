package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round 18: the Delta-shaped log — commit entries are DELTAS
  * (add/remove + schema, O(batch) bytes), full state reconstructs from
  * the nearest checkpoint sidecar (`vNNNNN.ckpt.json`, written every
  * `spark.graft.snapshots.checkpointInterval` commits) plus the deltas
  * above it. Pins the r17 verdict's done-criteria: commit bytes flat
  * in table file count, checkpoints appear on schedule, every read
  * path (time travel, addedSince, CDC, vacuum) green through the new
  * shape, and legacy full-state entries still read. */
class DeltaLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dlog").toString
    new java.io.File(d).delete()
    d
  }

  private def logFiles(dir: String): Seq[String] =
    new java.io.File(dir, "_graft_log").listFiles()
      .map(_.getName).toSeq.sorted

  private def entryBytes(dir: String, v: Int): Long =
    new java.io.File(new java.io.File(dir, "_graft_log"),
      f"v$v%05d.json").length

  test("commit entries are deltas: bytes O(batch), FLAT in table file count") {
    val dir = freshDir()
    // 64 files in the table by v1; then three one-row appends
    Snapshots.writeOverwrite(
      (0 until 6400).map(i => (i.toLong, s"d $i")).toDF("id", "text")
        .repartition(64), dir)
    val sizes = (2 to 4).map { v =>
      Snapshots.writeAppend(Seq(((v * 10000).toLong, "x")).toDF("id", "text"),
        dir)
      entryBytes(dir, v)
    }
    // each delta names ONE added file (+ remove [] + schema); the
    // 64-file table state must not ride in it — under 2 KB vs the
    // ~118 B/file full-state shape (64 files ≈ 8 KB+)
    sizes.foreach(b => assert(b < 2048,
      s"delta entry must be O(batch), got $b bytes: $sizes"))
    // and the content says so
    val e2 = java.nio.file.Files.readString(java.nio.file.Paths.get(
      dir, "_graft_log", "v00002.json"))
    assert(e2.contains("\"kind\":\"delta\"") && e2.contains("\"remove\":[]"),
      e2.take(200))
    // state still exact
    assert(Snapshots.read(spark, dir).count() == 6403)
    assert(Snapshots.countRows(spark, dir).contains(6403L))
  }

  test("checkpoint sidecars appear every interval commits; reads use them") {
    val dir = freshDir()
    spark.conf.set("spark.graft.snapshots.checkpointInterval", "3")
    try {
      (1 to 7).foreach(i =>
        Snapshots.writeAppend(Seq((i.toLong, s"r$i")).toDF("id", "text"), dir))
      val ckpts = logFiles(dir).filter(_.endsWith(".ckpt.json"))
      assert(ckpts == Seq("v00003.ckpt.json", "v00006.ckpt.json"), ckpts)
      // the checkpoint IS the full state at its version
      val viaLog = Snapshots.read(spark, dir, Some(6)).as[(Long, String)]
        .collect().toSet
      assert(viaLog == (1 to 6).map(i => i.toLong -> s"r$i").toSet)
      // every version readable (walk-back through mixed bases)
      (1 to 7).foreach(v =>
        assert(Snapshots.read(spark, dir, Some(v)).count() == v, s"v$v"))
    } finally spark.conf.unset("spark.graft.snapshots.checkpointInterval")
  }

  test("legacy full-state entries read unchanged and terminate the walk-back") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir)
    // rewrite v1 as a LEGACY full-state entry (what every pre-r18
    // commit looks like): same file list, no kind/remove keys
    val v1 = Snapshots.versions(spark, dir).head
    val legacy = s"""{"version":1,"op":"append","files":[""" +
      v1.files.map(f => "\"" + f + "\"").mkString(",") +
      s"""],"schema":${v1.schema.get.json}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      dir, "_graft_log", "v00001.json"), legacy)
    // deltas stack on top of the legacy base
    Snapshots.writeAppend(Seq((2L, "b")).toDF("id", "text"), dir)
    Snapshots.writeAppend(Seq((3L, "c")).toDF("id", "text"), dir)
    assert(Snapshots.read(spark, dir).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(Snapshots.read(spark, dir, Some(1)).count() == 1)
    // the legacy entry logged no sizes -> v1 scan falls back cleanly;
    // newer versions keep zero-IO planning for their own files
    assert(Snapshots.versions(spark, dir).map(_.op) ==
      Seq("append", "append", "append"))
  }

  test("CoW delete/upsert deltas carry remove lists; CDC and time travel stay exact") {
    val dir = freshDir()
    val base = (0 until 100).map(i => (i.toLong, i % 5)).toDF("id", "k")
    Snapshots.writeOverwrite(base.repartition(4, $"id"), dir)       // v1
    Snapshots.deleteWhere(spark, dir, col("k") === 3)               // v2
    Snapshots.upsert(Seq((7L, 99)).toDF("id", "k"), dir, "id")      // v3
    // v2/v3 entries are deltas with non-empty removes
    val e2 = java.nio.file.Files.readString(java.nio.file.Paths.get(
      dir, "_graft_log", "v00002.json"))
    assert(e2.contains("\"kind\":\"delta\"") &&
      !e2.contains("\"remove\":[]"), e2.take(300))
    // state algebra: v2 dropped k=3; v3 rewrote id=7
    assert(Snapshots.read(spark, dir, Some(2)).where($"k" === 3).count() == 0)
    assert(Snapshots.read(spark, dir).where($"id" === 7)
      .select($"k").as[Int].head() == 99)
    assert(Snapshots.read(spark, dir).count() == 80)
    // CDC over delta entries: inserts/deletes net out exactly
    val ch = Snapshots.changes(spark, dir, 1)
    val deleted = ch.where($"_change_type" === "delete" &&
      $"_commit_version" === 2).count()
    assert(deleted == 20, s"v2 must delete the 20 k=3 rows, got $deleted")
    val up = ch.where($"_commit_version" === 3)
      .groupBy($"_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(up == Map("delete" -> 1L, "insert" -> 1L), up.toString)
  }

  test("vacuum publishes a horizon checkpoint before dropping entries; retained reads survive") {
    val dir = freshDir()
    (1 to 6).foreach(i =>
      Snapshots.writeAppend(Seq((i.toLong, s"r$i")).toDF("id", "text"), dir))
    // no checkpoint yet (interval 10 > 6): every entry is a delta
    assert(!logFiles(dir).exists(_.endsWith(".ckpt.json")))
    Snapshots.vacuum(spark, dir, keepVersions = 2)
    // v5 (oldest retained) must have gained a checkpoint or nothing
    // below it would reconstruct
    assert(logFiles(dir).contains("v00005.ckpt.json"), logFiles(dir))
    assert(logFiles(dir).count(_.endsWith(".json")) >= 2)
    assert(Snapshots.read(spark, dir, Some(5)).count() == 5)
    assert(Snapshots.read(spark, dir, Some(6)).count() == 6)
    intercept[IllegalArgumentException](
      Snapshots.read(spark, dir, Some(4)))
    // a second vacuum drops the now-expired checkpoint too once its
    // version leaves the horizon
    Snapshots.writeAppend(Seq((7L, "r7")).toDF("id", "text"), dir)
    Snapshots.vacuum(spark, dir, keepVersions = 1)
    assert(!logFiles(dir).contains("v00005.ckpt.json"), logFiles(dir))
    assert(Snapshots.read(spark, dir).count() == 7)
  }

  test("addedSince and incremental polls stay exact across the delta shape") {
    val dir = freshDir()
    (1 to 12).foreach(i =>
      Snapshots.writeAppend(Seq((i.toLong, s"r$i")).toDF("id", "text"), dir))
    // default interval 10: one ckpt at v10
    assert(logFiles(dir).contains("v00010.ckpt.json"), logFiles(dir))
    val fresh = Snapshots.addedSince(spark, dir, 9)
      .select($"id").as[Long].collect().toSet
    assert(fresh == Set(10L, 11L, 12L), fresh.toString)
    assert(Snapshots.addedSince(spark, dir, 12).count() == 0)
  }
}
