package graft.sinks

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Snapshots: the minimal log — append/overwrite commits, version-pinned
  * reads (time travel), incremental addedSince, snapshot-isolated
  * compaction, vacuum retention. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_snap").toString
    new java.io.File(d).delete()
    d
  }

  test("append commits accumulate; read pins a version (time travel)") {
    val dir = freshDir()
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val first = docs.where($"lang" =!= "de")
    val second = docs.where($"lang" === "de")
    assert(Snapshots.writeAppend(first, dir) == 1)
    assert(Snapshots.writeAppend(second, dir) == 2)
    val v1 = Snapshots.read(spark, dir, Some(1))
    val v2 = Snapshots.read(spark, dir)
    assert(v1.count() == first.count() &&
      v1.exceptAll(first).isEmpty && first.exceptAll(v1).isEmpty)
    assert(v2.count() == docs.count() &&
      v2.exceptAll(docs).isEmpty && docs.exceptAll(v2).isEmpty)
    assert(Snapshots.versions(spark, dir).map(s => (s.version, s.op)) ==
      Seq((1, "append"), (2, "append")))
    // unknown version is an error, not an empty frame
    intercept[IllegalArgumentException](Snapshots.read(spark, dir, Some(9)))
  }

  test("overwrite replaces the current table but old versions stay readable") {
    val dir = freshDir()
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    Snapshots.writeAppend(docs, dir)
    val small = docs.where($"lang" === "en")
    assert(Snapshots.writeOverwrite(small, dir) == 2)
    assert(Snapshots.read(spark, dir).count() == small.count())
    assert(Snapshots.read(spark, dir, Some(1)).count() == docs.count(),
      "overwrite must not destroy time travel")
  }

  test("addedSince reads only files committed after the version") {
    val dir = freshDir()
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val first = docs.where($"lang" =!= "de")
    val second = docs.where($"lang" === "de")
    Snapshots.writeAppend(first, dir)
    Snapshots.writeAppend(second, dir)
    val delta = Snapshots.addedSince(spark, dir, 1)
    assert(delta.exceptAll(second).isEmpty && second.exceptAll(delta).isEmpty)
    // no new commits since latest: empty frame, table schema intact
    val none = Snapshots.addedSince(spark, dir, 2)
    assert(none.isEmpty && none.columns.sameElements(docs.columns))
  }

  test("compact flips the pointer without touching old files: snapshot isolation") {
    val dir = freshDir()
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    Snapshots.writeAppend(docs.repartition(8), dir)
    Snapshots.writeAppend(docs.repartition(8), dir) // 16 files, docs x2
    val before = Snapshots.versions(spark, dir).last
    assert(before.files.size == 16)
    val v = Snapshots.compact(spark, dir, 512L * 1024 * 1024)
    assert(v.contains(3))
    val after = Snapshots.versions(spark, dir).last
    assert(after.op == "compact" && after.files.size == 1)
    assert(Snapshots.read(spark, dir).count() == docs.count() * 2)
    // the pre-compaction snapshot still reads its own 16 files
    assert(Snapshots.read(spark, dir, Some(2)).count() == docs.count() * 2)
    assert(before.files.forall(f => new java.io.File(dir, f).exists),
      "compaction must not delete old files — vacuum does")
    // already compact: no-op, no new version
    assert(Snapshots.compact(spark, dir, 512L * 1024 * 1024).isEmpty)
    assert(Snapshots.versions(spark, dir).last.version == 3)
  }

  test("vacuum deletes only unreferenced files and expired log entries") {
    val dir = freshDir()
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    Snapshots.writeAppend(docs.repartition(4), dir)
    Snapshots.compact(spark, dir, 512L * 1024 * 1024)
    val preVacuum = Snapshots.versions(spark, dir)
    assert(preVacuum.map(_.version) == Seq(1, 2))
    Snapshots.vacuum(spark, dir, keepVersions = 1)
    val post = Snapshots.versions(spark, dir)
    assert(post.map(_.version) == Seq(2))
    assert(Snapshots.read(spark, dir).count() == docs.count())
    // v1's four fragment files are gone; v2's single file remains
    val live = post.head.files.toSet
    preVacuum.head.files.filterNot(live).foreach(f =>
      assert(!new java.io.File(dir, f).exists, s"$f should be vacuumed"))
    live.foreach(f => assert(new java.io.File(dir, f).exists))
    intercept[IllegalArgumentException](
      Snapshots.read(spark, dir, Some(1))) // history given up explicitly
  }

  test("writeAppendBatch: streaming foreachBatch commits are idempotent under replay") {
    val dir = freshDir()
    val src = java.nio.file.Files.createTempDirectory("snap_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("snap_ckpt").toString
    val b1 = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    val b2 = Seq((3L, "gamma")).toDF("id", "text")
    b1.write.mode("append").parquet(src)
    def drain(): Unit = {
      val q = spark.readStream.schema(b1.schema).parquet(src)
        .writeStream
        .foreachBatch((df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], id: Long) =>
          { Snapshots.writeAppendBatch(df, dir, id); () })
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    b2.write.mode("append").parquet(src)
    drain()
    val ops = Snapshots.versions(spark, dir).map(_.op)
    assert(ops == Seq("append-batch-0", "append-batch-1"), ops.toString)
    assert(Snapshots.read(spark, dir).count() == 3)
    // a crash-replay of the last batch (same id) lands nothing
    assert(Snapshots.writeAppendBatch(b2, dir, 1L).isEmpty)
    assert(Snapshots.read(spark, dir).count() == 3)
    // the downstream incremental consumer sees exactly batch 1's rows
    val delta = Snapshots.addedSince(spark, dir, 1)
    assert(delta.as[(Long, String)].collect().toSeq == Seq(3L -> "gamma"))
  }

  test("maintain = compact + vacuum in one scheduled pass") {
    val dir = freshDir()
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    Snapshots.writeAppend(docs.repartition(6), dir)
    Snapshots.writeAppend(docs.repartition(6), dir)
    val v = Snapshots.maintain(spark, dir, 512L * 1024 * 1024,
      keepVersions = 1)
    assert(v.contains(3))
    assert(Snapshots.versions(spark, dir).map(_.version) == Seq(3))
    assert(Snapshots.read(spark, dir).count() == docs.count() * 2)
    // the twelve fragments are vacuumed; only the compacted file lives
    val live = Snapshots.versions(spark, dir).head.files.toSet
    val onDisk = new java.io.File(dir).listFiles.toSeq.map(_.getName)
      .filter(_.endsWith(".parquet"))
    assert(onDisk.toSet == live && live.size == 1, onDisk.toString)
  }

  test("optimizeZorder: committed rewrite has narrow per-file ranges on both columns") {
    val dir = freshDir()
    val li = Tables.load(spark, sf("sf0.01"), "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    Snapshots.writeAppend(li.repartition(16), dir) // layout-free fragments
    val v = Snapshots.optimizeZorder(spark, dir, "l_partkey", "l_suppkey",
      targetBytes = 24L * 1024)
    val snap = Snapshots.versions(spark, dir).last
    assert(snap.version == v && snap.op == "zorder" && snap.files.size >= 10)
    val opt = Snapshots.read(spark, dir)
    assert(opt.count() == li.count())
    assert(opt.exceptAll(li).isEmpty && li.exceptAll(opt).isEmpty)
    assert(Snapshots.read(spark, dir, Some(1)).count() == li.count(),
      "pre-rewrite snapshot still readable")
    // both z columns skip: a point probe touches a minority of files
    val ranges = opt.groupBy(input_file_name().as("f"))
      .agg(min($"l_partkey").as("plo"), max($"l_partkey").as("phi"),
        min($"l_suppkey").as("slo"), max($"l_suppkey").as("shi"))
      .as[(String, Long, Long, Long, Long)].collect()
    val (pMax, sMax) = li.agg(max($"l_partkey"), max($"l_suppkey"))
      .as[(Long, Long)].head()
    val tp = ranges.count(r => r._2 <= pMax / 2 && pMax / 2 <= r._3)
    val ts = ranges.count(r => r._4 <= sMax / 2 && sMax / 2 <= r._5)
    assert(tp <= ranges.length * 5 / 8, s"partkey probe touched $tp/${ranges.length}")
    assert(ts <= ranges.length * 5 / 8, s"suppkey probe touched $ts/${ranges.length}")
  }

  test("schema widening across appends: latest reads the footer union, pinned versions keep theirs") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir)
    Snapshots.writeAppend(Seq((2L, "b", "en")).toDF("id", "text", "lang"), dir)
    val latest = Snapshots.read(spark, dir)
    assert(latest.columns.sorted.sameElements(Array("id", "lang", "text")))
    val byId = latest.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(latest.columns.indexOf("lang")),
      "pre-widening rows read back with NULL in the new column")
    assert(byId(2L).getString(latest.columns.indexOf("lang")) == "en")
    assert(Snapshots.read(spark, dir, Some(1)).columns.sorted
      .sameElements(Array("id", "text")), "the pinned version keeps its schema")
  }

  test("prunedRead binds to its snapshot: an overwrite after the pin is invisible") {
    val dir = freshDir()
    val li = Tables.load(spark, sf("sf0.001"), "lineitem")
      .select($"l_orderkey", $"l_partkey")
    Snapshots.writeAppend(li.repartition(4), dir)
    val (lo, hi) = li.agg(min($"l_orderkey"), max($"l_orderkey"))
      .as[(Long, Long)].head()
    // pin version 1, then let a writer replace the table
    Snapshots.writeOverwrite(li.limit(10), dir)
    val pinned = Snapshots.prunedRead(spark, dir, "l_orderkey",
        lo.toDouble, (lo + (hi - lo) / 4).toDouble, version = Some(1))
      .where($"l_orderkey" <= lo + (hi - lo) / 4)
    val truth = li.where($"l_orderkey" <= lo + (hi - lo) / 4)
    assert(pinned.exceptAll(truth).isEmpty && truth.exceptAll(pinned).isEmpty)
    // manifest rows cover exactly the snapshot's files
    val mf = Snapshots.manifest(spark, dir, Seq("l_orderkey"), Some(1))
    assert(mf.select($"file").distinct().count() == 4)
    // all-pruned: empty frame, schema intact
    val none = Snapshots.prunedRead(spark, dir, "l_orderkey",
      hi.toDouble + 1e7, hi.toDouble + 2e7, version = Some(1))
    assert(none.isEmpty &&
      none.columns.sameElements(Array("l_orderkey", "l_partkey")))
  }

  test("deleteWhere rewrites ONLY files containing matches; null predicate rows kept") {
    val dir = freshDir()
    // two range-partitioned files: ids 1-50 and 51-100; delete hits
    // only the low file
    val rows = (1 to 100).map(i =>
      (i.toLong, if (i <= 3) None else Some(s"doc $i"))).toDF("id", "text")
    Snapshots.writeAppend(rows.repartitionByRange(2, $"id"), dir)
    val before = Snapshots.versions(spark, dir).last.files
    assert(before.size == 2)
    val v = Snapshots.deleteWhere(spark, dir, $"id" <= 10 && length($"text") > 0)
    assert(v.contains(2))
    val after = Snapshots.versions(spark, dir).last.files
    // the high file rides through by NAME — no rewrite
    assert(before.count(after.contains) == 1,
      s"exactly one original file must survive untouched: $before -> $after")
    val left = Snapshots.read(spark, dir)
    // ids 4..10 deleted; 1..3 have NULL predicate (length(null)) -> KEPT
    assert(left.count() == 93)
    assert(left.where($"id" <= 3).count() == 3, "NULL-predicate rows are kept")
    assert(left.where($"id".between(4, 10)).isEmpty)
    // nothing matches -> None, no new version
    assert(Snapshots.deleteWhere(spark, dir, $"id" > 1000).isEmpty)
    assert(Snapshots.versions(spark, dir).last.version == 2)
  }

  test("upsert: matched keys replaced in-place, new keys inserted, untouched files spliced") {
    val dir = freshDir()
    val rows = (1 to 100).map(i => (i.toLong, s"old $i")).toDF("id", "text")
    Snapshots.writeAppend(rows.repartitionByRange(2, $"id"), dir)
    val before = Snapshots.versions(spark, dir).last.files
    val updates = Seq((5L, "new 5"), (7L, "new 7"), (200L, "new 200"))
      .toDF("id", "text")
    Snapshots.upsert(updates, dir, "id")
    val after = Snapshots.versions(spark, dir).last
    assert(after.op == "upsert")
    assert(before.count(after.files.contains) == 1,
      "the high file holds no matched key and must splice through")
    val t = Snapshots.read(spark, dir)
    assert(t.count() == 101)
    val byId = t.as[(Long, String)].collect().toMap
    assert(byId(5L) == "new 5" && byId(7L) == "new 7" && byId(200L) == "new 200")
    assert(byId(6L) == "old 6" && byId(100L) == "old 100")
    // no key matches -> pure insert, still one commit
    Snapshots.upsert(Seq((300L, "new 300")).toDF("id", "text"), dir, "id")
    assert(Snapshots.read(spark, dir).count() == 102)
    intercept[IllegalArgumentException](
      Snapshots.upsert(updates, dir, "nope"))
  }

  test("changes: op-aware CDC — appends insert, CoW pairs delete+insert, layout ops silent") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "one"), (2L, "two")).toDF("id", "text")
      .repartitionByRange(2, $"id"), dir)                      // v1
    Snapshots.writeAppend(Seq((3L, "three")).toDF("id", "text"), dir) // v2
    Snapshots.upsert(Seq((2L, "TWO")).toDF("id", "text"), dir, "id")  // v3
    Snapshots.deleteWhere(spark, dir, $"id" === 1)                    // v4
    Snapshots.compact(spark, dir, 512L * 1024 * 1024)                 // v5
    assert(Snapshots.versions(spark, dir).last.op == "compact")
    val feed = Snapshots.changes(spark, dir, 0)
      .as[(Long, String, String, Int)].collect().toSet
    assert(feed == Set(
      (1L, "one", "insert", 1), (2L, "two", "insert", 1),
      (3L, "three", "insert", 2),
      (2L, "two", "delete", 3), (2L, "TWO", "insert", 3),
      (1L, "one", "delete", 4)), feed.toString)
    // incremental consumption: only commits after the cursor
    val tail = Snapshots.changes(spark, dir, 3)
      .as[(Long, String, String, Int)].collect().toSet
    assert(tail == Set((1L, "one", "delete", 4)))
    // a fully-caught-up cursor yields an empty feed with the schema
    assert(Snapshots.changes(spark, dir, 5).isEmpty)
    intercept[IllegalArgumentException](Snapshots.changes(spark, dir, 9))
  }

  test("deleteWhere everything: the empty table commits and reads back with schema") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), dir)
    val v = Snapshots.deleteWhere(spark, dir, lit(true))
    assert(v.contains(2))
    val empty = Snapshots.read(spark, dir)
    assert(empty.isEmpty && empty.columns.sameElements(Array("id", "text")))
    // and the table remains appendable after the wipe
    Snapshots.writeAppend(Seq((3L, "c")).toDF("id", "text"), dir)
    assert(Snapshots.read(spark, dir).count() == 1)
  }

  test("optimizeZorderN: three-column committed rewrite keeps rows and caps bits") {
    val dir = freshDir()
    val li = Tables.load(spark, sf("sf0.001"), "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    Snapshots.writeAppend(li.repartition(4), dir)
    Snapshots.optimizeZorderN(spark, dir,
      Seq("l_orderkey", "l_partkey", "l_suppkey"), 32L * 1024)
    val opt = Snapshots.read(spark, dir)
    assert(opt.exceptAll(li).isEmpty && li.exceptAll(opt).isEmpty)
    // 4 x 16 bits would overflow a positive long: rejected upstream
    intercept[IllegalArgumentException](Layout.zorderFrameN(li,
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_orderkey"), 4, 16))
  }

  test("importDir adopts a plain parquet dir without rewriting; restore is a versioned undo") {
    val dir = java.nio.file.Files.createTempDirectory("graft_import").toString
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    docs.repartition(4).write.mode("overwrite").parquet(dir)
    val names = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.endsWith(".parquet")).sorted
    assert(Snapshots.importDir(spark, dir) == 1)
    val snap = Snapshots.versions(spark, dir).head
    assert(snap.op == "import" && snap.files.sorted.sameElements(names),
      "adoption names the existing files; no byte rewritten")
    assert(Snapshots.read(spark, dir).count() == docs.count())
    // a second import is refused; the log now owns the table
    intercept[IllegalArgumentException](Snapshots.importDir(spark, dir))
    // post-adoption lifecycle works: CoW delete, then restore undoes it
    Snapshots.deleteWhere(spark, dir, col("lang") === "de")
    val afterDelete = Snapshots.read(spark, dir).count()
    assert(afterDelete < docs.count())
    val v3 = Snapshots.restore(spark, dir, 1)
    assert(v3 == 3 && Snapshots.versions(spark, dir).last.op == "restore")
    assert(Snapshots.read(spark, dir).count() == docs.count())
    // the rollback is itself history: the delete state is still pinned
    assert(Snapshots.read(spark, dir, Some(2)).count() == afterDelete)
    // and the CDC feed reports the restore as its logical re-insertion
    val feed = Snapshots.changes(spark, dir, 2)
    assert(feed.where(col("_change_type") === "insert").count() ==
      docs.count() - afterDelete)
    assert(feed.where(col("_change_type") === "delete").isEmpty)
  }

  test("batch replay is detected even under a maintenance commit on top") {
    val dir = freshDir()
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    assert(Snapshots.writeAppendBatch(b0.repartition(4), dir, 0L).contains(1))
    Snapshots.compact(spark, dir, 512L * 1024 * 1024) // maintenance lands on top
    assert(Snapshots.versions(spark, dir).last.op == "compact")
    // crash-recovery replays batch 0 with the compact newest: must skip
    assert(Snapshots.writeAppendBatch(b0, dir, 0L).isEmpty)
    assert(Snapshots.read(spark, dir).count() == 2)
    // the next real batch still lands
    assert(Snapshots.writeAppendBatch(
      Seq((3L, "c")).toDF("id", "text"), dir, 1L).isDefined)
    assert(Snapshots.read(spark, dir).count() == 3)
  }

  test("vacuum spares young staging dirs (concurrent writers), sweeps stranded ones") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text")
      .repartition(2), dir)
    Snapshots.compact(spark, dir, 512L * 1024 * 1024)
    val fresh = new java.io.File(dir, "_staging_live")
    fresh.mkdirs()
    // a crash between temp-write and publish strands a .tmp- entry in
    // the log dir: same age-guarded sweep
    val tmpEntry = new java.io.File(new java.io.File(dir, "_graft_log"),
      ".tmp-deadbeef")
    java.nio.file.Files.writeString(tmpEntry.toPath, "{}")
    Snapshots.vacuum(spark, dir, keepVersions = 1) // default 24h age guard
    assert(fresh.exists, "a seconds-old staging dir must survive vacuum")
    assert(tmpEntry.exists, "a seconds-old commit temp must survive vacuum")
    Snapshots.vacuum(spark, dir, keepVersions = 1, strandedStagingMs = 0)
    assert(!fresh.exists, "aged-out staging debris is swept")
    assert(!tmpEntry.exists, "aged-out commit temps are swept")
  }

  // ---- round 16: commit intents (rebase/conflict), schema gate, horizon ----

  private def entryJson(version: Int, files: Seq[String],
                        schema: org.apache.spark.sql.types.StructType): String =
    s"""{"version":$version,"op":"append","files":[""" +
      files.map(f => "\"" + f + "\"").mkString(",") +
      s"""],"schema":${schema.json}}"""

  test("losing appender REBASES: the race winner's files survive in the final version") {
    val dir = freshDir()
    assert(Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir) == 1)
    val v1 = Snapshots.versions(spark, dir).last
    // a competing commit lands INSIDE the race window (between our temp
    // write and the exclusive publish): v2 = v1's files + a ghost file
    val sch = Snapshots.versions(spark, dir).last.schema.get
    @volatile var fired = false
    Snapshots.racePoint = _ => if (!fired) {
      fired = true
      java.nio.file.Files.writeString(
        new java.io.File(new java.io.File(dir, "_graft_log"), "v00002.json").toPath,
        entryJson(2, v1.files :+ "ghost.parquet", sch))
    }
    try assert(Snapshots.writeAppend(Seq((2L, "b")).toDF("id", "text"), dir) == 3)
    finally Snapshots.racePoint = _ => ()
    assert(fired, "the race window hook must have fired")
    val v3 = Snapshots.versions(spark, dir).last
    assert(v3.version == 3 && v3.op == "append")
    // the lost update of the old design: v3 built from pre-race v1 would
    // drop ghost.parquet. Rebase keeps the winner's file AND our delta.
    assert(v3.files.contains("ghost.parquet"),
      s"race winner's file dropped — lost update: ${v3.files}")
    assert(v1.files.forall(v3.files.contains), "base files survive")
    assert(v3.files.size == v1.files.size + 2, s"delta landed: ${v3.files}")
  }

  test("losing rewrite CONFLICTS: deleteWhere against a moved base throws, table intact") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), dir)
    val v1 = Snapshots.versions(spark, dir).last
    val sch = v1.schema.get
    @volatile var fired = false
    Snapshots.racePoint = _ => if (!fired) {
      fired = true
      java.nio.file.Files.writeString(
        new java.io.File(new java.io.File(dir, "_graft_log"), "v00002.json").toPath,
        entryJson(2, v1.files, sch))
    }
    val e = try intercept[java.util.ConcurrentModificationException](
      Snapshots.deleteWhere(spark, dir, $"id" === 1))
    finally Snapshots.racePoint = _ => ()
    assert(e.getMessage.contains("base version 1") &&
      e.getMessage.contains("now 2"), e.getMessage)
    // nothing committed on top of the winner: latest is the manual v2
    assert(Snapshots.versions(spark, dir).last.version == 2)
    assert(Snapshots.read(spark, dir).count() == 2, "no rows lost")
  }

  test("four concurrent appenders all land; no delta is lost (stress)") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((0L, "base")).toDF("id", "text"), dir)
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    val errs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        try {
          val df = Seq((i.toLong, s"writer $i")).toDF("id", "text")
          barrier.await()
          Snapshots.writeAppend(df, dir)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, errs.toString)
    val vs = Snapshots.versions(spark, dir)
    assert(vs.map(_.version) == (1 to 5), vs.map(_.version).toString)
    val t = Snapshots.read(spark, dir).as[(Long, String)].collect().toMap
    assert(t.keySet == Set(0L, 1L, 2L, 3L, 4L),
      s"a concurrent append was lost: ${t.keySet}")
    // every landed file is referenced by the final version
    val latestFiles = vs.last.files.toSet
    vs.foreach(v => assert(v.files.toSet.subsetOf(latestFiles),
      s"v${v.version} files missing from final: ${v.files.filterNot(latestFiles)}"))
  }

  test("schema gate: type-conflicting append/upsert fail at COMMIT naming the column; overwrite resets") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir)
    val dataFiles = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    val e = intercept[IllegalArgumentException](
      Snapshots.writeAppend(Seq(("oops", "b")).toDF("id", "text"), dir))
    assert(e.getMessage.contains("'id'") && e.getMessage.contains("bigint") &&
      e.getMessage.contains("string"), e.getMessage)
    // fail-fast: the rejected append landed nothing
    assert(new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
      == dataFiles, "rejected append must not land data files")
    val eu = intercept[IllegalArgumentException](
      Snapshots.upsert(Seq(("oops", "b")).toDF("id", "text"), dir, "id"))
    assert(eu.getMessage.contains("'id'"), eu.getMessage)
    // widening passes and the merged schema is logged
    Snapshots.writeAppend(Seq((2L, "c", "en")).toDF("id", "text", "lang"), dir)
    val logged = Snapshots.versions(spark, dir).last.schema.get
    assert(logged.fieldNames.sorted.sameElements(Array("id", "lang", "text")))
    // overwrite is the sanctioned type-change path: schema resets
    Snapshots.writeOverwrite(Seq(("x", "b")).toDF("id", "text"), dir)
    assert(Snapshots.read(spark, dir).schema("id").dataType ==
      org.apache.spark.sql.types.StringType)
    // and appends must now match the NEW schema
    Snapshots.writeAppend(Seq(("y", "c")).toDF("id", "text"), dir)
    intercept[IllegalArgumentException](
      Snapshots.writeAppend(Seq((9L, "d")).toDF("id", "text"), dir))
  }

  test("vacuum horizon fails LOUD at plan time: read/addedSince/changes name the retained range") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir)
    Snapshots.writeAppend(Seq((2L, "b")).toDF("id", "text"), dir)
    Snapshots.writeAppend(Seq((3L, "c")).toDF("id", "text"), dir)
    Snapshots.vacuum(spark, dir, keepVersions = 1)
    val er = intercept[IllegalArgumentException](
      Snapshots.read(spark, dir, Some(1)))
    assert(er.getMessage.contains("retained versions: 3..3"), er.getMessage)
    val ea = intercept[IllegalArgumentException](
      Snapshots.addedSince(spark, dir, 1))
    assert(ea.getMessage.contains("retained"), ea.getMessage)
    val ec = intercept[IllegalArgumentException](
      Snapshots.changes(spark, dir, 0))
    assert(ec.getMessage.contains("retained"), ec.getMessage)
    intercept[IllegalArgumentException](Snapshots.changes(spark, dir, 2))
    // at-the-horizon cursors still work
    assert(Snapshots.changes(spark, dir, 3).isEmpty)
    assert(Snapshots.addedSince(spark, dir, 3).isEmpty)
    assert(Snapshots.read(spark, dir, Some(3)).count() == 3)
  }

  test("empty upsert is a no-op: current version returned, no commit, no CDC noise") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), dir)
    val v = Snapshots.upsert(Seq.empty[(Long, String)].toDF("id", "text"),
      dir, "id")
    assert(v == 1, "no-op returns the current version")
    assert(Snapshots.versions(spark, dir).map(_.version) == Seq(1))
    assert(Snapshots.changes(spark, dir, 0)
      .where($"_change_type" === "delete").isEmpty)
  }

  test("changes bounded by upToVersion reads only that prefix of the feed") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "one")).toDF("id", "text"), dir)   // v1
    Snapshots.writeAppend(Seq((2L, "two")).toDF("id", "text"), dir)   // v2
    Snapshots.deleteWhere(spark, dir, $"id" === 1)                    // v3
    val firstTwo = Snapshots.changes(spark, dir, 0, upToVersion = Some(2))
      .as[(Long, String, String, Int)].collect().toSet
    assert(firstTwo == Set((1L, "one", "insert", 1), (2L, "two", "insert", 2)))
    val third = Snapshots.changes(spark, dir, 2, upToVersion = Some(3))
      .as[(Long, String, String, Int)].collect().toSet
    assert(third == Set((1L, "one", "delete", 3)))
    intercept[IllegalArgumentException](
      Snapshots.changes(spark, dir, 0, upToVersion = Some(9)))
  }

  test("CoW matches URI-encodable adopted file names (space in name): rows actually delete") {
    val dir = java.nio.file.Files.createTempDirectory("graft_uri").toString
    Seq((1L, "de"), (2L, "en"), (3L, "de")).toDF("id", "lang")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val part = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).head
    val spaced = new java.io.File(dir, "data file 1.parquet")
    assert(part.renameTo(spaced))
    assert(Snapshots.importDir(spark, dir) == 1)
    assert(Snapshots.versions(spark, dir).head.files == Seq("data file 1.parquet"))
    val v = Snapshots.deleteWhere(spark, dir, $"lang" === "de")
    assert(v.contains(2), "the space-named file must match the touched set")
    val left = Snapshots.read(spark, dir).as[(Long, String)].collect().toSeq
    assert(left == Seq(2L -> "en"),
      s"rows in the URI-encodable file must actually delete: $left")
  }

  test("snapshot reads plan from the LOGGED schema; legacy schemaless entries fall back") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir)
    val vs = Snapshots.versions(spark, dir)
    assert(vs.forall(_.schema.isDefined), "commits log their schema")
    // strip the schema from the entry by hand: the read still works via
    // the footer-union fallback (pre-r16 logs stay readable)
    val log = new java.io.File(dir, "_graft_log")
    java.nio.file.Files.writeString(new java.io.File(log, "v00001.json").toPath,
      s"""{"version":1,"op":"append","files":[""" +
        vs.head.files.map(f => "\"" + f + "\"").mkString(",") + "]}")
    assert(Snapshots.versions(spark, dir).head.schema.isEmpty)
    assert(Snapshots.read(spark, dir).as[(Long, String)].collect().toSeq ==
      Seq(1L -> "a"))
    // and the next append re-establishes a logged schema via the fallback
    Snapshots.writeAppend(Seq((2L, "b")).toDF("id", "text"), dir)
    assert(Snapshots.versions(spark, dir).last.schema.isDefined)
  }

  test("single-column optimizeZorder range-clusters; a key-batched upsert then rewrites only matched files") {
    val dir = freshDir()
    val rows = (1 to 1000).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    Snapshots.writeAppend(rows.repartition(8, $"id"), dir) // hash-spread
    Snapshots.optimizeZorderN(spark, dir, Seq("id"), targetBytes = 2048)
    val clustered = Snapshots.versions(spark, dir).last
    assert(clustered.op == "zorder" && clustered.files.size >= 4,
      s"expected several range-clustered files: ${clustered.files.size}")
    // a contiguous key batch must touch only the file(s) its range hits
    val updates = (1 to 50).map(i => (i.toLong, s"new $i")).toDF("id", "text")
    Snapshots.upsert(updates, dir, "id")
    val after = Snapshots.versions(spark, dir).last
    val untouched = clustered.files.count(after.files.contains)
    assert(untouched >= clustered.files.size - 2,
      s"clustered upsert must splice most files through: " +
        s"$untouched/${clustered.files.size} untouched")
    val t = Snapshots.read(spark, dir).as[(Long, String)].collect().toMap
    assert(t.size == 1000 && t(1L) == "new 1" && t(50L) == "new 50" &&
      t(51L) == "doc 51" && t(1000L) == "doc 1000")
  }

  test("deleteKeys: CoW delete by key FRAME, manifest-pruned — untouched key ranges splice through") {
    val dir = freshDir()
    val rows = (1 to 1000).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    Snapshots.writeAppend(rows.repartitionByRange(4, $"id"), dir)
    val before = Snapshots.versions(spark, dir).last.files
    assert(before.size == 4)
    val keys = Seq(5L, 7L, 999L, 2000L).toDF("id") // 2000 matches nothing
    val v = Snapshots.deleteKeys(spark, dir, "id", keys)
    assert(v.contains(2))
    val after = Snapshots.versions(spark, dir).last.files
    assert(before.count(after.contains) == 2,
      s"the two key-range-free files must survive by name: $before -> $after")
    val t = Snapshots.read(spark, dir)
    assert(t.count() == 997)
    assert(t.where($"id".isin(5L, 7L, 999L)).isEmpty)
    // no-match and empty frames are no-ops returning None
    assert(Snapshots.deleteKeys(spark, dir, "id", Seq(5000L).toDF("id")).isEmpty)
    assert(Snapshots.deleteKeys(spark, dir, "id",
      Seq.empty[Long].toDF("id")).isEmpty)
    assert(Snapshots.versions(spark, dir).last.version == 2)
    intercept[IllegalArgumentException](
      Snapshots.deleteKeys(spark, dir, "nope", keys))
  }

  test("deleteRange: TTL delete prunes candidates by footer bounds; NULLs and out-of-range kept") {
    val dir = freshDir()
    val rows = (1 to 100).map(i =>
      (i.toLong, if (i % 10 == 0) None else Some(i.toLong * 100))).toDF("id", "ts")
    Snapshots.writeAppend(rows.repartitionByRange(4, $"id"), dir)
    val before = Snapshots.versions(spark, dir).last.files
    // horizon: ts <= 2500 (ids 1..25 except the NULL-ts ones)
    val v = Snapshots.deleteRange(spark, dir, "ts", 0.0, 2500.0)
    assert(v.contains(2))
    val after = Snapshots.versions(spark, dir).last.files
    assert(before.count(after.contains) >= 2,
      s"files whose ts bounds miss the horizon must splice through: $after")
    val t = Snapshots.read(spark, dir)
    // deleted: ids 1..25 minus {10,20} (NULL ts kept) = 23 rows gone
    assert(t.count() == 77, s"count: ${t.count()}")
    assert(t.where($"ts".isNull).count() == 10, "NULL-ts rows are kept")
    assert(t.where($"ts" <= 2500).isEmpty)
    // a horizon past the data is a no-op
    assert(Snapshots.deleteRange(spark, dir, "ts", 1e9, 2e9).isEmpty)
  }

  test("applyChanges nets multi-commit batches: insert-then-delete lands absent, last version wins") {
    val src = freshDir(); val rep = freshDir()
    Snapshots.writeAppend(Seq((1L, "one"), (2L, "two")).toDF("id", "text"), src) // v1
    Snapshots.writeAppend(Seq((3L, "three")).toDF("id", "text"), src)            // v2
    Snapshots.upsert(Seq((2L, "TWO")).toDF("id", "text"), src, "id")             // v3
    Snapshots.deleteWhere(spark, src, $"id" === 3)                               // v4
    // ONE batch spanning v1..v4: 3 was inserted then deleted -> absent;
    // 2 was inserted then updated -> the v3 value
    Snapshots.applyChanges(Snapshots.changes(spark, src, 0), rep, "id")
    val got = Snapshots.read(spark, rep).as[(Long, String)].collect().toSet
    assert(got == Set(1L -> "one", 2L -> "TWO"), got.toString)
    // replays are value-idempotent
    Snapshots.applyChanges(Snapshots.changes(spark, src, 0), rep, "id")
    assert(Snapshots.read(spark, rep).as[(Long, String)].collect().toSet == got)
  }

  test("history + vacuumPreview: the operator surface tells the truth before vacuum acts") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      .repartition(2), dir)                                   // v1: 2 files
    Snapshots.compact(spark, dir, 512L * 1024 * 1024)         // v2: 1 file
    Snapshots.writeAppend(Seq((3L, "c")).toDF("id", "text"), dir) // v3
    val h = Snapshots.history(spark, dir)
      .as[(Int, String, Int, Long, Long, java.sql.Timestamp)].collect()
    assert(h.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, "append", 2), (2, "compact", 1), (3, "append", 2)), h.toSeq)
    assert(h.forall(_._4 > 0), "bytes accounted")
    // row counts from the logged per-file numRecords (r17): 2, 2, 3
    assert(h.map(_._5).toSeq == Seq(2L, 2L, 3L), h.toSeq)
    // and count(*) is pure metadata at every version
    assert(Snapshots.countRows(spark, dir, Some(1)).contains(2L))
    assert(Snapshots.countRows(spark, dir).contains(3L))
    // preview names exactly what vacuum then deletes — and nothing is
    // touched by the preview itself
    val pv = Snapshots.vacuumPreview(spark, dir, keepVersions = 1)
      .as[(Int, String, String)].collect().toSet
    val doomedData = pv.collect { case (_, "data", f) => f }
    assert(doomedData.size == 2 && pv.count(_._2 == "log") == 2, pv.toString)
    doomedData.foreach(f => assert(new java.io.File(dir, f).exists,
      "preview must not delete"))
    Snapshots.vacuum(spark, dir, keepVersions = 1)
    doomedData.foreach(f => assert(!new java.io.File(dir, f).exists,
      s"$f: preview promised deletion"))
    assert(Snapshots.versions(spark, dir).map(_.version) == Seq(3))
    assert(Snapshots.read(spark, dir).count() == 3)
  }

  test("zero-stat scan is a stock parquet scan: filters pushed, columns pruned, sizes logged") {
    val dir = freshDir()
    val rows = (1 to 1000).map(i => (i.toLong, s"doc $i", i % 7))
      .toDF("id", "text", "grp")
    Snapshots.writeAppend(rows.repartition(4), dir)
    val snap = Snapshots.versions(spark, dir).last
    assert(snap.sizes.isDefined && snap.sizes.get.forall(_ > 0),
      "every commit logs real file sizes")
    snap.dataFiles.foreach(f =>
      assert(new java.io.File(dir, f.name).length == f.size,
        s"${f.name}: logged ${f.size}"))
    val df = Snapshots.read(spark, dir).where($"id" === 5L)
      .select($"id", $"grp")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,5)"),
      s"predicate must reach the parquet scan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("text"),
      s"projection must prune the unselected column:\n$plan")
    assert(df.as[(Long, Int)].collect().toSeq == Seq(5L -> (5 % 7)))
  }

  test("commit numbering survives a competing manual commit (optimistic retry)") {
    val dir = freshDir()
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    Snapshots.writeAppend(docs, dir)
    // an external committer lands v2 directly in the log
    val log = new java.io.File(dir, "_graft_log")
    val v2 = new java.io.File(log, "v00002.json")
    java.nio.file.Files.writeString(v2.toPath,
      """{"version":2,"op":"append","files":[]}""")
    // next writeAppend must observe v2 and land v3, not clobber v2
    assert(Snapshots.writeAppend(docs.limit(5), dir) == 3)
    assert(Snapshots.versions(spark, dir).map(_.version) == Seq(1, 2, 3))
  }

  // ---- round 17: case-insensitive schema gate, queryId namespacing,
  //      atomic applyChanges, orphan-file vacuum ----

  test("schema gate resolves case-insensitively: 'ID' onto 'id' is the same column") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir)
    Snapshots.writeAppend(Seq((2L, "b")).toDF("ID", "text"), dir)
    // the merged schema has ONE column, the table's casing — a
    // case-variant duplicate would poison every later read
    val sch = Snapshots.versions(spark, dir).last.schema.get
    assert(sch.fieldNames.toSeq == Seq("id", "text"), sch.treeString)
    val t = Snapshots.read(spark, dir)
    assert(t.count() == 2)
    // the late file's physical 'ID' fills 'id' (Spark's own
    // case-insensitive parquet field resolution)
    assert(t.where($"id" === 2).as[(Long, String)].collect().toSeq ==
      Seq(2L -> "b"))
    // a case-variant TYPE conflict is still a commit-time conflict
    val e = intercept[IllegalArgumentException](
      Snapshots.writeAppend(Seq(("x", "c")).toDF("ID", "text"), dir))
    assert(e.getMessage.contains("type conflicts"), e.getMessage)
    // one frame carrying BOTH spellings can never read back — refused
    // at the write, even as a table's FIRST write
    val dup = Seq((1L, 2L, "x")).toDF("id", "ID", "text")
    val e2 = intercept[IllegalArgumentException](Snapshots.writeAppend(dup, dir))
    assert(e2.getMessage.contains("case-duplicate"), e2.getMessage)
    // a FIRST write is refused too — by Spark's own parquet writer
    // (COLUMN_ALREADY_EXISTS) before our commit-time gate even runs;
    // either door closing is fine, it must not commit
    val e3 = intercept[Exception](Snapshots.writeAppend(dup, freshDir()))
    assert(e3.getMessage.contains("case-duplicate") ||
      e3.getMessage.toLowerCase.contains("already exists"), e3.getMessage)
  }

  test("writeAppendBatch: queryId namespaces the exactly-once token per stream") {
    val dir = freshDir()
    val b = Seq((1L, "a")).toDF("id", "text")
    // two streams, each starting at batch 0, share one table: without
    // the namespace the second stream's batch 0 would be silently
    // skipped as a replay — data loss
    assert(Snapshots.writeAppendBatch(b, dir, 0L, Some("qA")).contains(1))
    assert(Snapshots.writeAppendBatch(b, dir, 0L, Some("qB")).contains(2))
    // replay within ONE stream still skips (id-exact)
    assert(Snapshots.writeAppendBatch(b, dir, 0L, Some("qA")).isEmpty)
    assert(Snapshots.writeAppendBatch(b, dir, 1L, Some("qA")).contains(3))
    // the un-namespaced token is not confused by namespaced ops
    assert(Snapshots.writeAppendBatch(b, dir, 0L).contains(4))
    assert(Snapshots.writeAppendBatch(b, dir, 0L).isEmpty)
    assert(Snapshots.read(spark, dir).count() == 4)
    assert(Snapshots.versions(spark, dir).map(_.op) == Seq(
      "append-batch-qA-0", "append-batch-qB-0", "append-batch-qA-1",
      "append-batch-0"))
  }

  test("applyChanges is ONE commit per batch; every replica version equals SOME source version") {
    val src = freshDir(); val rep = freshDir()
    Snapshots.writeAppend(Seq((1L, "one"), (2L, "two")).toDF("id", "text"), src) // s1
    Snapshots.upsert(Seq((2L, "TWO")).toDF("id", "text"), src, "id")             // s2
    Snapshots.deleteWhere(spark, src, $"id" === 1)                               // s3
    Snapshots.writeAppend(Seq((4L, "four")).toDF("id", "text"), src)             // s4
    // two multi-commit batches: (0,2] then (2,4]
    assert(Snapshots.applyChanges(
      Snapshots.changes(spark, src, 0, Some(2)), rep, "id",
      batchId = Some(0L)).contains(1))
    assert(Snapshots.applyChanges(
      Snapshots.changes(spark, src, 2, Some(4)), rep, "id",
      batchId = Some(1L)).contains(2))
    val repVs = Snapshots.versions(spark, rep)
    // exactly ONE replica version per applied batch — the old
    // deleteKeys+upsert pair produced intermediate states matching no
    // source version and two CDC entries per batch
    assert(repVs.map(_.op) == Seq("apply-batch-0", "apply-batch-1"),
      repVs.map(_.op).toString)
    def state(dir: String, v: Int) = Snapshots.read(spark, dir, Some(v))
      .as[(Long, String)].collect().toSet
    val srcStates = (1 to 4).map(v => state(src, v)).toSet
    repVs.foreach(rv => assert(srcStates.contains(state(rep, rv.version)),
      s"replica v${rv.version} = ${state(rep, rv.version)} matches no " +
        s"source version"))
    assert(state(rep, 2) == Set(2L -> "TWO", 4L -> "four"))
    // batch-id-exact replay: the replayed batch lands NOTHING
    assert(Snapshots.applyChanges(
      Snapshots.changes(spark, src, 2, Some(4)), rep, "id",
      batchId = Some(1L)).isEmpty)
    assert(Snapshots.versions(spark, rep).size == 2)
  }

  test("applyChanges queryId namespaces the batch token: a fresh-checkpoint restart still applies") {
    val src = freshDir(); val rep = freshDir()
    Snapshots.writeAppend(Seq((1L, "one")).toDF("id", "text"), src)
    Snapshots.writeAppend(Seq((2L, "two")).toDF("id", "text"), src)
    // incarnation A applies batch 0 (source v1)
    assert(Snapshots.applyChanges(Snapshots.changes(spark, src, 0, Some(1)),
      rep, "id", batchId = Some(0L), queryId = Some("incA")).isDefined)
    // the stream restarts with a FRESH checkpoint: batch ids reset to
    // 0 under a NEW queryId — the batch must APPLY, not silently skip
    // as incarnation A's replay (the regression the bare batch id had)
    assert(Snapshots.applyChanges(Snapshots.changes(spark, src, 1, Some(2)),
      rep, "id", batchId = Some(0L), queryId = Some("incB")).isDefined)
    assert(Snapshots.read(spark, rep).count() == 2)
    // replay within ONE incarnation still skips, id-exact
    assert(Snapshots.applyChanges(Snapshots.changes(spark, src, 1, Some(2)),
      rep, "id", batchId = Some(0L), queryId = Some("incB")).isEmpty)
    assert(Snapshots.versions(spark, rep).map(_.op) ==
      Seq("apply-batch-incA-0", "apply-batch-incB-0"))
  }

  test("vacuum sweeps aged ORPHAN data files (landed, never committed) and spares the rest") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir)
    val old = System.currentTimeMillis() - 2 * 3600 * 1000
    // an aged uuid-landed orphan — the lost-race / crash-between-land-
    // and-commit debris class
    val orphan = new java.io.File(dir, "deadbeef-00001.parquet")
    java.nio.file.Files.writeString(orphan.toPath, "junk")
    assert(orphan.setLastModified(old))
    // a YOUNG uuid-landed file: a concurrent writer mid-commit — spared
    val young = new java.io.File(dir, "cafebabe-00001.parquet")
    java.nio.file.Files.writeString(young.toPath, "junk")
    // an aged file with a FOREIGN name (adopted/imported shape) — never
    // touched by the orphan sweep
    val foreign = new java.io.File(dir, "part-woah.parquet")
    java.nio.file.Files.writeString(foreign.toPath, "junk")
    assert(foreign.setLastModified(old))
    Snapshots.vacuum(spark, dir, keepVersions = 1,
      strandedStagingMs = 3600 * 1000)
    assert(!orphan.exists, "aged orphan must be swept")
    assert(young.exists, "young landed file is a live commit in flight")
    assert(foreign.exists, "foreign names are not ours to sweep")
    // committed files are untouched
    assert(Snapshots.read(spark, dir).count() == 1)
  }

  test("versionAsOf monotonizes mtimes: a restored entry with a fresh mtime cannot resolve a LATER version early") {
    val dir = freshDir()
    Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "t"), dir) // v1
    Snapshots.writeAppend(Seq((2L, "b")).toDF("id", "t"), dir) // v2
    Snapshots.writeAppend(Seq((3L, "c")).toDF("id", "t"), dir) // v3
    val log = new java.io.File(dir, "_graft_log")
    val now = new java.io.File(log, "v00003.json").lastModified
    // v2's entry restored from backup: its mtime jumps into the future
    assert(new java.io.File(log, "v00002.json")
      .setLastModified(now + 3600 * 1000L))
    // a probe after v3's real commit time: under raw mtimes v2 is
    // "future" so max-over-qualifying would return 3 — but a
    // monotonized timeline says nothing past v1 is provably at-or-
    // before the probe (v2's effective stamp shadows v3's)
    assert(Snapshots.versionAsOf(spark, dir, now + 1000) == 1)
    // and a probe past the restored mtime sees the full timeline
    assert(Snapshots.versionAsOf(spark, dir, now + 2 * 3600 * 1000L) == 3)
  }
}
