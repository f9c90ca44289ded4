package graft.tools

import graft.GraftSession
import graft.sinks.Snapshots
import org.apache.spark.sql.SparkSession

/** Dev tool: measured evidence for the snapshot log's two operational
  * claims (SURVEY §6.1 rows; re-run to reproduce).
  *
  *   sbt "runMain graft.tools.SnapBench writers"   # concurrent commit throughput
  *   sbt "runMain graft.tools.SnapBench polls"     # addedSince vs log length
  *
  * `writers`: the same append workload (16 one-row commits) run by ONE
  * thread, then by FOUR concurrent threads (4 × 4), on fresh tables.
  * Asserts zero lost deltas (every landed file referenced by the final
  * version — the r16 rebase guarantee) and prints both wall clocks.
  * Commits SERIALIZE on the version sequence by design (optimistic
  * exclusive publication), so the expected result is aggregate
  * throughput ≥ the single-writer rate — the data landing overlaps,
  * the pointer flip does not — with no correctness cliff.
  *
  * `polls`: builds tables of 25 and 200 commits and times
  * `addedSince(latest-1)` plan construction + count on each. Entries
  * are full-state checkpoints addressed by NAME, so the poll does two
  * entry reads regardless of history length — the printed times should
  * be flat in commit count (the 10^5-micro-batch ingest poll shape). */
object SnapBench {
  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_snapbench").toString
    new java.io.File(d).delete(); d
  }

  private def frame(spark: SparkSession, i: Int) = {
    import spark.implicits._
    Seq((i.toLong, s"row $i")).toDF("id", "text")
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "writers"
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save() // warm codegen
    mode match {
      case "writers" => writers(spark)
      case "polls" => polls(spark)
      case "clusup" => clusup(spark, args(1))
      case "schemaread" => schemaread(spark)
      case other => System.err.println(s"unknown mode: $other")
    }
    spark.stop()
  }

  /** `clusup <sfDir>`: the SAME fixed 100-key update batch upserted
    * into the documents corpus twice — once key-CLUSTERED
    * (optimizeZorderN on doc_id), once hash-spread — at whatever scale
    * `sfDir` holds (sf0.1, /tmp/scale_x10, /tmp/scale_x100). With
    * manifest-pruned touched-file search + range clustering, the
    * clustered upsert's scan AND rewrite are bounded by the key range
    * (flat across scales); the spread layout pays the corpus-wide
    * worst case q240 documents. Prints seconds + files rewritten. */
  private def clusup(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lo = docs.agg(min(col("doc_id"))).head().getLong(0)
    val updates = docs.where(col("doc_id") < lo + 100)
      .withColumn("n_chars", col("n_chars") + 1)
    def run(cluster: Boolean): (Double, Int, Int) = {
      val dir = freshDir()
      Snapshots.writeOverwrite(docs.repartition(32, col("doc_id")), dir)
      if (cluster)
        Snapshots.optimizeZorderN(spark, dir, Seq("doc_id"), 4L * 1024 * 1024)
      val before = Snapshots.versions(spark, dir).last
      val t0 = System.nanoTime()
      Snapshots.upsert(updates, dir, "doc_id")
      val sec = (System.nanoTime() - t0) / 1e9
      val after = Snapshots.versions(spark, dir).last
      val rewritten = before.files.count(f => !after.files.contains(f))
      (sec, rewritten, before.files.size)
    }
    run(cluster = true); run(cluster = false) // discard: codegen/IO warmup
    val (cSec, cRew, cTot) = run(cluster = true)
    val (sSec, sRew, sTot) = run(cluster = false)
    println(f"""{"metric":"clustered_upsert","sf_dir":"$sfDir","clustered_sec":$cSec%.2f,"clustered_files_rewritten":$cRew,"clustered_files_total":$cTot,"spread_sec":$sSec%.2f,"spread_files_rewritten":$sRew,"spread_files_total":$sTot}""")
  }

  /** `schemaread`: what logging the schema buys at PLAN time — a
    * 256-file table read through the logged schema (r19 reads) vs the
    * legacy footer-union path (schema stripped from the entry, the
    * pre-r19 `mergeSchema` read). The gap is the distributed
    * footer-merge job the log eliminates; it grows with file count, so
    * at 10^5-file estates it is the difference between a metadata read
    * and a cluster job per plan. */
  private def schemaread(spark: SparkSession): Unit = {
    import spark.implicits._
    val dir = freshDir()
    val rows = (1 to 4096).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    Snapshots.writeAppend(rows.repartition(256), dir)
    // time PLAN construction only — `spark.read.parquet` resolves the
    // schema eagerly, so this isolates exactly the metadata cost the
    // logged schema removes (the scan itself is identical both ways)
    def timePlan(): Double = {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        require(Snapshots.read(spark, dir).schema.fieldNames.length == 2)
        (System.nanoTime() - t0) / 1e9
      }
      times.sorted.apply(2)
    }
    Snapshots.read(spark, dir).count() // warm
    val zeroStat = timePlan() // schema + sizes logged: no FS call at all
    val entry = Snapshots.versions(spark, dir).head
    val log = new java.io.File(dir, "_graft_log")
    def rewrite(keepSchema: Boolean): Unit = {
      val schemaPart =
        if (keepSchema) s""","schema":${entry.schema.get.json}""" else ""
      java.nio.file.Files.writeString(
        new java.io.File(log, "v00001.json").toPath,
        s"""{"version":1,"op":"append","files":[""" +
          entry.files.map(f => "\"" + f + "\"").mkString(",") +
          "]" + schemaPart + "}")
    }
    // strip sizes only: explicit-schema read, one getFileStatus per file
    rewrite(keepSchema = true)
    Snapshots.read(spark, dir).count() // warm
    val statted = timePlan()
    // strip both: the pre-r19 footer-union path
    rewrite(keepSchema = false)
    Snapshots.read(spark, dir).count() // warm
    val merged = timePlan()
    println(f"""{"metric":"schema_from_log_plan","files":256,"zero_stat_sec":$zeroStat%.3f,"per_file_stat_sec":$statted%.3f,"footer_union_sec":$merged%.3f,"speedup_vs_footer":${merged / zeroStat}%.2f,"speedup_vs_stat":${statted / zeroStat}%.2f}""")
  }

  private def writers(spark: SparkSession): Unit = {
    // single-writer baseline: 16 sequential appends
    val seqDir = freshDir()
    Snapshots.writeAppend(frame(spark, 0), seqDir)
    val t0 = System.nanoTime()
    (1 to 16).foreach(i => Snapshots.writeAppend(frame(spark, i), seqDir))
    val seqSec = (System.nanoTime() - t0) / 1e9
    // four concurrent writers, 4 appends each
    val conDir = freshDir()
    Snapshots.writeAppend(frame(spark, 0), conDir)
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    val errs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    val t1 = System.nanoTime()
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        try {
          barrier.await()
          (1 to 4).foreach(i => Snapshots.writeAppend(
            frame(spark, w * 100 + i), conDir))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(600000))
    val conSec = (System.nanoTime() - t1) / 1e9
    require(errs.isEmpty, errs.toString)
    val vs = Snapshots.versions(spark, conDir)
    require(vs.map(_.version) == (1 to 17), s"versions: ${vs.map(_.version)}")
    val finalFiles = vs.last.files.toSet
    vs.foreach(v => require(v.files.toSet.subsetOf(finalFiles),
      s"lost delta at v${v.version}"))
    val rows = Snapshots.read(spark, conDir).count()
    require(rows == 17, s"expected 17 rows, got $rows")
    println(f"""{"metric":"snapshot_commit_throughput","sequential_16_sec":$seqSec%.2f,"concurrent_4x4_sec":$conSec%.2f,"seq_commits_per_sec":${16 / seqSec}%.2f,"con_commits_per_sec":${16 / conSec}%.2f,"lost_deltas":0}""")
  }

  private def polls(spark: SparkSession): Unit = {
    def build(commits: Int): String = {
      val dir = freshDir()
      (1 to commits).foreach(i => Snapshots.writeAppend(frame(spark, i), dir))
      dir
    }
    def poll(dir: String, commits: Int): Double = {
      // warm once, then median of 5
      Snapshots.addedSince(spark, dir, commits - 1).count()
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val n = Snapshots.addedSince(spark, dir, commits - 1).count()
        require(n == 1, s"delta rows: $n")
        (System.nanoTime() - t0) / 1e9
      }
      times.sorted.apply(2)
    }
    val d25 = build(25)
    val d200 = build(200)
    val p25 = poll(d25, 25)
    val p200 = poll(d200, 200)
    println(f"""{"metric":"addedSince_poll_sec","commits_25":$p25%.3f,"commits_200":$p200%.3f,"ratio_200_over_25":${p200 / p25}%.2f}""")
  }
}
