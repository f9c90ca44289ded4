package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal SNAPSHOT LOG over a plain parquet directory — the one
  * piece of the lakehouse table formats (Iceberg/Delta) this library
  * actually needs, built from two primitives every filesystem has:
  * atomic single-file rename and immutable data files.
  *
  * Layout:
  * {{{
  *   dir/<uuid>-NNNNN.parquet        immutable data files (never reused)
  *   dir/_graft_log/v00001.json      snapshot 1: file list + op
  *   dir/_graft_log/v00002.json      snapshot 2: ...
  * }}}
  *
  * A snapshot is the complete RELATIVE file list of one table version;
  * the newest `vNNNNN.json` is the current table. Commits write a temp
  * file and publish it under the next version name through an
  * ATOMIC-EXCLUSIVE primitive — rename-without-overwrite where the
  * filesystem refuses an existing destination (HDFS, object stores),
  * hard-link creation on POSIX `file:` schemes (where rename would
  * silently REPLACE a concurrent winner's commit; link(2) is the
  * exclusive publication POSIX actually offers) — so two concurrent
  * committers cannot both land the same version: the loser re-reads
  * and retries against the next number (optimistic concurrency, the
  * Delta protocol's shape).
  *
  * What this buys at 100 TB:
  *  - readers pin a VERSION: a long analytics job reads one immutable
  *    file set while writers keep committing — no torn reads, ever;
  *  - [[compact]] becomes SAFE under concurrency: new bin-packed files
  *    land beside the old ones and a commit flips the pointer — the
  *    [[Layout.compact]] swap window (duplicates visible mid-swap,
  *    documented there) disappears because visibility is the log, not
  *    the directory listing;
  *  - time travel ([[read]] at an old version) and incremental
  *    processing ([[addedSince]]: only files NEW since a version) fall
  *    out for free;
  *  - [[vacuum]] deletes files no retained version references — space
  *    reclamation is decoupled from correctness.
  *
  * Row-level writes are COPY-ON-WRITE ([[deleteWhere]], [[upsert]]):
  * only files containing affected rows rewrite, the commit splices the
  * rest through by name.
  *
  * Hive-style partition directories are DELIBERATELY absent from this
  * log: clustering the data ([[optimizeZorder]]) plus footer-manifest
  * file skipping ([[prunedRead]]) subsumes what partitioning buys —
  * selective scans — without its failure modes (cardinality cliffs,
  * small files per partition, unskippable non-partition predicates,
  * repartitioning migrations). This is the direction the table formats
  * themselves are moving (clustering over partitioning); a workload
  * that truly needs physical partition boundaries uses the plain
  * [[Layout.compact]]/hive path outside the log.
  *
  * NOT implemented (and documented rather than faked): merge-on-read
  * deletion vectors, schema enforcement beyond the footer union, and
  * cross-table transactions — the full table formats exist for those.
  */
object Snapshots {

  private val LogDir = "_graft_log"
  private val VersionRe = "v(\\d{5})\\.json".r

  final case class Snapshot(version: Int, op: String, files: Seq[String])

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Parse one log entry. Hand-rolled JSON (the library's Verify.scala
    * discipline — no json dep): fields are a version int, an op token,
    * and a file array of uuid-safe names we wrote ourselves. */
  private def parseEntry(s: String): Snapshot = {
    def field(name: String): String = {
      val i = s.indexOf("\"" + name + "\"")
      require(i >= 0, s"snapshot log entry missing '$name': $s")
      s.drop(i + name.length + 2)
    }
    val v = field("version").dropWhile(c => c == ':' || c == ' ')
      .takeWhile(_.isDigit).toInt
    val op = field("op").dropWhile(c => c == ':' || c == ' ' || c == '"')
      .takeWhile(_ != '"')
    val arr = field("files")
    val body = arr.slice(arr.indexOf('[') + 1, arr.indexOf(']'))
    val files = body.split(',').map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
    Snapshot(v, op, files)
  }

  private def render(s: Snapshot): String =
    s"""{"version":${s.version},"op":"${s.op}","files":[""" +
      s.files.map(f => "\"" + f + "\"").mkString(",") + "]}"

  /** All committed snapshots, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Snapshot] = {
    val (fs, root) = fsOf(spark, dir)
    val log = new Path(root, LogDir)
    if (!fs.exists(log)) Seq.empty
    else fs.listStatus(log).toSeq
      .flatMap(st => st.getPath.getName match {
        case VersionRe(_) => Some(st.getPath)
        case _ => None
      })
      .map { p =>
        val in = fs.open(p)
        try parseEntry(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      }
      .sortBy(_.version)
  }

  /** The newest snapshot WITHOUT parsing history: version numbers live
    * in the file NAMES, so this is one directory listing + one entry
    * read. Commit cost therefore stays flat as the log grows — a
    * streaming ingest at 10^5 micro-batch commits would otherwise go
    * quadratic re-parsing every entry per commit (the reason Delta
    * checkpoints its log; at that scale a checkpoint entry is the next
    * step, documented not faked). Full-history parses ([[versions]])
    * remain where history is the point: time travel, changes, vacuum. */
  private def latest(spark: SparkSession, dir: String): Option[Snapshot] = {
    val (fs, root) = fsOf(spark, dir)
    val log = new Path(root, LogDir)
    if (!fs.exists(log)) None
    else {
      val named = fs.listStatus(log).toSeq.flatMap(st =>
        st.getPath.getName match {
          case VersionRe(n) => Some(n.toInt -> st.getPath)
          case _ => None
        })
      if (named.isEmpty) None
      else {
        val (_, p) = named.maxBy(_._1)
        val in = fs.open(p)
        try Some(parseEntry(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)))
        finally in.close()
      }
    }
  }

  /** Commit `files` (relative names) as the next version. Retries the
    * version number on rename collision — the optimistic-concurrency
    * loop. Returns the committed version. */
  private def commit(spark: SparkSession, dir: String, op: String,
                     files: Seq[String]): Int = {
    val (fs, root) = fsOf(spark, dir)
    val log = new Path(root, LogDir)
    fs.mkdirs(log)
    var attempt = 0
    while (attempt < 50) {
      val v = latest(spark, dir).map(_.version).getOrElse(0) + 1
      val tmp = new Path(log,
        s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, false)
      try out.write(render(Snapshot(v, op, files.sorted))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val dest = new Path(log, f"v$v%05d.json")
      // exclusive publication IS the commit: exactly one writer wins a
      // given version; the loser's temp is removed and it re-reads.
      // HDFS/object-store rename refuses an existing destination, but
      // POSIX rename REPLACES it — so on file: schemes the exclusivity
      // primitive is link(2) (hard-link creation is atomic-exclusive),
      // not rename. Without this, two local processes could both
      // "win" one version and silently clobber a commit.
      val won =
        if ("file" == fs.getScheme) {
          try {
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(dest.toUri.getPath),
              java.nio.file.Paths.get(tmp.toUri.getPath))
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        } else !fs.exists(dest) && fs.rename(tmp, dest)
      fs.delete(tmp, false) // the link published a second name; drop ours
      if (won) return v
      attempt += 1
    }
    throw new IllegalStateException(
      s"snapshot commit lost ${50} optimistic races under $dir$LogDir")
  }

  /** Land `df` as immutable data files beside the existing ones (no
    * commit yet); returns the new files' relative names. Files write to
    * a `_`-prefixed staging dir and rename in under fresh uuid names,
    * so a crash strands invisible garbage, never a half-landed file
    * ([[vacuum]] sweeps strays). */
  private def land(df: DataFrame, dir: String): Seq[String] = {
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, dir)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(root, s"_staging_$tag")
    df.write.mode("overwrite").parquet(staging.toString)
    val parts = fs.listStatus(staging).toSeq.filter(s => !s.isDirectory &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val names = parts.sortBy(_.getPath.getName).zipWithIndex.map {
      case (st, i) =>
        val name = f"$tag-$i%05d.parquet"
        require(fs.rename(st.getPath, new Path(root, name)),
          s"rename failed: ${st.getPath}")
        name
    }
    fs.delete(staging, true)
    names
  }

  /** ADOPT an existing plain-parquet directory as version 1 — the
    * migration path onto the log: no byte is rewritten, the commit just
    * names the data files already there (hive subdir layouts adopt
    * recursively by relative path). Fails if the table already has a
    * log (adoption is a bootstrap, not a merge). After adoption every
    * reader/writer goes through the log; the one caveat is inherited
    * names — adopted files were not uuid-landed, so the PRE-ADOPTION
    * writer must stop before the import (its next overwrite would
    * collide with names the log now owns). */
  def importDir(spark: SparkSession, dir: String): Int = {
    val (fs, root) = fsOf(spark, dir)
    require(versions(spark, dir).isEmpty,
      s"importDir: $dir already has a snapshot log")
    val rel = listDataFiles(fs, root, root)
    require(rel.nonEmpty, s"importDir: no data files under $dir")
    commit(spark, dir, "import", rel)
  }

  private def listDataFiles(fs: FileSystem, root: Path,
                            dir: Path): Seq[String] = {
    // listStatus returns scheme-qualified paths; relativize against the
    // equally-qualified root or the prefix never strips
    val base = fs.makeQualified(root).toString
    fs.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Nil
      else if (st.isDirectory) listDataFiles(fs, root, st.getPath)
      else Seq(fs.makeQualified(st.getPath).toString.stripPrefix(base)
        .stripPrefix("/"))
    }
  }

  /** RESTORE the table to `version` — undo without losing history: a
    * NEW commit whose file list is the old version's, so the rollback
    * is itself versioned (re-restore to un-restore), pinned readers are
    * untouched, and [[changes]] reports it as the delete+insert diff it
    * logically is (the default exceptAll branch — restore introduces no
    * special case). Files must still be within the [[vacuum]] horizon. */
  def restore(spark: SparkSession, dir: String, version: Int): Int = {
    val target = resolve(spark, dir, Some(version))
    commit(spark, dir, "restore", target.files)
  }

  /** Append `df` to the table: land new files, commit = previous file
    * list + the new ones. Returns the committed version. */
  def writeAppend(df: DataFrame, dir: String): Int = {
    val spark = df.sparkSession
    val prev = latest(spark, dir).map(_.files).getOrElse(Seq.empty)
    commit(spark, dir, "append", prev ++ land(df, dir))
  }

  /** IDEMPOTENT append for streaming `foreachBatch` — the exactly-once
    * device every log-structured streaming sink uses: the batch id is
    * recorded in the committed entry (`op = "append-batch-N"`), and a
    * REPLAYED batch (Structured Streaming re-runs the last batch after
    * a crash, same id) sees its id already in the log and lands
    * nothing. Visibility is the commit, so a downstream [[addedSince]]
    * consumer never reads a half-written micro-batch — the parquet
    * `_spark_metadata` contract, but shared with every batch reader of
    * the same table. Returns the committed version, or None for a
    * replay skip. */
  def writeAppendBatch(df: DataFrame, dir: String,
                       batchId: Long): Option[Int] = {
    val spark = df.sparkSession
    val op = s"append-batch-$batchId"
    // replay check without a full history parse: Structured Streaming
    // replays the LATEST uncommitted batch, so the newest entry decides
    // the common case in O(1); only a batch id at-or-below the newest
    // committed one (recovery from an old checkpoint) pays the full
    // scan to confirm
    val newestBatch = latest(spark, dir).map(_.op).collect {
      case o if o.startsWith("append-batch-") =>
        o.stripPrefix("append-batch-").toLong
    }
    // careful: a maintenance commit (compact/zorder) may sit on top of
    // the replayed batch — only a NEWER batch id on the newest entry
    // proves non-replay; anything else confirms against full history
    val replayed = newestBatch match {
      case Some(n) if batchId > n => false
      case _ => versions(spark, dir).exists(_.op == op)
    }
    if (replayed) None
    else {
      val prev = latest(spark, dir).map(_.files).getOrElse(Seq.empty)
      Some(commit(spark, dir, op, prev ++ land(df, dir)))
    }
  }

  /** Replace the table contents: land new files, commit = only them.
    * Old files stay on disk — every prior version remains readable
    * until [[vacuum]]. Returns the committed version. */
  def writeOverwrite(df: DataFrame, dir: String): Int = {
    val spark = df.sparkSession
    commit(spark, dir, "overwrite", land(df, dir))
  }

  /** Read the table at `version` (default: latest). The file list is
    * immutable, so the scan is stable no matter what commits land while
    * the job runs. An empty table (no snapshots) is an error — there is
    * no schema to synthesize. */
  def read(spark: SparkSession, dir: String,
           version: Option[Int] = None): DataFrame =
    readFiles(spark, dir, resolve(spark, dir, version).files)

  /** Snapshot scans read with `mergeSchema` — a version whose appends
    * widened the schema (the q221 multi-year-corpus reality) comes back
    * as the footer UNION with NULLs in pre-widening files. Cost is one
    * distributed footer pass at plan time (the statsManifest price,
    * zero data pages); a table format that must avoid even that keeps
    * the schema in its log, which is the documented line this minimal
    * log does not cross. */
  private def readFiles(spark: SparkSession, dir: String,
                        files: Seq[String]): DataFrame = {
    require(files.nonEmpty, s"snapshot under $dir has no files")
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$dir/$f"): _*)
  }

  /** Rows in files COMMITTED AFTER `sinceVersion` — the incremental-
    * processing scan: a nightly job remembers the version it processed
    * and reads only what landed since, never rescanning the table.
    * Exact for append-only tables (files are immutable, so new rows
    * live only in new files); after an overwrite the added files are
    * rewritten history, not deltas — callers gate on [[versions]]' ops
    * when that distinction matters. Empty delta → empty frame with the
    * table schema. */
  def addedSince(spark: SparkSession, dir: String,
                 sinceVersion: Int): DataFrame = {
    val all = versions(spark, dir)
    require(all.nonEmpty, s"no snapshots under $dir/$LogDir")
    val base: Set[String] = all.find(_.version == sinceVersion)
      .getOrElse(throw new IllegalArgumentException(
        s"version $sinceVersion not in ${all.map(_.version).mkString(",")}"))
      .files.toSet
    val fresh = all.last.files.filterNot(base)
    if (fresh.isEmpty) read(spark, dir).where(lit(false))
    else readFiles(spark, dir, fresh)
  }

  /** Snapshot-isolated compaction: bin-pack the CURRENT snapshot into
    * ⌈bytes/targetBytes⌉ files (the [[Layout.compact]] coalesce, same
    * math) and commit the new list. No old file is touched, so readers
    * of any version — including one scanning mid-compaction — see
    * exactly their snapshot; the directory-swap duplicate window
    * documented on [[Layout.compact]] does not exist here. No-op
    * (returns None) when already at the bin count. */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long): Option[Int] = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val snap = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no snapshots under $dir"))
    val (fs, root) = fsOf(spark, dir)
    val bytes = snap.files.map(f => fs.getFileStatus(new Path(root, f)).getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (snap.files.size <= n) None
    else {
      val packed = readFiles(spark, dir, snap.files).coalesce(n)
      Some(commit(spark, dir, "compact", land(packed, dir)))
    }
  }

  /** CHANGE DATA FEED between versions — what a downstream index,
    * card, or replica needs to stay in sync without rescanning the
    * table: every commit in `(sinceVersion, latest]` contributes its
    * logical row changes, tagged `_change_type` (insert | delete) and
    * `_commit_version`. Op-aware and bounded to TOUCHED files:
    *
    *  - `append` / `append-batch-*`: the added files' rows are inserts
    *    — no comparison at all;
    *  - `delete` / `upsert` / `overwrite`: deletes = removed-files rows
    *    `exceptAll` added-files rows, inserts = the reverse — an
    *    updated row shows as delete(old) + insert(new), unchanged rows
    *    rewritten into new files cancel exactly. The exceptAll shuffles
    *    only the touched files' rows — the honest cost of row-level CDC
    *    without per-row tracking (Delta writes CDF sidecars to avoid
    *    it; documented line, not crossed);
    *  - `compact` / `zorder`: skipped — layout rewrites change no rows,
    *    and skipping saves the provably-cancelling comparison.
    *
    * Order within one commit's change set is not meaningful (it is a
    * set); commits are distinguished by `_commit_version`. Retention:
    * the feed reads the REMOVED files of CoW commits, so the cursor
    * must stay within the [[vacuum]] horizon — the same contract as
    * pinned readers. */
  def changes(spark: SparkSession, dir: String,
              sinceVersion: Int): DataFrame = {
    val all = versions(spark, dir)
    require(sinceVersion == 0 || all.exists(_.version == sinceVersion),
      s"version $sinceVersion not in ${all.map(_.version).mkString(",")} " +
        "(0 = from the beginning)")
    // a virtual empty predecessor makes the first commit a plain insert
    val chain = Snapshot(0, "append", Seq.empty) +: all
    val pairs = chain.sliding(2).collect {
      case Seq(prev, cur) if cur.version > sinceVersion => (prev, cur)
    }.toSeq
    val schema = read(spark, dir)
    val none = schema.where(lit(false))
      .withColumn("_change_type", lit(""))
      .withColumn("_commit_version", lit(0))
    val parts = pairs.flatMap { case (prev, cur) =>
      def tag(df: DataFrame, t: String) = df
        .withColumn("_change_type", lit(t))
        .withColumn("_commit_version", lit(cur.version))
      val added = cur.files.filterNot(prev.files.toSet)
      val removed = prev.files.filterNot(cur.files.toSet)
      cur.op match {
        // import bootstraps v1: pure inserts, no comparison to pay
        case op if op.startsWith("append") || op == "import" =>
          if (added.isEmpty) Nil
          else Seq(tag(readFiles(spark, dir, added), "insert"))
        case "compact" | "zorder" => Nil
        case _ => // delete / upsert / overwrite: the exceptAll algebra
          val a = if (added.isEmpty) schema.where(lit(false))
            else readFiles(spark, dir, added)
          val r = if (removed.isEmpty) schema.where(lit(false))
            else readFiles(spark, dir, removed)
          Seq(tag(r.exceptAll(a), "delete"), tag(a.exceptAll(r), "insert"))
      }
    }
    // allowMissingColumns: commits before a schema widening union with
    // NULLs in the late columns (within ONE delete/upsert/overwrite
    // commit the exceptAll still needs both sides on one schema — CDC
    // across a widening rewrite is the caller's planning problem)
    parts.foldLeft(none)(_.unionByName(_, allowMissingColumns = true))
  }

  /** Copy-on-write `DELETE WHERE` — the Delta/Iceberg CoW shape: find
    * the files that CONTAIN matching rows (one predicate scan collecting
    * `input_file_name`, driver state = file names), rewrite ONLY those
    * files without the matches, commit = untouched files + rewrites.
    * A predicate touching 1% of files rewrites 1% of the table; the
    * rest of the commit is pointer arithmetic. NULL predicate rows are
    * KEPT (`DELETE WHERE cond` removes rows where cond is TRUE — SQL
    * semantics). Returns None when nothing matches (no empty commit).
    *
    * Right-to-be-forgotten note: prior VERSIONS still hold the rows
    * until [[vacuum]] passes the retention horizon — physical removal
    * is `deleteWhere` + `vacuum`, and the two-step is deliberate
    * (readers pinned to old versions must not lose files mid-scan). */
  def deleteWhere(spark: SparkSession, dir: String,
                  cond: org.apache.spark.sql.Column): Option[Int] = {
    val snap = resolve(spark, dir, None)
    val cur = readFiles(spark, dir, snap.files)
    val touchedAbs = cur.where(cond)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    if (touchedAbs.isEmpty) None
    else {
      val touched = snap.files.filter(f =>
        touchedAbs.exists(a => a.endsWith("/" + f)))
      val untouched = snap.files.filterNot(touched.toSet)
      val rewritten = readFiles(spark, dir, touched)
        .where(!coalesce(cond, lit(false)))
      Some(commit(spark, dir, "delete", untouched ++ land(rewritten, dir)))
    }
  }

  /** Copy-on-write UPSERT by key — the MERGE "update or insert" case:
    * files holding a matching key are rewritten without those rows (the
    * [[deleteWhere]] mechanics, keyed by a semi-join instead of a
    * predicate), then the updates land as fresh files; one commit flips
    * both. Update batches are usually small, so Spark's own broadcast
    * threshold handles the join side; the table never shuffles — only
    * touched files are re-read. Duplicate keys in `updates` land as-is
    * (the caller owns key uniqueness); NULL keys never match an
    * existing row and simply insert. */
  def upsert(updates: DataFrame, dir: String, keyCol: String): Int = {
    val spark = updates.sparkSession
    require(updates.columns.contains(keyCol),
      s"upsert: key column '$keyCol' not in updates " +
        s"(has: ${updates.columns.sorted.mkString(", ")})")
    val snap = resolve(spark, dir, None)
    val cur = readFiles(spark, dir, snap.files)
    val keys = updates.select(col(keyCol)).distinct()
    // input_file_name binds to ONE source: project it below the join
    val touchedAbs = cur.select(col(keyCol), input_file_name().as("__f"))
      .join(keys, Seq(keyCol), "left_semi")
      .select(col("__f")).distinct()
      .collect().map(_.getString(0)).toSet
    val touched = snap.files.filter(f =>
      touchedAbs.exists(a => a.endsWith("/" + f)))
    val untouched = snap.files.filterNot(touched.toSet)
    val survivors =
      if (touched.isEmpty) Seq.empty
      else land(readFiles(spark, dir, touched)
        .join(keys, Seq(keyCol), "left_anti"), dir)
    commit(spark, dir, "upsert", untouched ++ survivors ++ land(updates, dir))
  }

  /** Footer-stats manifest OF ONE SNAPSHOT ([[Layout.statsManifestFiles]]
    * over the version's file list) — the Iceberg scan shape: pruning
    * decisions bind to the immutable snapshot, not to whatever the
    * directory holds when the scan finally runs. */
  def manifest(spark: SparkSession, dir: String,
               columns: Seq[String] = Nil,
               version: Option[Int] = None): DataFrame = {
    val snap = resolve(spark, dir, version)
    Layout.statsManifestFiles(spark, snap.files.map(f => s"$dir/$f"), columns)
  }

  /** Snapshot-pinned file-skipping scan: only the version's files whose
    * footer bounds may hold `column ∈ [lo, hi]` are opened
    * ([[Layout.pruneFiles]] semantics — missing stats keep a file, the
    * caller re-applies the predicate). After [[optimizeZorder]] this is
    * the full lakehouse read path: log → manifest → skip → scan. */
  def prunedRead(spark: SparkSession, dir: String, column: String,
                 lo: Double, hi: Double,
                 version: Option[Int] = None): DataFrame = {
    val snap = resolve(spark, dir, version)
    val files = Layout.pruneFiles(
      Layout.statsManifestFiles(spark, snap.files.map(f => s"$dir/$f"),
        Seq(column)), column, lo, hi)
    if (files.isEmpty) readFiles(spark, dir, snap.files).where(lit(false))
    else spark.read.parquet(files: _*)
  }

  private def resolve(spark: SparkSession, dir: String,
                      version: Option[Int]): Snapshot = {
    val all = versions(spark, dir)
    require(all.nonEmpty, s"no snapshots under $dir/$LogDir")
    version match {
      case Some(v) => all.find(_.version == v).getOrElse(
        throw new IllegalArgumentException(
          s"version $v not in ${all.map(_.version).mkString(",")}"))
      case None => all.last
    }
  }

  /** `OPTIMIZE ZORDER BY (xCol, yCol)` — the full lakehouse maintenance
    * command: rewrite the current snapshot in Z-order
    * ([[Layout.zorderFrame]]: one min/max agg + one range shuffle) into
    * `⌈bytes/targetBytes⌉` files and commit the new list. Combines the
    * two halves this module and [[Layout]] each prove separately:
    * multi-column file skipping from the layout, reader isolation from
    * the log — a long scan started before the rewrite still reads its
    * own snapshot. Runs even when the file count is already at the bin
    * target (unlike [[compact]]) because the point is the ORDER, not
    * the count. */
  def optimizeZorder(spark: SparkSession, dir: String, xCol: String,
                     yCol: String, targetBytes: Long, bits: Int = 16): Int =
    optimizeZorderN(spark, dir, Seq(xCol, yCol), targetBytes, bits)

  /** N-column [[optimizeZorder]] ([[Layout.zorderFrameN]]: n · bits ≤
    * 63; 2-3 columns is the practical guidance). */
  def optimizeZorderN(spark: SparkSession, dir: String, cols: Seq[String],
                      targetBytes: Long, bits: Int = 16): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val snap = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no snapshots under $dir"))
    val (fs, root) = fsOf(spark, dir)
    val bytes = snap.files.map(f => fs.getFileStatus(new Path(root, f)).getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val framed = Layout.zorderFrameN(readFiles(spark, dir, snap.files),
      cols, n, bits)
    commit(spark, dir, "zorder", land(framed, dir))
  }

  /** The periodic maintenance pass a streaming ingest schedules every N
    * batches: bin-pack the current snapshot ([[compact]]), then reclaim
    * space past the retention horizon ([[vacuum]]). Retention must stay
    * deep enough that no reader pins a vacuumed version — the
    * documented operational contract (table formats enforce it with
    * timestamps; here it is the `keepVersions` knob). */
  def maintain(spark: SparkSession, dir: String, targetBytes: Long,
               keepVersions: Int = 10): Option[Int] = {
    val v = compact(spark, dir, targetBytes)
    vacuum(spark, dir, keepVersions)
    v
  }

  /** Delete data files referenced by NO retained version, then drop the
    * expired log entries; also sweeps stranded `_staging_*` dirs. Keeps
    * the newest `keepVersions` snapshots (≥ 1). Time travel reaches
    * only retained versions afterwards — vacuum is the explicit point
    * where history is given up for space. */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int = 1,
             strandedStagingMs: Long = 24L * 3600 * 1000): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1: $keepVersions")
    val all = versions(spark, dir)
    if (all.isEmpty) return
    val (fs, root) = fsOf(spark, dir)
    val keep = all.takeRight(keepVersions)
    val live = keep.flatMap(_.files).toSet
    all.dropRight(keepVersions).foreach { s =>
      s.files.filterNot(live).foreach(f =>
        fs.delete(new Path(root, f), false))
      fs.delete(new Path(new Path(root, LogDir), f"v${s.version}%05d.json"),
        false)
    }
    // sweep only staging dirs OLD enough to be crash debris — a
    // concurrent writer's seconds-old staging dir must not be yanked
    // out from under its landing renames (the age guard is the same
    // device every table format's orphan-file cleanup uses)
    val cutoff = System.currentTimeMillis() - strandedStagingMs
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("_staging_") &&
        st.getModificationTime < cutoff)
      .foreach(st => fs.delete(st.getPath, true))
  }
}
