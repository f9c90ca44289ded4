package graft.sinks

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.sinks.Snapshots.{NumStat, StrStat}

/** Round 17: DATA SKIPPING from logged bounds — every filtered
  * snapshot scan (Scala API and SQL catalog) prunes files by
  * predicate with no explicit prunedRead call. The unit half pins the
  * [[StatsPruning.mayMatch]] evaluator's soundness table; the
  * behavioral half PROVES files are skipped by renaming the excluded
  * ones away and scanning anyway. */
class StatsPruningSpec extends SparkSpec {
  import spark.implicits._

  private val id = AttributeReference("id", LongType)()
  private val key = AttributeReference("key", StringType)()
  private def s(v: String) = Literal(UTF8String.fromString(v), StringType)
  private val st = Snapshots.FileStats(rows = 100, cols = Map(
    "id" -> NumStat(100, 199, nulls = Some(0)),
    "key" -> StrStat("doc-100", "doc-199", nulls = Some(3))))

  test("mayMatch: the pruning truth table, numeric + string + prefix") {
    def may(e: Expression) = StatsPruning.mayMatch(st, e)
    // equality
    assert(may(EqualTo(id, Literal(150L))))
    assert(!may(EqualTo(id, Literal(50L))))
    assert(!may(EqualTo(Literal(250L), id)))
    assert(may(EqualTo(key, s("doc-150"))) && !may(EqualTo(key, s("doc-250"))))
    // ranges, both orientations. NUMERIC strict tests deliberately
    // keep the boundary file (double-rounding soundness past 2^53):
    // id < 100 KEEPS a min=100 file, id < 99 prunes it
    assert(may(LessThan(id, Literal(100L))) && !may(LessThan(id, Literal(99L))))
    assert(may(LessThanOrEqual(id, Literal(100L))) &&
      !may(LessThanOrEqual(id, Literal(99L))))
    assert(may(GreaterThan(id, Literal(199L))) && !may(GreaterThan(id, Literal(200L))))
    assert(may(GreaterThanOrEqual(id, Literal(199L))) &&
      !may(GreaterThanOrEqual(id, Literal(200L))))
    assert(!may(GreaterThan(Literal(99L), id))) // 99 > id == id < 99
    assert(may(LessThan(Literal(150L), id)))    // 150 < id == id > 150
    // STRING strict tests stay exact (no rounding regime)
    assert(!may(LessThan(key, s("doc-100"))) &&
      may(LessThanOrEqual(key, s("doc-100"))))
    // boolean algebra: And prunes on either side, Or needs both
    assert(!may(And(EqualTo(id, Literal(150L)), EqualTo(id, Literal(50L)))))
    assert(may(Or(EqualTo(id, Literal(50L)), EqualTo(id, Literal(150L)))))
    assert(!may(Or(EqualTo(id, Literal(50L)), EqualTo(id, Literal(250L)))))
    // IN: any member in range keeps
    assert(may(In(id, Seq(Literal(1L), Literal(150L)))))
    assert(!may(In(id, Seq(Literal(1L), Literal(2L)))))
    // prefix scans
    assert(may(StartsWith(key, s("doc-1"))))
    assert(!may(StartsWith(key, s("doc-2"))))
    assert(!may(StartsWith(key, s("a"))))
    // null-count pruning (r17): zero-null column can't be IS NULL;
    // a column WITH nulls keeps both
    assert(!may(IsNull(id)) && may(IsNotNull(id)))
    assert(may(IsNull(key)) && may(IsNotNull(key)))
    // all-NULL column: IS NOT NULL and every comparison prune,
    // IS NULL keeps
    val allNull = Snapshots.FileStats(rows = 10, cols = Map(
      "id" -> Snapshots.NullStat(10)))
    def mayAN(e: Expression) = StatsPruning.mayMatch(allNull, e)
    assert(mayAN(IsNull(id)) && !mayAN(IsNotNull(id)))
    assert(!mayAN(EqualTo(id, Literal(5L))) && !mayAN(LessThan(id, Literal(5L))))
    // unknown null counts / unknown rows keep (never 0-by-default)
    val noNulls = Snapshots.FileStats(rows = -1, cols = Map(
      "id" -> NumStat(0, 9)))
    assert(StatsPruning.mayMatch(noNulls, IsNull(id)) &&
      StatsPruning.mayMatch(noNulls, IsNotNull(id)))
    // double-rounding soundness past 2^53: the exact long predicate
    // id < 2^53+1 is satisfied by id=2^53, but the literal rounds to
    // 2^53.0 — the relaxed strict test must KEEP the file
    val big = Snapshots.FileStats(rows = 10, cols = Map(
      "id" -> NumStat(9007199254740992.0, 9007199254740992.0)))
    assert(StatsPruning.mayMatch(big,
      LessThan(id, Literal(9007199254740993L))))
    assert(StatsPruning.mayMatch(big,
      GreaterThan(id, Literal(9007199254740991L))))
    // soundness: unknown shapes/columns/kinds KEEP
    assert(may(Not(EqualTo(id, Literal(150L)))))
    assert(may(EqualTo(AttributeReference("other", LongType)(), Literal(1L))))
    assert(may(EqualTo(id, s("xyz")))) // kind mismatch: keep
    assert(may(EqualTo(key, s("emoji 😀")))) // non-BMP literal: keep
    assert(may(EqualTo(id, Literal(Double.NaN)))) // NaN ordering: keep
    assert(StatsPruning.mayMatch(Snapshots.FileStats.empty, EqualTo(id, Literal(1L))))
    // case-insensitive column resolution (Spark default)
    assert(!StatsPruning.mayMatch(st,
      EqualTo(AttributeReference("ID", LongType)(), Literal(5L))))
  }

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_skip").toString
    new java.io.File(d).delete()
    d
  }

  /** Rename every file EXCEPT `keep` out of the table root; run `body`;
    * restore. A scan that touches a hidden file dies — so a green body
    * PROVES the skip. */
  private def withOnly(dir: String, keep: Set[String])(body: => Unit): Unit = {
    val hidden = java.nio.file.Files.createTempDirectory("graft_hide").toFile
    val moved = new java.io.File(dir).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !keep(f.getName))
    moved.foreach(f => assert(f.renameTo(new java.io.File(hidden, f.getName))))
    try body
    finally moved.foreach(f =>
      assert(new java.io.File(hidden, f.getName).renameTo(f)))
  }

  test("filtered Scala-API scan SKIPS excluded files (proven by hiding them)") {
    val dir = freshDir()
    Snapshots.writeOverwrite(
      (0 until 400).map(i => (i.toLong, f"doc-$i%05d", s"body $i"))
        .toDF("id", "key", "text").repartitionByRange(8, $"id"), dir)
    val snap = Snapshots.versions(spark, dir).last
    // which files may hold id <= 49? (their logged bounds, under the
    // boundary-conservative numeric rule: min <= probe keeps)
    val mayHold = snap.dataFiles.filter(f =>
      f.stats.cols("id").asInstanceOf[NumStat].min <= 49).map(_.name).toSet
    assert(mayHold.size < snap.files.size, "the range must be selective")
    withOnly(dir, mayHold) {
      assert(Snapshots.read(spark, dir).where($"id" <= 49).count() == 50)
      // string + prefix predicates skip too (string bounds test exact)
      assert(Snapshots.read(spark, dir)
        .where($"key" < "doc-00050").count() == 50)
      // prefix scan: doc-0000* covers ids 0..9, inside the kept range
      assert(Snapshots.read(spark, dir)
        .where($"key".startsWith("doc-0000")).count() == 10)
    }
    // and the answers equal the unskipped truth
    assert(Snapshots.read(spark, dir).where($"id" <= 49)
      .agg(sum($"id")).head.getLong(0) == (0 until 50).sum)
  }

  test("filtered SQL-catalog scan skips the same way") {
    val dir = freshDir()
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.SnapshotCatalog].getName)
    Snapshots.writeOverwrite(
      (0 until 400).map(i => (i.toLong, s"body $i")).toDF("id", "text")
        .repartitionByRange(8, $"id"), dir)
    val snap = Snapshots.versions(spark, dir).last
    val mayHold = snap.dataFiles.filter(f =>
      f.stats.cols("id").asInstanceOf[NumStat].min <= 49).map(_.name).toSet
    withOnly(dir, mayHold) {
      assert(spark.sql(
        s"SELECT count(*) AS n FROM graft.`$dir` WHERE id <= 49")
        .as[Long].head() == 50)
    }
  }

  test("IS NULL / IS NOT NULL skip files by logged null counts") {
    val dir = freshDir()
    Snapshots.writeAppend(
      (0 until 100).map(i => (i.toLong, s"t $i")).toDF("id", "text")
        .coalesce(1), dir)
    Snapshots.writeAppend(
      (100 until 200).map(i => (i.toLong, null: String)).toDF("id", "text")
        .coalesce(1), dir)
    val dfs = Snapshots.versions(spark, dir).last.dataFiles
    val allNullFile = dfs.find(f =>
      f.stats.cols.get("text").exists(_.nulls.contains(f.stats.rows))).get
    val noNullFile = dfs.find(f =>
      f.stats.cols.get("text").exists(_.nulls.contains(0L))).get
    // IS NULL never touches the zero-null file...
    withOnly(dir, Set(allNullFile.name)) {
      assert(Snapshots.read(spark, dir).where($"text".isNull).count() == 100)
    }
    // ...IS NOT NULL never touches the all-null file — and neither
    // does a plain comparison on the all-null column
    withOnly(dir, Set(noNullFile.name)) {
      assert(Snapshots.read(spark, dir).where($"text".isNotNull).count() == 100)
      assert(Snapshots.read(spark, dir).where($"text" === "t 5").count() == 1)
    }
  }

  test("files without logged bounds are NEVER skipped (legacy mix)") {
    val dir = freshDir()
    // v1 with stats disabled (a pre-r17 writer), v2 with stats on
    spark.conf.set("spark.graft.snapshots.statsColumns", "")
    try Snapshots.writeAppend(
      (0 until 100).map(i => (i.toLong, s"a $i")).toDF("id", "text"), dir)
    finally spark.conf.unset("spark.graft.snapshots.statsColumns")
    Snapshots.writeAppend(
      (100 until 200).map(i => (i.toLong, s"b $i")).toDF("id", "text"), dir)
    // a predicate excluding v2's range still scans v1's stat-less file
    assert(Snapshots.read(spark, dir).where($"id" < 100).count() == 100)
    assert(Snapshots.read(spark, dir).where($"id" >= 100).count() == 100)
    assert(Snapshots.read(spark, dir).count() == 200)
  }
}
