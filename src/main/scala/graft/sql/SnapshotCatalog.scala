package graft.sql

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.Snapshots

/** The SQL surface over [[graft.sinks.Snapshots]] tables — a DSv2
  * `TableCatalog` so the one stock Spark door the storage layer was
  * missing exists: `spark.sql`, BI tools, and time travel all work
  * with ZERO Scala in the query path.
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sql.SnapshotCatalog")
  *   // optional name resolution root:
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/tables")
  *
  *   spark.sql("SELECT * FROM graft.`/data/tables/docs`")          // latest
  *   spark.sql("SELECT * FROM graft.docs VERSION AS OF 3")         // time travel
  *   spark.sql("SELECT * FROM graft.docs TIMESTAMP AS OF '2026-01-01'")
  * }}}
  *
  * Identifier resolution: a name that looks like a path (leading `/`
  * or a `scheme://`) IS the table directory — the `delta.\`/path\``
  * idiom; otherwise the name resolves under the configured
  * `warehouse` root (namespaces become subdirectories).
  *
  * Loading PINS a snapshot: the returned table is one immutable file
  * set, so a SQL query planned against it never sees a torn read no
  * matter what commits land while it runs — exactly the
  * [[Snapshots.read]] guarantee, now holding for SQL. The scan itself
  * goes through [[org.apache.spark.sql.graftshim.SnapshotScanShim]]:
  * file names, sizes, and schema come from the LOG ENTRY (zero
  * filesystem calls at plan time for r19+ entries), and execution is
  * Spark's own DSv2 parquet scan — pushdown, pruning, vectorized
  * reading, split math off the logged sizes.
  *
  * READ-ONLY by design: every write is a versioned commit with
  * rebase/conflict semantics that SQL `INSERT` cannot express — the
  * write surface is the [[Snapshots]] API (and the `graft-snapshot`
  * streaming sink); the mutation DDL here fails fast saying so. */
class SnapshotCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: Option[String] = None

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def isPath(n: String): Boolean =
    n.startsWith("/") || n.contains("://")

  private def dirFor(ident: Identifier): String = {
    val n = ident.name()
    if (isPath(n)) {
      require(ident.namespace().isEmpty,
        s"path identifiers take no namespace: ${ident.namespace().mkString(".")}.$n")
      n
    } else warehouse match {
      case Some(w) => (w +: ident.namespace().toSeq :+ n).mkString("/")
      case None => throw new NoSuchTableException(ident)
    }
  }

  private def load(ident: Identifier, version: Option[Int],
                   asOfMillis: Option[Long]): Table = {
    val dir = dirFor(ident)
    try {
      val v = asOfMillis.map(ts => Snapshots.versionAsOf(spark, dir, ts))
        .orElse(version)
      new SnapshotTable(s"$catalogName.${ident.name()}", dir,
        Snapshots.snapshotAt(spark, dir, v), spark)
    } catch {
      case e: IllegalArgumentException =>
        // no log under the dir, vacuumed/unknown version, or nothing
        // old enough for the timestamp — NoSuchTable with the cause
        throw new NoSuchTableException(
          errorClass = "TABLE_OR_VIEW_NOT_FOUND",
          messageParameters = Map("relationName" ->
            s"`$catalogName`.`${ident.name()}` (${e.getMessage})"),
        cause = Some(e))
    }
  }

  override def loadTable(ident: Identifier): Table = load(ident, None, None)

  /** `VERSION AS OF n` — the version is the log's own number. A
    * non-numeric version surfaces through the same wrapped
    * NoSuchTableException path as every other load failure (not a raw
    * IllegalArgumentException from a require — DDL like `DROP TABLE IF
    * EXISTS t VERSION AS OF 'x'` probes through here). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!(version.nonEmpty && version.forall(_.isDigit)))
      throw new NoSuchTableException(
        errorClass = "TABLE_OR_VIEW_NOT_FOUND",
        messageParameters = Map("relationName" ->
          (s"`$catalogName`.`${ident.name()}` (VERSION AS OF on a " +
            s"snapshot table takes the integer log version, got '$version')")),
        cause = None)
    load(ident, Some(version.toInt), None)
  }

  /** `TIMESTAMP AS OF ts` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, None, Some(timestamp / 1000L))

  override def tableExists(ident: Identifier): Boolean =
    try { load(ident, None, None); true }
    catch {
      case _: NoSuchTableException => false
      // dirFor's path-identifier shape check throws raw
      // IllegalArgumentException before load's wrapping — an existence
      // probe on a malformed identifier is "no", not an internal error
      case _: IllegalArgumentException => false
    }

  /** Tables = subdirectories of the warehouse namespace dir that have
    * a snapshot log. Path-identified tables are unlisted by nature. */
  override def listTables(namespace: Array[String]): Array[Identifier] =
    warehouse match {
      case None => Array.empty
      case Some(w) =>
        val dir = new Path((w +: namespace.toSeq).mkString("/"))
        val fs = dir.getFileSystem(
          spark.sessionState.newHadoopConf())
        if (!fs.exists(dir)) Array.empty
        else fs.listStatus(dir).toSeq
          .filter(st => st.isDirectory &&
            fs.exists(new Path(st.getPath, "_graft_log")))
          .map(st => Identifier.of(namespace, st.getPath.getName))
          .toArray
    }

  private def readOnly(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName: $what is not supported on snapshot tables; richer " +
        "mutations go through the versioned commit API " +
        "(graft.sinks.Snapshots: upsert/deleteKeys/optimizeZorder/...) " +
        "or the graft-snapshot streaming sink")

  /** `CREATE TABLE` / the create half of CTAS (r18): commit version 1
    * with the schema and an EMPTY file list — the table exists, reads
    * empty, and the first INSERT is just the next commit. Partition
    * transforms are refused: the log replaces hive partitioning with
    * clustering + file skipping (the [[Snapshots]] design stance). */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      s"$catalogName: PARTITIONED BY is not supported — snapshot tables " +
        "replace hive partitioning with clustering (optimizeZorder) + " +
        "file skipping")
    val dir = dirFor(ident)
    if (Snapshots.latestVersion(spark, dir).isDefined)
      throw new TableAlreadyExistsException(ident)
    Snapshots.createEmpty(spark, dir, schema)
    load(ident, None, None)
  }

  /** `ALTER TABLE` (r18): RENAME COLUMN routes to the metadata-commit
    * [[Snapshots.renameColumn]] (zero files rewritten — the injected
    * mapped-read rule keeps SQL reads correct afterwards), ADD
    * COLUMNS to [[Snapshots.addColumns]] (pure widening, existing
    * files NULL-fill). Top-level columns only; everything else still
    * fails fast naming the richer API. */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val dir = dirFor(ident)
    changes.foreach {
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames().length == 1,
          s"$catalogName: nested column renames are not supported " +
            s"(${rc.fieldNames().mkString(".")})")
        Snapshots.renameColumn(spark, dir, rc.fieldNames()(0), rc.newName())
      case ac: TableChange.AddColumn =>
        require(ac.fieldNames().length == 1,
          s"$catalogName: nested column adds are not supported " +
            s"(${ac.fieldNames().mkString(".")})")
        Snapshots.addColumns(spark, dir, StructType(Seq(
          org.apache.spark.sql.types.StructField(
            ac.fieldNames()(0), ac.dataType(), nullable = true))))
      case other => readOnly(s"ALTER TABLE ($other)")
    }
    load(ident, None, None)
  }

  /** `DROP TABLE`: a WAREHOUSE-resolved (managed) table drops its
    * directory — log and data both, the managed-table contract. A
    * path identifier is EXTERNAL by nature (the `delta.\`/path\``
    * idiom): the catalog never owns that directory, so dropping it
    * through SQL is refused — delete the path through the filesystem
    * if that is really what you mean. */
  override def dropTable(ident: Identifier): Boolean = {
    val n = ident.name()
    if (isPath(n))
      throw new UnsupportedOperationException(
        s"$catalogName: DROP TABLE on a path identifier would delete " +
          s"data the catalog does not own ($n) — path tables are " +
          "external; remove the directory through the filesystem instead")
    try {
      val dir = dirFor(ident)
      if (Snapshots.latestVersion(spark, dir).isEmpty) false
      else {
        val p = new Path(dir)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      }
    } catch {
      case _: NoSuchTableException => false
      case _: IllegalArgumentException => false
    }
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}

/** One PINNED snapshot as a DSv2 table: schema from the log entry
  * (footer-union fallback for legacy entries), scans through the
  * zero-filesystem-call [[org.apache.spark.sql.graftshim.SnapshotScanShim]]
  * path.
  *
  * WRITABLE since r18: `INSERT INTO` / `INSERT OVERWRITE` / the write
  * half of CTAS route through a [[V1Write]] handing the materialized
  * frame to the SAME versioned commit paths every Scala writer uses
  * ([[Snapshots.writeAppend]]/[[Snapshots.writeOverwrite]]) — one
  * commit protocol to trust, full rebase/conflict semantics, schema
  * gate included; `DELETE FROM ... WHERE` translates its pushed
  * filters back to a Column and runs the copy-on-write
  * [[Snapshots.deleteWhere]]. A predicate the translation cannot
  * express is refused at ANALYSIS time (`canDeleteWhere` false), never
  * half-applied. */
private[sql] class SnapshotTable(tableName: String,
                                 private[sql] val dir: String,
                                 private[sql] val snap: Snapshots.Snapshot,
                                 spark: SparkSession)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  override def name(): String = tableName

  override lazy val schema: StructType = snap.schema.getOrElse(
    spark.read.option("mergeSchema", "true")
      .parquet(snap.files.map(f => s"$dir/$f"): _*).schema)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                                overwriteFlag: Boolean): Unit = {
              if (overwrite || overwriteFlag)
                Snapshots.writeOverwrite(data, dir)
              else Snapshots.writeAppend(data, dir)
              ()
            }
          }
      }
    }

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    filters.forall(f => SnapshotTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    val cond = filters.flatMap(SnapshotTable.filterToColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    Snapshots.deleteWhere(spark, dir, cond)
    ()
  }

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put(TableCatalog.PROP_LOCATION, dir)
    m.put("snapshot.version", snap.version.toString)
    m.put("snapshot.op", snap.op)
    m
  }

  /** True when any column's logical name differs from the files'
    * physical name — after a [[Snapshots.renameColumn]]. */
  private[sql] def isColumnMapped: Boolean =
    snap.schema.exists(_.fields.exists(f =>
      f.metadata.contains("graft.physical") &&
        f.metadata.getString("graft.physical") != f.name))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // a mapped table's physical→logical projection is applied by the
    // injected SnapshotMappedReadRule at ANALYSIS time (the Delta
    // device); if planning reaches this builder the rule is not
    // installed — refuse loudly rather than return NULLs for every
    // renamed column (the stock parquet scan matches columns by name)
    if (isColumnMapped)
      throw new UnsupportedOperationException(
        s"$tableName: table at $dir has renamed (column-mapped) columns " +
          "and this session lacks the graft analyzer rules — set " +
          "spark.sql.extensions=graft.sql.GraftExtensions (or build the " +
          "session through graft.GraftSession), or read through " +
          "graft.sinks.Snapshots.read")
    // sizes + bounds from the entry when logged (zero-stat planning,
    // predicate-driven file skipping); one getFileStatus per file only
    // for legacy entries
    val fs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val entries = snap.dataFiles.map { f =>
      val len = if (f.size >= 0) f.size
        else fs.getFileStatus(new Path(new Path(dir), f.name)).getLen
      (f.name, len, f.stats)
    }
    org.apache.spark.sql.graftshim.SnapshotScanShim.scanBuilder(
      spark, dir, entries, schema, options)
  }
}

private[sql] object SnapshotTable {

  /** Pushed-filter → Column translation for `DELETE WHERE` — the
    * inverse of Spark's own predicate translation, covering every
    * filter shape the engine pushes to [[SupportsDelete]]; None =
    * untranslatable, which [[SnapshotTable.canDeleteWhere]] surfaces
    * as an analysis error rather than a partial delete. Column names
    * are backtick-quoted so dotted names stay one attribute. */
  private def quoted(attr: String): Column =
    col("`" + attr.replace("`", "``") + "`")

  private[sql] def filterToColumn(f: sources.Filter): Option[Column] =
    f match {
      case sources.EqualTo(a, v) => Some(quoted(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(quoted(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(quoted(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(quoted(a) >= lit(v))
      case sources.LessThan(a, v) => Some(quoted(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(quoted(a) <= lit(v))
      case sources.In(a, vs) => Some(quoted(a).isin(vs.toIndexedSeq: _*))
      case sources.IsNull(a) => Some(quoted(a).isNull)
      case sources.IsNotNull(a) => Some(quoted(a).isNotNull)
      case sources.StringStartsWith(a, v) => Some(quoted(a).startsWith(v))
      case sources.StringEndsWith(a, v) => Some(quoted(a).endsWith(v))
      case sources.StringContains(a, v) => Some(quoted(a).contains(v))
      case sources.And(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
      case sources.Or(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
      case sources.Not(c) => filterToColumn(c).map(!_)
      case _: sources.AlwaysTrue => Some(lit(true))
      case _: sources.AlwaysFalse => Some(lit(false))
      case _ => None
    }
}
