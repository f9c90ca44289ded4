package graft.sources.es

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{EsMapping, Retry}
import graft.sources.jsonl.{MapSource, RowFilter}

/** DSv2 source over a live Elasticsearch/OpenSearch cluster — the
  * reference's entire source side (dump-es-parquet:219-266) re-expressed
  * in Spark's execution model:
  *
  *  - one `InputPartition` per scroll slice (`slices` option): each
  *    executor drives an independent `search?scroll` + `scroll` loop with
  *    `"slice": {id, max}`, so read parallelism is horizontal across the
  *    cluster instead of the reference's single sequential scroll;
  *  - schema comes from the index mapping (`EsMapping`, S2) unless the
  *    caller supplies one; document→row coercion (`MapSource`, T1/T2)
  *    runs inside the partition reader against the pruned schema;
  *  - projection pushdown reaches the wire: pruned columns become the
  *    `_source` include list, so unprojected fields never leave the
  *    cluster (P2); translatable filters become a query_string clause
  *    (P1, EsQuery) and every filter stays residual for Spark to re-check;
  *  - every page fetch is wrapped in Retry.withBackoff (S4) with the
  *    reference's transient-transport-error semantics (:227-230), and the
  *    scroll context is cleared on close.
  *
  * Usage:
  * {{{
  * spark.read.format("graft-es")
  *   .option("es", "http://localhost:9200")   // reference --es
  *   .option("index", "logs-2024.01")         // concrete index (see EsCatalog)
  *   .option("slices", 8)                     // scroll slice parallelism
  *   .option("size", 500)                     // reference --size
  *   .option("scroll", "1h")                  // reference --scroll
  *   .option("timeout", 60)                   // reference --timeout
  *   .option("query", "severity:ERROR")       // reference --query
  *   .load()
  * }}}
  *
  * At 100 TB: `slices` should be sized to the index's shard count (ES
  * caps useful slice parallelism at shards); each slice streams pages of
  * `size` documents with O(size) reader memory, so executor memory is
  * independent of index size.
  */
class EsScrollSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-es"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = EsScanConfig.fromOptions(options.asScala.toMap)
    EsScrollSource.fetchSchema(conf)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new EsTable(schema, EsScanConfig.fromOptions(properties.asScala.toMap))
}

object EsScrollSource {
  private[es] val log = org.slf4j.LoggerFactory.getLogger(classOf[EsScrollSource])

  /** S2: index mapping → StructType, with the unhandled-type warnings the
    * reference logs (:107-109). Retried like every catalog call (:186-194). */
  private[es] def fetchSchema(conf: EsScanConfig): StructType = {
    val transport = conf.transportFactory.open()
    try {
      val resp = Retry.withBackoff(conf.retries, conf.retryBackoffMs,
        EsHttpError.transient) {
        transport.get(s"/${conf.index}/_mapping")
      }
      val key = EsApi.mappingKey(resp, conf.index)
      val (schema, warnings) = EsMapping.fromMappingResponse(resp, key)
      warnings.foreach(w => log.warn(s"${conf.index}: $w"))
      schema
    } finally transport.close()
  }
}

/** Everything a partition reader needs, as a small serializable value. */
private[es] final case class EsScanConfig(
    http: EsHttpConfig,
    index: String,
    query: Option[String],
    size: Int,
    scroll: String,
    slices: Int,
    sort: Seq[(String, String)],
    retries: Int,
    retryBackoffMs: Long,
    tailField: Option[String] = None,
    startFrom: Long = 0L) {
  def transportFactory: EsTransportFactory = HttpTransportFactory(http)
}

private[es] object EsScanConfig {
  /** Option names mirror the reference CLI (dump-es-parquet:372-382);
    * `slices`/`retries`/`retry_backoff_ms` are the Spark-side additions. */
  def fromOptions(opts: Map[String, String]): EsScanConfig = {
    val o = opts.map { case (k, v) => k.toLowerCase -> v }
    EsScanConfig(
      http = EsHttpConfig(
        baseUrl = o.getOrElse("es", "http://localhost:9200"),
        timeoutSec = o.get("timeout").map(_.toInt).getOrElse(60),
        cert = o.get("cert"),
        key = o.get("key"),
        caPath = o.get("capath"),
        verifyCerts = o.get("verify_certs").forall(_.toBoolean)),
      index = o.getOrElse("index",
        throw new IllegalArgumentException("graft-es requires option 'index'")),
      query = o.get("query").filter(_.nonEmpty),
      size = o.get("size").map(_.toInt).getOrElse(500),
      scroll = o.getOrElse("scroll", "1h"),
      slices = o.get("slices").map(_.toInt).getOrElse(1),
      // default sort: _doc — the efficient scroll order; pass
      // sort=@timestamp:asc for the reference CLI's default (:379-380)
      sort = EsApi.parseSort(o.getOrElse("sort", "_doc:asc")),
      retries = o.get("retries").map(_.toInt).getOrElse(5),
      retryBackoffMs = o.get("retry_backoff_ms").map(_.toLong)
        .getOrElse(Retry.ReferenceBackoffMs),
      tailField = o.get("tail_field").filter(_.nonEmpty),
      startFrom = o.get("start_from").map(_.toLong).getOrElse(0L))
  }
}

private[es] class EsTable(schema: StructType, conf: EsScanConfig)
    extends Table with SupportsRead {
  override def name(): String = s"graft_es(${conf.http.base}/${conf.index})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EsScanBuilder(schema, conf)
}

private[es] class EsScanBuilder(full: StructType, conf: EsScanConfig)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** All filters stay residual (Spark re-checks above the scan); the
    * translatable subset additionally rides the wire as query_string. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => RowFilter.supported(f) || EsQuery.clause(f).isDefined)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new EsScan(required, conf, pushed)
}

private[es] class EsScan(required: StructType, conf: EsScanConfig,
                         pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // sliced scroll: each partition is an independent server-side slice.
    // slices=1 sends no slice clause (a plain scroll, the reference's shape).
    val wireQuery = EsQuery.combine(conf.query, pushed.toIndexedSeq)
    // empty (count(*)-style) projection → Some(Nil) → `_source: false`:
    // hit envelopes page through, document bodies never leave the cluster
    val fields = Some(required.fieldNames.toSeq)
    (0 until conf.slices).map { i =>
      val slice = if (conf.slices > 1) Some((i, conf.slices)) else None
      EsPartition(conf, wireQuery, fields, slice): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EsReaderFactory(required, pushed)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EsTailStream(required, conf, pushed)
}

private[es] final case class EsPartition(
    conf: EsScanConfig,
    wireQuery: Option[String],
    sourceFields: Option[Seq[String]],
    slice: Option[(Int, Int)],
    range: Option[(String, Double, Double)] = None) extends InputPartition

private[es] class EsReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EsScrollPartitionReader(required, pushed,
      partition.asInstanceOf[EsPartition])
}

/** Drives one slice's search+scroll loop (reference :219-266), emitting
  * coerced rows. Memory is one page of documents; the scroll id is the
  * only cross-page state. */
private[es] class EsScrollPartitionReader(
    required: StructType, pushed: Array[Filter], part: EsPartition)
    extends PartitionReader[InternalRow] {

  private val conf = part.conf
  private val transport = conf.transportFactory.open()
  private val rowFilter = RowFilter(required, pushed.filter(RowFilter.supported))
  private val sliceTag = part.slice.map { case (i, m) => s" slice $i/$m" }.getOrElse("")

  private var scrollId: Option[String] = None
  private var page: Iterator[com.fasterxml.jackson.databind.JsonNode] = Iterator.empty
  private var exhausted = false
  private var total = -1L
  private var readHits = 0L
  private var current: InternalRow = _

  private def fetch(op: => String): EsApi.Page =
    EsApi.parsePage(Retry.withBackoff(conf.retries, conf.retryBackoffMs,
      EsHttpError.transient,
      onRetry = (left, e) => EsScrollSource.log.warn(
        s"${conf.index}$sliceTag: transient source error " +
          s"($left attempts left): ${e.getMessage}"))(op))

  private def nextPage(): Unit = {
    val p = scrollId match {
      case None =>
        // initial search opens the scroll context (reference :219-226)
        val body = EsApi.searchBody(conf.size, conf.sort, part.wireQuery,
          part.sourceFields, part.slice, part.range)
        fetch(transport.post(
          s"/${conf.index}/_search?scroll=${conf.scroll}", body))
      case Some(id) =>
        fetch(transport.post("/_search/scroll",
          EsApi.scrollBody(conf.scroll, id)))
    }
    if (scrollId.isEmpty) {
      total = p.total
      if (total == 0) EsScrollSource.log.warn(
        s"${conf.index}$sliceTag: no records found") // reference :238-240
    }
    scrollId = p.scrollId.orElse(scrollId)
    if (p.hits.isEmpty) exhausted = true
    else {
      readHits += p.hits.size
      EsScrollSource.log.info(
        s"${conf.index}$sliceTag: read $readHits/$total records") // :257
      page = p.hits.iterator
    }
  }

  @annotation.tailrec
  final override def next(): Boolean =
    if (page.hasNext) {
      val row = MapSource.coerce(page.next(), required)
      if (rowFilter(row)) { current = row; true } else next()
    } else if (exhausted) false
    else { nextPage(); next() }

  override def get(): InternalRow = current

  override def close(): Unit = {
    try scrollId.foreach { id =>
      transport.delete("/_search/scroll", EsApi.clearScrollBody(id))
    } catch {
      case e: Exception => EsScrollSource.log.warn(
        s"${conf.index}$sliceTag: clear scroll failed: ${e.getMessage}")
    } finally transport.close()
  }
}
