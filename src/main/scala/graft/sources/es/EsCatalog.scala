package graft.sources.es

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.sources.{Retry, SourceCatalog}

/** Live-cluster implementation of the [[graft.sources.SourceCatalog]]
  * seam: index-pattern resolution via `indices.get_settings` (S1,
  * reference dump-es-parquet:342-350), schemas via `indices.get_mapping`
  * (S2, :185-204), scans via the `graft-es` DSv2 scroll source (S3).
  * Every catalog call is retried with the reference's transient-error
  * semantics (S4).
  *
  * `readOptions` flow through to every scan — set `slices`, `size`,
  * `scroll`, `query` etc. once for a whole DumpJob run.
  */
final case class EsCatalog(
    http: EsHttpConfig,
    readOptions: Map[String, String] = Map.empty) extends SourceCatalog {

  private def conf(index: String): EsScanConfig =
    EsScanConfig.fromOptions(baseOptions + ("index" -> index))

  private def baseOptions: Map[String, String] = readOptions ++ Map(
    "es" -> http.baseUrl,
    "timeout" -> http.timeoutSec.toString,
    "verify_certs" -> http.verifyCerts.toString) ++
    http.cert.map("cert" -> _) ++ http.key.map("key" -> _) ++
    http.caPath.map("capath" -> _)

  /** S1: expand an index pattern to concrete index names. */
  override def listTables(pattern: String): Seq[String] = {
    val c = conf(pattern)
    val transport = c.transportFactory.open()
    try {
      val resp = Retry.withBackoff(c.retries, c.retryBackoffMs,
        EsHttpError.transient) {
        transport.get(s"/$pattern/_settings")
      }
      EsApi.parseIndexNames(resp)
    } finally transport.close()
  }

  /** S2: the mapping-derived schema the scan will coerce into. */
  override def tableSchema(spark: SparkSession, name: String): StructType =
    EsScrollSource.fetchSchema(conf(name))

  /** S3: a DataFrame over the index via the scroll source. */
  override def load(spark: SparkSession, name: String): DataFrame =
    spark.read.format("graft-es")
      .options(baseOptions + ("index" -> name))
      .load()
}
