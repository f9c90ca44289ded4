package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.operators.{Coerce, Flatten}
import graft.sinks.Sink

/** The reference's end-to-end pipeline as a library job (SURVEY.md §3.1):
  * resolve tables from a pattern (S1), read each (S3 stand-in: parquet),
  * optionally coerce to a fixed schema (T1) and flatten (T3), write with
  * rotation/format/compression (K1-K4) — with per-table error isolation
  * (reference dump-es-parquet:87-95: one bad table must not abort the run).
  */
object DumpJob {

  case class Config(
      pattern: String = "*",
      schema: Option[StructType] = None, // None = schema-on-read passthrough
      flatten: Boolean = false,          // reference --flatten
      rawJson: Boolean = false,          // K3 passthrough mode
      sink: Sink.Config = Sink.Config())

  sealed trait Result { def table: String }
  case class Written(table: String, files: Seq[String]) extends Result
  case class Failed(table: String, error: Throwable) extends Result

  def transform(df: DataFrame, config: Config): DataFrame = {
    val coerced = config.schema match {
      case Some(s) => Coerce.withMetrics(s)(df)
      case None    => df
    }
    if (config.flatten) Flatten(coerced) else coerced
  }

  /** Run the per-table loop; errors are isolated per table and reported in
    * the results rather than thrown. */
  def run(spark: SparkSession, srcDir: String, outDir: String, config: Config): Seq[Result] =
    Tables.resolve(config.pattern).map { table =>
      try {
        val df = transform(Tables.load(spark, srcDir, table), config)
        val files =
          if (config.rawJson) Sink.writeRawJson(df, s"$outDir/$table", table, config.sink)
          else Sink.write(df, s"$outDir/$table", table, config.sink)
        Written(table, files)
      } catch {
        case e: Throwable => Failed(table, e)
      }
    }
}
