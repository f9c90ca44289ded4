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

  /** `warnings` is the reference's per-index "msg [N documents]" flush
    * (dump-es-parquet:304-305): per target field, how many present input
    * values the lenient coercion nulled. Empty when no schema was applied
    * or nothing was lost. */
  case class Written(table: String, files: Seq[String],
                     warnings: Map[String, Long] = Map.empty) extends Result
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
        val raw = Tables.load(spark, srcDir, table)
        val (coerced, obs) = config.schema match {
          case Some(s) =>
            val o = org.apache.spark.sql.Observation(s"graft_coerce_$table")
            val (df, attached) = Coerce.withObservation(s, o)(raw)
            (df, if (attached) Some(o) else None)
          case None => (raw, None)
        }
        val df = if (config.flatten) Flatten(coerced) else coerced
        val files =
          if (config.rawJson) Sink.writeRawJson(df, s"$outDir/$table", table, config.sink)
          else Sink.write(df, s"$outDir/$table", table, config.sink)
        // the write was the observed action, so get() returns immediately
        val warnings = obs.map(_.get.collect {
          case (k, v: Long) if v > 0 => k -> v
        }).getOrElse(Map.empty)
        Written(table, files, warnings)
      } catch {
        case e: Throwable => Failed(table, e)
      }
    }
}
