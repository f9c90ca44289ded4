package graft

import org.apache.spark.sql.SparkSession
import graft.sinks.Sink

/** CLI entry point mirroring the reference's flag surface
  * (dump-es-parquet:356-433) so a user of the reference can switch with
  * the same invocation shape:
  *
  *   runMain graft.Dump <index-pattern> --src <dir> --out <dir>
  *     [--query EXPR] [--fields a,b*,c] [--sort field:asc,...]
  *     [--output parquet|ndjson|csv|jsonl] [--compression gzip|zstd|uncompressed]
  *     [--flatten] [--max-partition-rows N] [--no-partition] [--quiet]
  *
  * Deviations from the reference, by design: `--src` replaces `--es` (the
  * zero-egress stand-in for the cluster address; a live ES DSv2 source
  * would plug in behind SourceCatalog), `--query` takes a Spark SQL
  * expression rather than a Lucene query string, and the scroll/TLS knobs
  * (--size/--scroll/--timeout/--cert/...) have no meaning over parquet
  * fixtures. `--max-partition-mb` maps onto the row cap only (Spark task
  * writers stream to disk, so in-memory partition size is not a failure
  * mode the way accumulate-then-flush was). stdout mode prints the jsonl
  * lines to stdout.
  */
object Dump {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    try {
      val results = execute(spark, args)
      if (results.exists(_.isInstanceOf[DumpJob.Failed])) sys.exit(1)
    } finally spark.stop()
  }

  def execute(spark: SparkSession, args: Array[String]): Seq[DumpJob.Result] = {
    val (flags, positional) = parse(args.toList)
    require(positional.nonEmpty, "usage: graft.Dump <index-pattern> --src <dir> --out <dir> [flags]")
    val pattern = positional.head
    val srcDir = flags.getOrElse("src", "/root/testdata/sf0.001")
    val outDir = flags.getOrElse("out",
      java.nio.file.Files.createTempDirectory("graft_dump").toString)
    val output = flags.getOrElse("output", "parquet")

    val config = DumpJob.Config(
      pattern = pattern,
      query = flags.get("query"),
      fields = flags.get("fields").map(_.split(",").toSeq).getOrElse(Nil),
      sort = flags.get("sort").map(_.split(",").toSeq).getOrElse(Nil),
      flatten = flags.contains("flatten"),
      rawJson = output == "jsonl" || output == "stdout",
      sink = Sink.Config(
        format = output match {
          case "ndjson"            => "json"
          case "jsonl" | "stdout"  => "text"
          case f                   => f
        },
        compression = flags.get("compression").filter(_ != "uncompressed"),
        maxRecordsPerFile =
          if (flags.contains("no-partition")) Long.MaxValue
          else flags.get("max-partition-rows").map(_.toLong).getOrElse(1000000L),
        maxPartitionBytes =
          if (flags.contains("no-partition")) None
          else flags.get("max-partition-mb").map(_.toLong * 1024 * 1024),
        partitionBy = flags.get("partition-by").map(_.split(",").toSeq).getOrElse(Nil)))

    if (flags.contains("quiet")) spark.sparkContext.setLogLevel("ERROR")
    val results =
      if (output == "stdout")
        // true streaming: lines reach stdout as partitions arrive, no
        // temp files (reference dump-es-parquet:250-253)
        DumpJob.streamJson(spark, graft.sources.ParquetDirCatalog(srcDir), config,
          msg => if (!flags.contains("quiet")) System.err.println(msg))(println)
      else DumpJob.run(spark, srcDir, outDir, config)
    results.foreach {
      case DumpJob.Written(table, files, warnings) =>
        warnings.foreach { case (msg, n) => System.err.println(s"$table: $msg [$n documents]") }
        if (output != "stdout") System.err.println(s"$table: wrote ${files.length} file(s)")
      case DumpJob.Failed(table, e) =>
        System.err.println(s"$table: FAILED ${e.getMessage}")
    }
    results
  }

  /** Minimal GNU-ish flag parser: `--name value`, `--bool-flag`, free args. */
  private val boolFlags = Set("flatten", "no-partition", "quiet", "debug")

  def parse(args: List[String], flags: Map[String, String] = Map.empty,
            positional: List[String] = Nil): (Map[String, String], List[String]) =
    args match {
      case Nil => (flags, positional.reverse)
      case flag :: rest if flag.startsWith("--") =>
        val name = flag.drop(2)
        if (boolFlags(name)) parse(rest, flags + (name -> "true"), positional)
        else rest match {
          case v :: more => parse(more, flags + (name -> v), positional)
          case Nil => throw new IllegalArgumentException(s"missing value for --$name")
        }
      case p :: rest => parse(rest, flags, p :: positional)
    }
}
