package graft

import org.apache.spark.sql.functions._

/** Declarative runner: config chain == hand-written operator chain,
  * fail-fast parsing, and the write stage. */
class PipelineSpec extends SparkSpec {

  import spark.implicits._

  test("config chain == the hand-written q179-shaped operator chain") {
    // fixture docs are single unpunctuated lines, so the line gate is
    // exercised in the html test below; this chain pins the rest
    val cfg =
      """# flagship curation shape over the documents fixture
        |read        table=documents
        |clean
        |exactDedup
        |minTokens   n=8
        |split       trainPct=80 valPct=10
        |""".stripMargin
    val got = Pipeline.run(spark, sf(), cfg)
    val d = Tables.load(spark, sf(), "documents")
    val cleaned = d.withColumn("text",
      operators.Normalize.cleanText($"text"))
    val deduped = operators.Dedup.exactByText(cleaned, "text", "doc_id")
      .filter(size(functions.Text.tokens($"text")) >= 8)
    val want = operators.Splits.assign(deduped, "doc_id",
      trainPct = 80, valPct = 10)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "the config run must be exactly the hand-written composition")
  }

  test("htmlExtract + nearDedup stages delegate with their params") {
    val docs = Seq(
      (1L, "<html><body><p>alpha beta gamma delta epsilon zeta</p>" +
        "<script>x()</script></body></html>"),
      (2L, "<html><body><p>alpha beta gamma delta epsilon zeta</p>" +
        "</body></html>"),
      (3L, "<html><body><p>totally different content words here now</p>" +
        "</body></html>")
    ).toDF("doc_id", "text")
    // point the read stage at a temp fixture dir holding these docs
    val dir = java.nio.file.Files.createTempDirectory("pipeline_html").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cfg =
      """read        table=documents
        |htmlExtract minWords=3 minDensity=0.1
        |nearDedup   shingle=2 bands=4 maxBucket=64
        |""".stripMargin
    val got = Pipeline.run(spark, dir, cfg)
    val want = operators.Dedup.pruneNearDups(
      operators.Extract.mainContent(spark.read.parquet(s"$dir/documents.parquet"),
        "text", minWords = 3, minDensity = 0.1),
      "text", "doc_id", shingle = 2, bands = 4, maxBucket = 64)
    assert(got.count() === 2, "one of the two near-identical pages must fall")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("parse fails fast: unknown stage, unknown key, malformed param, bad order") {
    def bad(cfg: String): String =
      intercept[IllegalArgumentException](Pipeline.parse(cfg)).getMessage
    assert(bad("read table=documents\nfrobnicate x=1").contains("unknown stage"))
    assert(bad("read table=documents\nlineFilter minWord=3")
      .contains("unknown lineFilter param"))
    assert(bad("read table=documents\nminTokens n").contains("malformed"))
    assert(bad("lineFilter minWords=3").contains("first stage must be 'read'"))
    assert(bad("read table=documents\nread table=events")
      .contains("only as the first"))
    assert(intercept[IllegalArgumentException](
      Pipeline.run(spark, sf(), "read table=documents\nminTokens n=abc"))
      .getMessage.contains("must be an integer"))
  }

  test("'#' is a comment only at line start / after whitespace — " +
      "a '#' inside a param value is data") {
    val stages = Pipeline.parse(
      "# full-line comment\nread table=documents  # trailing comment\n" +
        "write path=/data/run#1")
    assert(stages.map(_.name) === Seq("read", "write"))
    assert(stages(0).params === Map("table" -> "documents"))
    assert(stages(1).params === Map("path" -> "/data/run#1"))
  }

  test("embedDedup stage prunes a reordered near-copy via derived embeddings") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "kappa iota theta eta zeta epsilon delta gamma beta alpha"),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pipeline_embed").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.run(spark, dir,
      "read table=documents\nembedDedup minCos=0.95\n")
    assert(got.select($"doc_id").as[Long].collect().toSet === Set(1L, 3L))
  }

  test("langId stage trains on the frame's labels and appends pred") {
    val cfg =
      """read   table=documents
        |langId langCol=lang langs=en,de,es,fr,zh dim=32 n=3 iterations=1
        |""".stripMargin
    val got = Pipeline.run(spark, sf(), cfg)
    assert(got.columns.contains("pred"))
    assert(got.count() === Tables.load(spark, sf(), "documents").count())
    assert(got.filter($"pred".isNull).isEmpty)
  }

  test("write stage materializes files and passes the frame through") {
    val out = java.nio.file.Files.createTempDirectory("pipeline_spec").toString
    val cfg =
      s"""read   table=documents
         |minTokens n=5
         |write  path=$out table=docs format=parquet
         |""".stripMargin
    val got = Pipeline.run(spark, sf(), cfg)
    val files = new java.io.File(out).listFiles()
    assert(files != null && files.exists(_.getName.endsWith(".parquet")))
    val back = spark.read.parquet(files.filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath): _*)
    assert(back.count() === got.count())
  }
}
