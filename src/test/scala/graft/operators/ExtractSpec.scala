package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML main-content extraction: hand-computed extractions pin every
  * rule (script/style/comment drop, block segmentation, entity decode
  * order, word gate, density gate, no-row-drop contract). */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """<html><head><title>My Page</title><style>.a{x}</style></head><body>""" +
      """<div id="nav"><a href="/">Home</a> <a href="/a">About</a> """ +
      """<a href="/b">Contact</a> <a href="/c">Docs</a> """ +
      """<a href="/d">Blog</a> <a href="/e">More</a></div>""" +
      """<script>var x = 1;</script>""" +
      """<p>The quick brown fox jumps over the lazy dog.</p>""" +
      """<p>Tom &amp; Jerry say &quot;hi&quot; &amp;lt;tag&amp;gt; indeed.</p>""" +
      """<!-- hidden comment words one two three four five -->""" +
      """<p>&copy; 2026</p></body></html>"""

  private def extract(html: String, minWords: Int = 5, minDensity: Double = 0.25) =
    Extract.mainContent(Seq((1L, html)).toDF("id", "html"),
      "html", minWords, minDensity).head()

  test("main content survives; nav, script, style, comment, footer do not") {
    val r = extract(page)
    assert(r.getAs[String]("text") ==
      "The quick brown fox jumps over the lazy dog.\n" +
        """Tom & Jerry say "hi" &lt;tag&gt; indeed.""")
    // blocks with any text: nav, fox, tom, footer (head dropped wholesale)
    assert(r.getAs[Int]("n_blocks") == 4)
    assert(r.getAs[Int]("n_blocks_kept") == 2)
  }

  test("svg/noscript/iframe/head subtrees never leak; <header> survives the head pattern") {
    val html = "<head><title>Meta Only</title></head>" +
      "<svg viewBox='0 0 9 9'><path d='M0 0 L9 9 Z'/>vector words here okay</svg>" +
      "<noscript>please enable javascript to continue using this</noscript>" +
      "<iframe src='/ad'>fallback advertisement copy inside frames</iframe>" +
      "<header>site chrome words</header>" +
      "<p>actual body content with enough words here.</p>"
    val r = extract(html, minWords = 5, minDensity = 0.0)
    assert(r.getAs[String]("text") == "actual body content with enough words here.")
    // header (block tag, 3 words) was SEGMENTED, not swallowed by <head...>
    assert(r.getAs[Int]("n_blocks") == 2, r.toString)
    val full = Seq(html).toDF("h").select(Extract.stripTags($"h")).head().getString(0)
    assert(!full.contains("vector") && !full.contains("enable") &&
      !full.contains("advertisement") && !full.contains("Meta"))
    assert(full.contains("site chrome words"))
  }

  test("the nav dies by DENSITY, not by the word gate") {
    // 6 words of link text, 134 raw chars -> density 33/134 = 0.246
    val nav = """<div><a href="/">Home</a> <a href="/a">About</a> """ +
      """<a href="/b">Contact</a> <a href="/c">Docs</a> """ +
      """<a href="/d">Blog</a> <a href="/e">More</a></div>"""
    assert(extract(nav, minWords = 5, minDensity = 0.25)
      .getAs[Int]("n_blocks_kept") == 0)
    assert(extract(nav, minWords = 5, minDensity = 0.0)
      .getAs[String]("text") == "Home About Contact Docs Blog More")
  }

  test("entity decode: &amp; last, so &amp;lt; never double-decodes") {
    val df = Seq(("&amp;lt;b&amp;gt; &lt;i&gt; &amp;amp; &nbsp; &#39;q&#39;"))
      .toDF("t").select(Extract.decodeEntities($"t").as("d"))
    assert(df.head().getString(0) == "&lt;b&gt; <i> &amp;   'q'")
  }

  test("no document is dropped: markup-only and empty pages keep a row") {
    val df = Extract.mainContent(Seq(
      (1L, "<div><a href='/'>x</a></div>"), (2L, ""), (3L, "plain words "
        + "with no markup at all here")).toDF("id", "html"), "html")
    assert(df.count() == 3)
    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[String]("text") == "" && byId(1L).getAs[Int]("n_blocks") == 1)
    assert(byId(2L).getAs[String]("text") == "" && byId(2L).getAs[Int]("n_blocks") == 0)
    assert(byId(3L).getAs[String]("text") == "plain words with no markup at all here")
  }

  test("block segmentation: inline tags stay, block tags split, pre/p and header/h1 disambiguate") {
    val html = "<p>alpha beta gamma delta epsilon <b>bold</b></p>" +
      "<h1>just a heading here okay</h1>" +
      "<header>site chrome</header>" +
      "<td>cell one two three four five</td>"
    val r = extract(html, minWords = 5, minDensity = 0.0)
    assert(r.getAs[String]("text") ==
      "alpha beta gamma delta epsilon bold\n" +
        "just a heading here okay\ncell one two three four five")
  }

  test("stripTags: whole-document text, boilerplate included (head excluded)") {
    val txt = Seq(page).toDF("h").select(Extract.stripTags($"h")).head().getString(0)
    assert(txt.startsWith("Home About Contact Docs Blog More The quick"))
    assert(!txt.contains("My Page"))
    assert(!txt.contains("var x"))
    assert(!txt.contains("hidden comment"))
  }

  test("links: hrefs in order, entities decoded, no-link pages give empty") {
    val html = """<p><a href="https://a.example/x?p=1&amp;q=2">one</a>""" +
      """ <b>not a link</b> <a class="c" href="http://b.example/y">two</a></p>"""
    val got = Seq(html).toDF("h").select(Extract.links($"h")).head()
      .getSeq[String](0)
    assert(got == Seq("https://a.example/x?p=1&q=2", "http://b.example/y"))
    assert(Seq("<p>no anchors here</p>").toDF("h")
      .select(Extract.links($"h")).head().getSeq[String](0).isEmpty)
  }

  test("links: single-quoted and bare hrefs extract too, none twice") {
    val html = """<a href="https://dq.example/a">1</a>""" +
      """<a href='https://sq.example/b?x=1&amp;y=2'>2</a>""" +
      """<a href=https://bare.example/c>3</a>""" +
      """<a class='k' href = 'https://sq.example/d'>4</a>"""
    val got = Seq(html).toDF("h").select(Extract.links($"h")).head()
      .getSeq[String](0)
    assert(got.toSet == Set("https://dq.example/a",
      "https://sq.example/b?x=1&y=2", "https://sq.example/d",
      "https://bare.example/c"))
    assert(got.size == 4, s"no href may extract twice: $got")
  }

  test("title: stripped, decoded, squeezed; null when absent") {
    val r = Seq(
      (1L, "<html><head><title> Tom &amp;  Jerry </title></head></html>"),
      (2L, "<html><body>no title</body></html>")).toDF("id", "h")
      .select($"id", Extract.title($"h").as("t")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(r(1L).contains("Tom & Jerry"))
    assert(r(2L).isEmpty)
  }

  test("mainContent is narrow: zero exchanges, zero generates in the plan") {
    val plan = Extract.mainContent(
        Seq((1L, page)).toDF("id", "html"), "html")
      .queryExecution.executedPlan
    val exchanges = collectPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val generates = collectPlan(plan) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(exchanges.isEmpty, "per-row extraction must not shuffle")
    assert(generates.isEmpty, "block handling stays in-row (no explode)")
  }

  test("mainContent is stateless: streamed pages == batch result") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("ex_src").toString
    val out = Files.createTempDirectory("ex_out").toString
    val ckpt = Files.createTempDirectory("ex_ckpt").toString
    val docs = Seq((1L, page), (2L, "<p>five words are not enough</p>"))
      .toDF("id", "html")
    docs.write.mode("append").parquet(src)
    val q = Extract.mainContent(
        spark.readStream.schema(docs.schema).parquet(src), "html")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    val batch = Extract.mainContent(docs, "html").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(streamed == batch)
  }

  test("streaming crawl recipe: html stream -> mainContent -> DocPrep == batch twin") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("exdp_src").toString
    val out = Files.createTempDirectory("exdp_out").toString
    val ckpt = Files.createTempDirectory("exdp_ckpt").toString
    val ts = java.sql.Timestamp.valueOf("2026-03-01 12:00:00")
    // the dup arrives LATER: DocPrep's winner contract is earliest-ts
    // (ties are arrival order, which a parquet batch does not pin)
    val ts2 = java.sql.Timestamp.valueOf("2026-03-01 12:05:00")
    val body = "the quick brown fox jumps over the lazy dog while the cat " +
      "watches from a warm windowsill and the rain taps the glass daily"
    def pageOf(text: String) =
      s"""<html><head><title>t</title></head><body><div id="nav">""" +
        """<a href="/">Home</a> <a href="/a">About</a> <a href="/b">Contact</a> """ +
        """<a href="/c">Docs</a> <a href="/d">Blog</a> <a href="/e">More</a></div>""" +
        s"""<script>track();</script><p>$text</p></body></html>"""
    val b1 = Seq(
      (1L, pageOf(body), ts),          // survives
      (3L, pageOf("too short"), ts))   // fails the quality gate
      .toDF("doc_id", "html", "ingest_ts")
    // the re-crawl arrives in a LATER micro-batch: the dedup state (not
    // intra-batch arrival order, which is unpinned) must drop it on the
    // EXTRACTED text — the htmls differ only via the nav/script noise
    // extraction removes
    val b2 = Seq((2L, pageOf(body), ts2)).toDF("doc_id", "html", "ingest_ts")
    val pages = b1.unionByName(b2)
    // the whole chain is one streaming plan: extraction is stateless, so
    // it composes BELOW DocPrep's watermark dedup without a second query
    def run(): Unit = {
      val q = graft.streaming.DocPrep.prep(
          Extract.mainContent(
            spark.readStream.schema(b1.schema).parquet(src), "html"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    b1.write.mode("append").parquet(src); run()
    b2.write.mode("append").parquet(src); run()
    val streamed = spark.read.parquet(out)
      .select($"doc_id").as[Long].collect().toSet
    val batch = graft.streaming.DocPrep.prep(Extract.mainContent(pages, "html"))
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed == Set(1L),
      s"nav/script gone, dup 2 deduped on EXTRACTED text, junk 3 gated: $streamed")
  }

  test("extraction feeds the existing line/doc gate chain") {
    val cleaned = LineFilter.cleanDocs(
      Extract.mainContent(Seq((1L, page)).toDF("doc_id", "html"), "html"),
      "text")
    assert(cleaned.count() == 1)  // both kept lines end in terminal punctuation
  }
}
