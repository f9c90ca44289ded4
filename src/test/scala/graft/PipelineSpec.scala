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

  test("scrub / repetitionGate / dropBoilerplate / dedupSpans stages " +
      "delegate with their params (round-12 recipe extension)") {
    val d = Tables.load(spark, sf(), "documents")
    def same(cfg: String, want: org.apache.spark.sql.DataFrame): Unit = {
      val got = Pipeline.run(spark, sf(), cfg)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"config run must equal the hand-written call for:\n$cfg")
    }
    same("read table=documents\nscrub\n",
      operators.Scrub.scrubPii(d, "text"))
    same("read table=documents\n" +
        "repetitionGate n=2 maxDupFraction=0.9 maxTopFraction=0.9\n",
      operators.Repetition.filter(d, "text", 2, 0.9, 0.9))
    same("read table=documents\ndropBoilerplate minDf=5\n",
      operators.LineFilter.dropBoilerplate(d, "text", "doc_id", 5))
    same("read table=documents\ndedupSpans w=5 minKept=10\n",
      operators.Spans.removeDupSpans(d, "text", "doc_id", 5)
        .withColumnRenamed("clean_text", "text").filter($"n_kept" >= 10))
    same("read table=documents\nsample rate=0.25 salt=r12\n",
      operators.Mix.sampleByHash(d, "doc_id", 0.25, "r12"))
    same("read table=documents\nbalanceSources\n",
      operators.Mix.balanceSources(d, "doc_id", "source"))
  }

  test("decontam stage reads the benchmark table: self-benchmark drops " +
      "everything, an unrelated benchmark column keeps everything") {
    val d = Tables.load(spark, sf(), "documents")
    val self = Pipeline.run(spark, sf(),
      "read table=documents\ndecontam table=documents n=13 threshold=0.01\n")
    val wantSelf = operators.Decontam.decontaminate(d,
      d.select($"text"), "text", "doc_id", 13, 0.01)
    // every doc with >= 13 tokens overlaps itself; shorter docs carry no
    // 13-gram and survive by the gram-less convention
    assert(self.count() < d.count(),
      "docs long enough to carry a 13-gram must fall to self-decontam")
    assert(self.exceptAll(wantSelf).isEmpty &&
      wantSelf.exceptAll(self).isEmpty)
    val other = Pipeline.run(spark, sf(),
      "read table=documents\ndecontam table=documents textCol=source n=2\n")
    val wantOther = operators.Decontam.decontaminate(d,
      d.select($"source".as("text")), "text", "doc_id", 2, 0.01)
    assert(other.count() === d.count(),
      "single-word source values share no 2-gram with any document")
    assert(other.exceptAll(wantOther).isEmpty &&
      wantOther.exceptAll(other).isEmpty)
  }

  test("qualityGate stage trains in-run == hand-written Classifier " +
      "train + gate, on both 0/1 labelCol and labelTrue binarization") {
    // separable toy corpus: the gate must keep exactly the good docs
    val docs = Seq(
      (1L, "informative prose with careful structured argument and depth", 1, "good"),
      (2L, "careful structured writing with informative detailed analysis", 1, "good"),
      (3L, "detailed argument and prose with structured informative depth", 1, "good"),
      (4L, "buy cheap pills now click here win money fast", 0, "spam"),
      (5L, "click now win cheap money fast buy pills here", 0, "spam"),
      (6L, "cheap money now buy click pills fast win here", 0, "spam")
    ).toDF("doc_id", "text", "label", "cat")
    val dir = java.nio.file.Files.createTempDirectory("pipeline_qg").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val got = Pipeline.run(spark, dir,
      "read table=documents\n" +
        "qualityGate labelCol=label dim=32 iterations=20 tau=0.5\n")
    val model = operators.Classifier.train(
      d.withColumn("__qg_label", $"label"), "text", "__qg_label",
      "doc_id", dim = 32, iterations = 20)
    val want = operators.Classifier.gate(d, "text", "doc_id",
      model.weights, model.bias, dim = 32, tau = 0.5)
    assert(got.select($"doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L),
      "the trained gate must keep exactly the quality docs")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(!got.columns.contains("__qg_label"),
      "the derived training label must not leak into the output")
    // labelTrue binarizes a categorical column to the same gate
    val got2 = Pipeline.run(spark, dir,
      "read table=documents\n" +
        "qualityGate labelCol=cat labelTrue=good dim=32 iterations=20 tau=0.5\n")
    assert(got2.exceptAll(got).isEmpty && got.exceptAll(got2).isEmpty)
  }

  test("decontamIds stage gates in model-token space with the run's " +
      "own merges; requires a preceding tokenize") {
    val d = Tables.load(spark, sf(), "documents")
    // self-benchmark in ID space: every doc with >= 13 token ids drops,
    // shorter docs are gram-less and pass — the q118 criterion from config
    val got = Pipeline.run(spark, sf(),
      "read table=documents\ntokenize merges=12\n" +
        "decontamIds table=documents n=13 threshold=0.01\n")
    val ms = operators.Bpe.train(d, "text", numMerges = 12)
      ._1.map(m => (m._2, m._3))
    val enc = operators.Tokenizer.encode(d, "text", ms)
    val want = operators.Decontam.decontaminateIds(
      enc, enc.select($"text", $"token_ids"), "token_ids", 13, 0.01)
    assert(got.count() < d.count(),
      "docs long enough to carry a 13-id-gram must fall to self-decontam")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val ex = intercept[IllegalArgumentException] {
      Pipeline.run(spark, sf(),
        "read table=documents\ndecontamIds table=documents\n")
    }
    assert(ex.getMessage.contains("tokenize"),
      s"must demand the shared-merges invariant: ${ex.getMessage}")
  }

  test("tokenize + shards stages: in-run BPE == hand-trained merges; " +
      "shard manifest == hand-written writeShards") {
    val d = Tables.load(spark, sf(), "documents")
    val dirA = java.nio.file.Files.createTempDirectory("pipeline_shards_a").toString
    val got = Pipeline.run(spark, sf(),
      s"read table=documents\ntokenize merges=12\n" +
        s"shards path=$dirA budget=4096 chunkTokens=64 overlap=16\n")
    val ms = operators.Bpe.train(d, "text", numMerges = 12)
      ._1.map(m => (m._2, m._3))
    val enc = operators.Tokenizer.encode(d, "text", ms)
    val dirB = java.nio.file.Files.createTempDirectory("pipeline_shards_b").toString
    val want = sinks.ShardWriter.writeShards(enc, "doc_id", "token_ids",
      dirB, budget = 4096L, chunkTokens = 64, overlap = 16)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "config-run shard manifest must equal the hand-written one")
  }

  test("runWithLedger: per-stage drop attribution sums to the corpus " +
      "loss; run and ledger-run agree on the final frame") {
    val cfg =
      """read table=documents
        |clean
        |exactDedup
        |nearDedup
        |dedupSpans w=10 minKept=10
        |split
        |""".stripMargin
    val (out, ledger) = Pipeline.runWithLedger(spark, sf(), cfg)
    val plain = Pipeline.run(spark, sf(), cfg)
    assert(out.exceptAll(plain).isEmpty && plain.exceptAll(out).isEmpty,
      "attribution must not change the pipeline's result")
    val total = Tables.load(spark, sf(), "documents").count()
    assert(ledger.count() === total - out.count(),
      "every lost document is attributed to exactly one stage")
    // per-stage counts equal the hand-computed survivor diffs
    val d = Tables.load(spark, sf(), "documents")
    val cleaned = d.withColumn("text", operators.Normalize.cleanText($"text"))
    val exact = operators.Dedup.exactByText(cleaned, "text", "doc_id")
    val near = operators.Dedup.pruneNearDups(exact, "text", "doc_id")
    val byStage = ledger.groupBy($"stage").count()
      .as[(String, Long)].collect().toMap
    assert(byStage.getOrElse("exactDedup", 0L) ===
      cleaned.count() - exact.count())
    assert(byStage.getOrElse("nearDedup", 0L) === exact.count() - near.count())
    assert(!byStage.contains("clean") && !byStage.contains("split"),
      "non-filtering stages must not appear in the ledger")
    // a dropped doc is attributed with the stage's config line number
    assert(ledger.filter($"stage" === "exactDedup" && $"line" =!= 3).isEmpty)
  }

  test("flagship: the q100 full pipeline is a config") {
    val got = Pipeline.run(spark, sf(),
      """read table=documents
        |clean
        |exactDedup
        |nearDedup
        |dedupSpans w=10 minKept=10
        |split
        |""".stripMargin)
      .select($"doc_id", $"n_kept", md5($"text").as("text_md5"), $"split")
    val want = SparkEntry.queries("q100_full_pipeline")(spark, sf())
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "the config must reproduce q100_full_pipeline exactly")
  }

  test("new stages fail fast on missing required params / unknown keys") {
    def bad(cfg: String): String =
      intercept[IllegalArgumentException](
        Pipeline.run(spark, sf(), cfg)).getMessage
    assert(bad("read table=documents\ndecontam n=13").contains("table="))
    assert(bad("read table=documents\nqualityGate dim=32")
      .contains("labelCol="))
    assert(bad("read table=documents\ntokenize merges=2\nshards budget=64")
      .contains("path="))
    assert(bad("read table=documents\nsample salt=x").contains("rate="))
    assert(intercept[IllegalArgumentException](Pipeline.parse(
      "read table=documents\nrepetitionGate ngram=2")).getMessage
      .contains("unknown repetitionGate param"))
  }

  test("examples/curation.cfg stays runnable (the README recipe)") {
    val cfg = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/curation.cfg")), "UTF-8")
    val (out, ledger) = Pipeline.runWithLedger(spark, sf(), cfg)
    assert(out.count() > 0, "the example recipe must keep documents")
    assert(out.columns.contains("split") && out.columns.contains("token_ids"))
    assert(ledger.count() ===
      Tables.load(spark, sf(), "documents").count() - out.count())
  }

  test("examples/rag_chunks.cfg stays runnable (the RAG-ingest recipe)") {
    val cfg = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/rag_chunks.cfg")), "UTF-8")
    val out = Pipeline.run(spark, sf(), cfg)
    assert(out.columns.contains("chunk_idx") &&
      out.columns.contains("chunk_tokens"))
    // chunking multiplies rows past the 400-doc weighted subsample
    assert(out.select($"doc_id").distinct().count() <= 400)
    assert(out.count() > out.select($"doc_id").distinct().count())
    // every chunk respects the 64-token budget
    assert(out.filter($"chunk_tokens" > 64).isEmpty)
  }

  test("examples/versioned_curation.cfg stays runnable (the snapshot " +
    "hand-off recipe)") {
    val table = "/tmp/graft_curated_table"
    val root = new org.apache.hadoop.fs.Path(table)
    root.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(root, true)
    val cfg = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/versioned_curation.cfg")), "UTF-8")
    val out = Pipeline.run(spark, sf(), cfg)
    assert(out.count() > 0 && out.columns.contains("bucket"))
    // the commit landed, and a readSnapshot run starts from it
    val snaps = graft.sinks.Snapshots.versions(spark, table)
    assert(snaps.map(_.op) == Seq("overwrite"))
    val reread = Pipeline.run(spark, sf(), s"readSnapshot path=$table")
    assert(reread.count() == out.count())
  }

  test("examples/crawl_refresh.cfg stays runnable (archive-to-archive " +
    "curation over string record ids)") {
    // build the demo archive the config's readWarc path names
    val arch = "/tmp/graft_example_arch"
    val docs = (1 to 150).map { i =>
      val host = if (i % 5 == 0) "spam.example" else "good.example"
      val text = if (i % 7 == 0) "tiny" // under minTokens
        else s"document number $i with enough distinct words to pass " +
          s"gates ${i * 3} ${i * 7}"
      (s"https://$host/p/$i", s"<urn:ex:$i>", text)
    }.toDF("url", "record_id", "text")
      .select($"url", lit("2026-01-01 00:00:00").cast("timestamp")
        .as("warc_date"), $"record_id", lit(200).as("http_status"),
        encode($"text", "UTF-8").as("body"))
    sinks.WarcSink.write(docs.repartition(3, $"record_id"), arch,
      gzip = true)
    val cfg = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/crawl_refresh.cfg")), "UTF-8")
    val out = Pipeline.run(spark, sf(), cfg)
    // spam domain gated, tiny docs gated, 100-doc weighted subsample
    assert(out.count() === 100)
    assert(out.filter($"url".contains("spam.example")).isEmpty)
    // the curated archive reads back with the provenance leader
    val back = spark.read.format("graft-warc")
      .load("/tmp/graft_example_curated")
    assert(back.filter($"warc_type" === "response").count() === 100)
    assert(back.filter($"warc_type" === "warcinfo").count() > 0)
  }

  test("detokenize stage: tokenize -> detokenize renders the ORIGINAL " +
    "text back under the run's own merges; requires a prior tokenize") {
    val got = Pipeline.run(spark, sf(),
      "read table=documents\ntokenize merges=16\ndetokenize outCol=rt")
    assert(got.filter($"rt".isNull || $"rt" =!= $"text").isEmpty,
      "the config-level round trip must be lossless on every document")
    // default outCol rebinds the text column itself
    val rebound = Pipeline.run(spark, sf(),
      "read table=documents\ntokenize merges=16\ndetokenize")
    assert(rebound.columns.contains("text") &&
      rebound.filter($"text".isNull).isEmpty)
    // fail fast: no tokenize stage first
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\ndetokenize")).getMessage
      .contains("requires a tokenize stage"))
  }

  test("tokenBudget stage == hand-written q196 recipe; fail-fast params") {
    val got = Pipeline.run(spark, sf(),
      "read table=documents\ntokenBudget budget=10000")
    val tk = functions.Text.tokens(col("text"))
    val scored = Tables.load(spark, sf(), "documents")
      .withColumn("__tb_n", size(tk).cast("long"))
      .withColumn("__tb_s", size(array_distinct(tk)).cast("double") / size(tk))
      .filter(col("__tb_n") > 0)
    val hand = operators.Mix.selectByTokenBudget(scored, "__tb_s", "__tb_n",
      "doc_id", 10000L).drop("__tb_n", "__tb_s")
    assert(got.count() > 0 &&
      got.count() < Tables.load(spark, sf(), "documents").count())
    assert(got.exceptAll(hand).isEmpty && hand.exceptAll(got).isEmpty)
    // scoreCol= overrides the TTR proxy (n_chars: longest docs win)
    val byChars = Pipeline.run(spark, sf(),
      "read table=documents\ntokenBudget budget=10000 scoreCol=n_chars")
    assert(byChars.agg(min(col("n_chars"))).head().getLong(0) >
      got.agg(min(length(col("text")))).head().getInt(0),
      "char-scored selection prefers long documents")
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\ntokenBudget scoreCol=n_chars")).getMessage
      .contains("needs budget="))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\ntokenBudget budget=10 scoreCol=nope"))
      .getMessage.contains("column 'nope' not in the frame"))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\ntokenBudget budget=ten")).getMessage
      .contains("must be an integer"))
  }

  test("unimaxSelect stage == the hand-written q198 composition") {
    val got = Pipeline.run(spark, sf(),
      "read table=documents\nunimaxSelect byCol=lang avgEpochs=0.5 maxEpochs=1.0")
    val tk = functions.Text.tokens(col("text"))
    val scored = Tables.load(spark, sf(), "documents")
      .withColumn("__ub_n", size(tk).cast("long"))
      .withColumn("__ub_s", size(array_distinct(tk)).cast("double") / size(tk))
      .filter(col("__ub_n") > 0)
    val budgets = operators.Mix
      .unimaxPlanBy(scored, "lang", col("__ub_n"), 0.5, 1.0)
      .select(col("lang"), floor(col("alloc")).cast("long").as("__ub_budget"))
    val hand = operators.Mix.selectByTokenBudgetByGroup(scored, "lang",
        "__ub_s", "__ub_n", "doc_id", budgets, "__ub_budget")
      .drop("__ub_n", "__ub_s")
    assert(got.count() > 0 &&
      got.count() < Tables.load(spark, sf(), "documents").count())
    assert(got.exceptAll(hand).isEmpty && hand.exceptAll(got).isEmpty)
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nunimaxSelect byCol=nope")).getMessage
      .contains("column 'nope' not in the frame"))
  }

  test("report stage publishes the card at its point in the chain, " +
    "passes the frame through, and validates dimension columns") {
    val pre = java.nio.file.Files.createTempDirectory("card_pre").toString
    val post = java.nio.file.Files.createTempDirectory("card_post").toString
    val cfg =
      s"""read   table=documents
         |report path=$pre langCol=lang sourceCol=source
         |minTokens n=30
         |report path=$post langCol=lang sourceCol=source
         |""".stripMargin
    val out = Pipeline.run(spark, sf(), cfg)
    val before = spark.read.parquet(pre)
    val after = spark.read.parquet(post)
    // cards == hand-written builds over the same frames
    val docs = Tables.load(spark, sf(), "documents")
    val handBefore = operators.CorpusReport.build(docs, "text", "doc_id",
      Some("lang"), Some("source"))
    assert(before.exceptAll(handBefore).isEmpty &&
      handBefore.exceptAll(before).isEmpty)
    // the post-gate card counted the SURVIVING frame
    def nDocs(card: org.apache.spark.sql.DataFrame): Double =
      card.filter(col("section") === "corpus" && col("key") === "n_docs")
        .head().getDouble(2)
    assert(nDocs(after) === out.count().toDouble)
    assert(nDocs(before) > nDocs(after), "the gate must bite")
    // the two parquet cards diff offline (the q195 read)
    val d = operators.CorpusReport.diff(before, after)
    assert(d.filter(col("section") === "corpus" && col("key") === "n_docs")
      .head().getDouble(4) === out.count().toDouble - docs.count().toDouble)
    // fail fast: missing path, dimension column not in the frame
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nreport langCol=lang")).getMessage
      .contains("report needs path="))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      s"read table=documents\nreport path=$pre langCol=nope")).getMessage
      .contains("column 'nope' not in the frame"))
  }

  test("URL-curation stages: deriveUrl + blockDomains + domainQuality == " +
    "the hand-written q202/q203 recipes, composed ahead of exactDedup") {
    val docs = Tables.load(spark, sf(), "documents")
    val url = concat(lit("https://"), lower($"source"), lit("."), $"lang",
      lit(".example.org/p/"), $"doc_id".cast("string"))
    // blockDomains == dropBlockedDomains over the derived URL (q202's
    // blocklist: one exact host, one parent suffix taking a subtree)
    val gotBlock = Pipeline.run(spark, sf(),
      "read table=documents\nderiveUrl\n" +
        "blockDomains domains=de.example.org,src3.en.example.org")
    val handBlock = operators.UrlOps.dropBlockedDomains(
      docs.withColumn("url", url), "url", "doc_id",
      Seq("de.example.org", "src3.en.example.org").toDF("domain"))
    assert(gotBlock.count() > 0 && gotBlock.count() < docs.count(),
      "the blocklist must bite")
    assert(gotBlock.exceptAll(handBlock).isEmpty &&
      handBlock.exceptAll(gotBlock).isEmpty)
    // domainQuality == keepDomainsByMean at the q203 stat (token count)
    val gotQ = Pipeline.run(spark, sf(),
      "read table=documents\nderiveUrl\ndomainQuality minMean=55 minDocs=3")
    val handQ = operators.UrlOps.keepDomainsByMean(
      docs.withColumn("url", url)
        .withColumn("__dq_n",
          size(functions.Text.tokens($"text")).cast("long")),
      "url", "__dq_n", 55.0, 3L).drop("__dq_n")
    assert(gotQ.count() > 0 && gotQ.count() < docs.count(),
      "the origin cut must bite")
    assert(gotQ.exceptAll(handQ).isEmpty && handQ.exceptAll(gotQ).isEmpty)
    // composed crawl-curation config: gates ahead of exactDedup, with a
    // table-sourced blocklist unioned into the literals. Tables.load
    // resolves names under baseDir, so stage docs + blocklist together.
    val composedDir = java.nio.file.Files.createTempDirectory("urlcur").toString
    docs.write.mode("overwrite").parquet(s"$composedDir/documents.parquet")
    Seq("src1.es.example.org").toDF("domain")
      .write.mode("overwrite").parquet(s"$composedDir/blocklist.parquet")
    val composed = Pipeline.run(spark, composedDir,
      """read table=documents
        |deriveUrl
        |blockDomains domains=de.example.org table=blocklist
        |domainQuality minMean=40 minDocs=2
        |exactDedup
        |""".stripMargin)
    val handComposed = {
      val b = operators.UrlOps.dropBlockedDomains(
        docs.withColumn("url", url), "url", "doc_id",
        Seq("src1.es.example.org", "de.example.org").toDF("domain"))
      val q = operators.UrlOps.keepDomainsByMean(
        b.withColumn("__dq_n",
          size(functions.Text.tokens($"text")).cast("long")),
        "url", "__dq_n", 40.0, 2L).drop("__dq_n")
      operators.Dedup.exactByText(q, "text", "doc_id")
    }
    assert(composed.count() > 0 && composed.count() < docs.count())
    assert(composed.exceptAll(handComposed).isEmpty &&
      handComposed.exceptAll(composed).isEmpty)
    // fail-fast matrix
    def bad(cfg: String): String =
      intercept[IllegalArgumentException](
        Pipeline.run(spark, sf(), cfg)).getMessage
    assert(bad("read table=documents\nblockDomains domains=a.com")
      .contains("'url' not in the frame"))
    assert(bad("read table=documents\nderiveUrl\nblockDomains")
      .contains("domains= and/or table="))
    assert(bad("read table=documents\nderiveUrl\ndomainQuality minDocs=2")
      .contains("needs minMean="))
    assert(bad("read table=documents\nderiveUrl\ndomainQuality minMean=40 " +
      "valueCol=nope").contains("column 'nope' not in the frame"))
    assert(intercept[IllegalArgumentException](Pipeline.parse(
      "read table=documents\nblockDomains hosts=a.com")).getMessage
      .contains("unknown blockDomains param"))
  }

  test("checks stage: a green gate passes the frame through untouched, " +
    "a red one dies naming the constraint, malformed specs fail fast") {
    val docs = Tables.load(spark, sf(), "documents")
    // green: == the hand-written assertAll passthrough
    val got = Pipeline.run(spark, sf(),
      "read table=documents\n" +
        "checks spec=complete:text:1.0,unique:doc_id:1.0," +
        "between:n_chars:1:100000,mean:n_chars:10:10000\n" +
        "minTokens n=5")
    val hand = operators.Checks.assertAll(docs, Seq(
      operators.Checks.Complete("text", 1.0),
      operators.Checks.Unique("doc_id", 1.0),
      operators.Checks.ValuesBetween("n_chars", 1, 100000),
      operators.Checks.MeanBetween("n_chars", 10, 10000)))
      .filter(size(functions.Text.tokens(col("text"))) >= 5)
    assert(got.exceptAll(hand).isEmpty && hand.exceptAll(got).isEmpty)
    // red: the run dies HERE, naming the failed constraint + observation
    val e = intercept[IllegalStateException](Pipeline.run(spark, sf(),
      "read table=documents\nchecks spec=unique:lang:0.5"))
    assert(e.getMessage.contains("unique(lang)"))
    // fail fast at build time: missing spec, unknown kind, bad arity,
    // non-number, unknown param
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nchecks")).getMessage
      .contains("checks needs spec="))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nchecks spec=regex:lang:0.9")).getMessage
      .contains("malformed checks entry"))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nchecks spec=between:n_chars:1")).getMessage
      .contains("malformed checks entry"))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nchecks spec=complete:text:high")).getMessage
      .contains("not a number"))
    assert(intercept[IllegalArgumentException](Pipeline.parse(
      "read table=documents\nchecks list=complete:text:1")).getMessage
      .contains("unknown checks param"))
  }

  test("checks regex= door: anchored pattern with ':' in the tail; " +
    "quoted values carry whitespace; malformed values fail fast") {
    // the pattern is everything after the second ':' — the 'https://'
    // colon-slashes are data, not delimiters
    val got = Pipeline.run(spark, sf(),
      "read table=documents\nderiveUrl\n" +
        "checks spec=complete:url:1.0 " +
        "regex=url:1.0:https://[a-z0-9]+\\.[a-z]+\\.example\\.org/p/[0-9]+\n")
    assert(got.count() > 0)
    // == the hand-written constraint
    val docs = Tables.load(spark, sf(), "documents")
    val hand = operators.Checks.assertAll(
      Pipeline.run(spark, sf(), "read table=documents\nderiveUrl"),
      Seq(operators.Checks.MatchesRegex("url",
        "https://[a-z0-9]+\\.[a-z]+\\.example\\.org/p/[0-9]+", 1.0)))
    assert(got.exceptAll(hand).isEmpty && hand.exceptAll(got).isEmpty)
    // red: the gate dies naming the regex constraint
    val e = intercept[IllegalStateException](Pipeline.run(spark, sf(),
      "read table=documents\nderiveUrl\nchecks regex=url:1.0:ftp://.*"))
    assert(e.getMessage.contains("regex(url)"))
    // quoted value: whitespace inside the pattern survives tokenizing
    val st = Pipeline.parse(
      "read table=documents\nchecks regex=\"text:0.9:[a-z #]+\"").last
    assert(st.params("regex") === "text:0.9:[a-z #]+")
    // malformed: no pattern after the second ':', non-numeric fraction
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nchecks regex=text:1.0")).getMessage
      .contains("malformed regex= value"))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nchecks regex=text:high:x")).getMessage
      .contains("not a number"))
    assert(docs.columns.contains("text")) // fixture sanity
  }

  test("quote-aware tokenizer: quotes strip, '#' inside quotes is data, " +
    "unterminated quote fails naming the line") {
    val st = Pipeline.parse(
      "read table=documents\nwrite path=\"/data/my run#1\" table=out").last
    assert(st.params("path") === "/data/my run#1")
    assert(st.params("table") === "out")
    val e = intercept[IllegalArgumentException](Pipeline.parse(
      "read table=documents\nwrite path=\"unterminated"))
    assert(e.getMessage.contains("line 2") &&
      e.getMessage.contains("unterminated quote"))
  }

  test("chunkSentences stage == hand-written Chunk.bySentence with the " +
    "text column rebound; explode semantics multiply rows") {
    val got = Pipeline.run(spark, sf(),
      "read table=documents\nminTokens n=8\n" +
        "chunkSentences maxTokens=48 maxSentenceTokens=16")
    val d = Tables.load(spark, sf(), "documents")
      .filter(size(functions.Text.tokens($"text")) >= 8)
    val want = operators.Chunk.bySentence(d, "text",
        maxTokens = 48, maxSentenceTokens = 16)
      .withColumn("text", col("chunk_text")).drop("chunk_text")
    assert(got.count() > d.count(), "chunking must multiply rows")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.columns.contains("chunk_idx") &&
      got.columns.contains("chunk_tokens"))
    // fail fast: non-integer param, unknown key
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nchunkSentences maxTokens=many")).getMessage
      .contains("must be an integer"))
    assert(intercept[IllegalArgumentException](Pipeline.parse(
      "read table=documents\nchunkSentences overlap=2")).getMessage
      .contains("unknown chunkSentences param"))
  }

  test("weightedSample stage == hand-written TTR-weighted draw + " +
    "semi-join; scoreCol override; fail-fast") {
    val got = Pipeline.run(spark, sf(),
      "read table=documents\nweightedSample n=25")
    val d = Tables.load(spark, sf(), "documents")
    val tk = functions.Text.tokens($"text")
    val weighted = d.withColumn("__w",
      when(size(tk) > 0, size(array_distinct(tk)).cast("double") / size(tk)))
    val want = d.join(operators.Sample
        .weightedSample(weighted, "doc_id", "__w", n = 25)
        .select($"doc_id"), Seq("doc_id"), "left_semi")
    assert(got.count() === 25)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // scoreCol override rides an existing column
    val got2 = Pipeline.run(spark, sf(),
      "read table=documents\nweightedSample n=10 scoreCol=n_chars")
    assert(got2.count() === 10)
    // byCol= stratifies: n winners PER GROUP == the hand-written
    // grouped draw
    val got3 = Pipeline.run(spark, sf(),
      "read table=documents\nweightedSample n=5 byCol=lang")
    val want3 = d.join(operators.Sample
        .weightedSampleByGroup(weighted, Seq("lang"), "doc_id", "__w", n = 5)
        .select($"doc_id"), Seq("doc_id"), "left_semi")
    assert(got3.groupBy($"lang").count().select($"count").as[Long]
      .collect().forall(_ === 5))
    assert(got3.exceptAll(want3).isEmpty && want3.exceptAll(got3).isEmpty)
    // fail fast: missing n, unknown scoreCol, unknown byCol
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nweightedSample")).getMessage
      .contains("weightedSample needs n="))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nweightedSample n=5 scoreCol=nope"))
      .getMessage.contains("'nope' not in the frame"))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nweightedSample n=5 byCol=nope"))
      .getMessage.contains("byCol= column 'nope'"))
  }

  test("writeSnapshot/readSnapshot stages: config runs commit to and " +
    "curate from the versioned table") {
    val dir = java.nio.file.Files.createTempDirectory("pl_snap").toString
    new java.io.File(dir).delete()
    val d = Tables.load(spark, sf(), "documents")
    // run 1: the raw table committed as v1; run 2: a curated subset
    // appended as v2
    Pipeline.run(spark, sf(),
      s"read table=documents\nwriteSnapshot path=$dir mode=overwrite")
    Pipeline.run(spark, sf(),
      s"read table=documents\nminTokens n=40\nwriteSnapshot path=$dir")
    val snaps = graft.sinks.Snapshots.versions(spark, dir)
    assert(snaps.map(_.op) == Seq("overwrite", "append"))
    val curated = d.filter(size(functions.Text.tokens($"text")) >= 40)
    assert(graft.sinks.Snapshots.read(spark, dir).count() ==
      d.count() + curated.count())
    // readSnapshot: curate FROM the table; version= time-travels to
    // the raw commit
    val got = Pipeline.run(spark, sf(), s"readSnapshot path=$dir version=1")
      .select(d.columns.map(col): _*)
    assert(got.exceptAll(d).isEmpty && d.exceptAll(got).isEmpty)
    assert(Pipeline.run(spark, sf(), s"readSnapshot path=$dir").count() ==
      d.count() + curated.count())
    // fail-fast: missing path, bad version, bad mode
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "readSnapshot version=1")).getMessage.contains("needs path="))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      s"readSnapshot path=$dir version=latest")).getMessage
      .contains("must be an integer"))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      s"read table=documents\nwriteSnapshot path=$dir mode=replace"))
      .getMessage.contains("append or overwrite"))
  }

  test("readChanges stage: the nightly incremental run sees only the delta") {
    val dir = java.nio.file.Files.createTempDirectory("pl_cdc").toString
    new java.io.File(dir).delete()
    val d = Tables.load(spark, sf(), "documents")
    graft.sinks.Snapshots.writeOverwrite(d.where($"lang" =!= "de"), dir)
    graft.sinks.Snapshots.writeAppend(d.where($"lang" === "de"), dir)
    // cursor at v1: only the German append flows into the run
    val got = Pipeline.run(spark, sf(),
      s"readChanges path=$dir since=1\nminTokens n=8")
    val want = d.where($"lang" === "de")
      .filter(size(functions.Text.tokens($"text")) >= 8)
    assert(got.select(d.columns.map(col): _*).exceptAll(want).isEmpty &&
      want.exceptAll(got.select(d.columns.map(col): _*)).isEmpty)
    assert(got.columns.contains("_change_type") &&
      got.select($"_commit_version").distinct().as[Int].collect()
        .sameElements(Array(2)))
    // caught-up cursor: empty run, no failure
    assert(Pipeline.run(spark, sf(),
      s"readChanges path=$dir since=2").isEmpty)
    // fail-fast: missing since, bad types
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      s"readChanges path=$dir")).getMessage.contains("needs since="))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      s"readChanges path=$dir since=1 types=upsert")).getMessage
      .contains("insert and/or delete"))
  }

  test("scoreBuckets stage == hand-written per-language CCNet cut; " +
    "enrichment only; fail-fast") {
    val d = Tables.load(spark, sf(), "documents")
    // byCol= -> the per-language cut over an existing score column
    val got = Pipeline.run(spark, sf(),
      "read table=documents\nscoreBuckets n=3 scoreCol=n_chars byCol=lang")
    val want = operators.Quality.scoreBucketsBy(
      d.withColumn("__sb_s", col("n_chars")), "__sb_s", Seq("lang"), 3)
      .drop("__sb_s")
    assert(got.count() === d.count(), "enrichment stage drops no rows")
    assert(got.columns.contains("bucket"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // every language fills every bucket (the per-group contract)
    assert(got.groupBy($"lang").agg(countDistinct($"bucket").as("nb"))
      .select($"nb").as[Long].collect().forall(_ === 3L))
    // default score: the TTR proxy, global cut
    val got2 = Pipeline.run(spark, sf(),
      "read table=documents\nscoreBuckets n=4")
    assert(got2.select(max($"bucket")).as[Long].head() === 4L)
    // fail fast: bad n, unknown scoreCol/byCol, unknown param
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nscoreBuckets n=lots")).getMessage
      .contains("must be an integer"))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nscoreBuckets scoreCol=nope")).getMessage
      .contains("'nope' not in the frame"))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nscoreBuckets byCol=nope")).getMessage
      .contains("byCol= column 'nope'"))
    assert(intercept[IllegalArgumentException](Pipeline.parse(
      "read table=documents\nscoreBuckets salt=x")).getMessage
      .contains("unknown scoreBuckets param"))
  }

  test("robotsGate stage == the hand-written parseRobots + applyRobots " +
    "chain; fail-fast matrix") {
    val dir = java.nio.file.Files.createTempDirectory("pl_robots").toString
    val docs = Seq(
      (1L, "first page words here", "https://h.example/p/1"),
      (2L, "second page words here", "https://h.example/ok/2"),
      (3L, "third page words here", "https://other.example/p/1")
    ).toDF("doc_id", "text", "url")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq(("h.example", "User-agent: *\nDisallow: /p\n"))
      .toDF("host", "body")
      .write.mode("overwrite").parquet(s"$dir/robots.parquet")
    val got = Pipeline.run(spark, dir,
      "read table=documents\nrobotsGate table=robots")
    val want = operators.UrlOps.applyRobots(
      spark.read.parquet(s"$dir/documents.parquet"), "url", "doc_id",
      operators.UrlOps.parseRobots(
        spark.read.parquet(s"$dir/robots.parquet"), "host", "body"))
    assert(got.select($"doc_id").as[Long].collect().toSet === Set(2L, 3L))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // agent= selects the crawler's own groups: mybot's policy allows /p
    // on h.example while * stays blocked — the stage must route the
    // param through to parseRobots (case-insensitive)
    Seq(("h.example", "User-agent: *\nDisallow: /p\n\n" +
      "User-agent: mybot\nDisallow: /private\n"))
      .toDF("host", "body")
      .write.mode("overwrite").parquet(s"$dir/robots2.parquet")
    val asBot = Pipeline.run(spark, dir,
      "read table=documents\nrobotsGate table=robots2 agent=MyBot")
    assert(asBot.select($"doc_id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L), "the named agent's groups must override *")
    val asAny = Pipeline.run(spark, dir,
      "read table=documents\nrobotsGate table=robots2")
    assert(asAny.select($"doc_id").as[Long].collect().toSet ===
      Set(2L, 3L), "without agent= the * posture holds")
    // fail fast: missing table=, absent urlCol, robots table lacking cols
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, dir,
      "read table=documents\nrobotsGate")).getMessage
      .contains("robotsGate needs table="))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, dir,
      "read table=documents\nrobotsGate table=robots urlCol=nope"))
      .getMessage.contains("'nope' not in the frame"))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, dir,
      "read table=documents\nrobotsGate table=robots hostCol=origin"))
      .getMessage.contains("lacks column 'origin'"))
  }

  test("readWarc first stage: a config curates a crawl archive end to " +
    "end — responses only, URL gates on the archive's own urls") {
    val arch = java.nio.file.Files.createTempDirectory("pl_warc").toString +
      "/segs"
    val docs = Seq(
      ("https://good.example/a", "<urn:w:1>", "alpha beta gamma delta"),
      ("https://good.example/b", "<urn:w:2>", "epsilon zeta eta theta"),
      ("https://spam.example/x", "<urn:w:3>", "iota kappa lambda mu"),
      ("https://good.example/c", "<urn:w:4>", "nu xi")
    ).toDF("url", "record_id", "text")
      .select($"url", lit("2026-01-01 00:00:00").cast("timestamp")
        .as("warc_date"), $"record_id", lit(200).as("http_status"),
        encode($"text", "UTF-8").as("body"))
    sinks.WarcSink.write(docs.repartition(2), arch, gzip = true)
    val got = Pipeline.run(spark, sf(),
      s"readWarc path=$arch\nblockDomains domains=spam.example\nminTokens n=3")
    // == the hand-written chain over the same archive
    val hand = operators.UrlOps.dropBlockedDomains(
      spark.read.format("graft-warc").load(arch)
        .filter($"warc_type" === "response")
        .select($"record_id".as("doc_id"), decode($"body", "UTF-8")
          .as("text"), $"url", $"warc_date", $"http_status"),
      "url", "doc_id", Seq("spam.example").toDF("domain"))
      .filter(size(functions.Text.tokens($"text")) >= 3)
    assert(got.exceptAll(hand).isEmpty && hand.exceptAll(got).isEmpty)
    assert(got.count() === 2) // spam.example gated, 'nu xi' under 3 tokens
    assert(got.columns.contains("url") && got.columns.contains("doc_id"))
    // fail fast: missing path, readWarc not-first, unknown type list
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "readWarc")).getMessage.contains("readWarc needs path="))
    assert(intercept[IllegalArgumentException](Pipeline.parse(
      s"read table=documents\nreadWarc path=$arch")).getMessage
      .contains("only as the first stage"))
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      s"readWarc path=$arch types=,")).getMessage
      .contains("at least one record type"))
    // archive-to-archive: writeWarc re-serializes the surviving frame,
    // and reading the CURATED archive back equals the pipeline output
    val out = java.nio.file.Files.createTempDirectory("pl_warc_out")
      .toString + "/curated"
    val got2 = Pipeline.run(spark, sf(),
      s"readWarc path=$arch\nblockDomains domains=spam.example\n" +
        s"minTokens n=3\nwriteWarc path=$out")
    val back = spark.read.format("graft-warc").load(out)
      .select($"record_id".as("doc_id"), decode($"body", "UTF-8")
        .as("text"), $"url", $"warc_date", $"http_status")
    assert(back.exceptAll(got2).isEmpty && got2.exceptAll(back).isEmpty)
    // strict provenance: a frame without url/date columns fails fast
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      s"read table=documents\nwriteWarc path=$out")).getMessage
      .contains("writeWarc column 'url' not in the frame"))
    // warcinfo=true opens each curated segment with the provenance
    // leader; the responses-only read is unchanged
    val out3 = java.nio.file.Files.createTempDirectory("pl_warc_info")
      .toString + "/curated"
    Pipeline.run(spark, sf(),
      s"readWarc path=$arch\nwriteWarc path=$out3 warcinfo=true")
    val re3 = spark.read.format("graft-warc").load(out3)
    assert(re3.filter($"warc_type" === "warcinfo").count() > 0)
    assert(re3.filter($"warc_type" === "response").count() === 4)
  }

  test("fetchWarc stage: a config rehydrates a curated cc-index slice " +
    "by random access == the hand-written WarcFetch chain") {
    val base = java.nio.file.Files.createTempDirectory("pl_fetch").toString
    val arch = s"$base/segs"
    val docs = (1 to 9).map(i => (s"https://f.example/$i", s"<urn:pf:$i>",
        s"words for doc $i here"))
      .toDF("url", "record_id", "text")
      .select($"url", lit("2026-01-01 00:00:00").cast("timestamp")
        .as("warc_date"), $"record_id", lit(200).as("http_status"),
        encode($"text", "UTF-8").as("body"))
    sinks.WarcSink.write(docs.repartition(2, $"record_id"), arch,
      gzip = true)
    // the persisted cc-index fixture a curation run would start from —
    // curated down to three records
    spark.read.format("graft-warc").load(arch)
      .select($"record_id", $"url", $"record_file", $"record_offset")
      .filter($"record_id".rlike(":(2|5|8)>$"))
      .write.mode("overwrite").parquet(s"$base/ccindex.parquet")
    val got = Pipeline.run(spark, base,
      "read table=ccindex\nfetchWarc\nminTokens n=3")
    val hand = graft.sources.warc.WarcFetch.fetch(
      spark.read.parquet(s"$base/ccindex.parquet"))
      .select($"record_id".as("doc_id"),
        decode($"body", "UTF-8").as("text"),
        $"url", $"warc_date", $"http_status")
      .filter(size(functions.Text.tokens($"text")) >= 3)
    assert(got.count() === 3)
    assert(got.exceptAll(hand).isEmpty && hand.exceptAll(got).isEmpty)
    assert(got.columns.contains("doc_id") && got.columns.contains("text"))
    // fail fast: a frame without the cc-index key columns
    assert(intercept[IllegalArgumentException](Pipeline.run(spark, sf(),
      "read table=documents\nfetchWarc")).getMessage
      .contains("fetchWarc needs column 'record_file'"))
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
