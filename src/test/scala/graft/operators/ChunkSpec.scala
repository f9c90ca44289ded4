package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  test("split: overlap windows, short tail, token-less docs vanish, narrow plan") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // single short chunk
      (3L, ""),                                       // token-less -> no rows
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Chunk.split(df, "text", chunkTokens = 4, overlap = 1)
    val rows = out.select($"doc_id", $"chunk_idx", $"chunk_tokens", $"chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // step 3: starts 0,3,6,9 -> windows of 4,4,4,1
    assert(rows.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)) == Seq(
      (0L, 4L, "t1 t2 t3 t4"), (1L, 4L, "t4 t5 t6 t7"),
      (2L, 4L, "t7 t8 t9 t10"), (3L, 1L, "t10")))
    assert(rows.filter(_._1 == 2L) == Seq((2L, 0L, 2L, "a b")))
    assert(!rows.exists(r => r._1 == 3L || r._1 == 4L))
    // every token of doc 1 is covered at least once
    val covered = rows.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
    val shuffles = collectPlan(out.queryExecution.executedPlan) {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, s"chunking must be narrow: $shuffles")
  }

  test("charStats: hand-computed counts and Simpson diversity") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = Seq((1L, "aabb"), (2L, "abcd"), (3L, "aaaa"), (4L, ""))
      .toDF("id", "text")
      .withColumn("cs", call_function(graft.functions.CharStats.name, $"text"))
      .select($"id", $"cs.total_chars", $"cs.distinct_chars", $"cs.char_diversity")
    val m = df.as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(1L) == ((4L, 2L, 1.0 - 8.0 / 16)))   // 2*2^2 / 4^2
    assert(m(2L) == ((4L, 4L, 1.0 - 4.0 / 16)))
    assert(m(3L) == ((4L, 1L, 0.0)))              // 1 - 16/16
    assert(m(4L) == ((0L, 0L, 0.0)))
  }

  test("packSequences: hand-computed GPT-style layout, boundary crossing, EOS-only empties") {
    import org.apache.spark.sql.functions._
    // concat in id order with eos = 0:
    //   [1,2,3,0] ++ [4,5,0] ++ [0] = [1,2,3,0,4,5,0,0]
    // L = 4 -> seq0 = [1,2,3,0], seq1 = [4,5,0,0]
    val docs = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(4, 5)), (3L, Seq.empty[Int]))
      .toDF("doc_id", "token_ids")
    val got = Chunk.packSequences(docs, "doc_id", "token_ids",
        seqLen = 4, eosId = 0)
      .orderBy($"seq_id")
      .as[(Long, Long, Seq[Int], Seq[Int])].collect().toSeq
    assert(got == Seq(
      (0L, 4L, Seq(1, 2, 3, 0), Seq(4)),       // all of doc 1
      (1L, 4L, Seq(4, 5, 0, 0), Seq(3, 1))),   // doc 2 + empty doc 3's EOS
      s"got $got")

    // a document longer than L spans sequences mid-run; the corpus tail
    // may run short; the concatenation round-trips exactly
    val docs2 = Seq(
      (1L, Seq(10, 11, 12, 13, 14, 15)), // spans seq0 and seq1
      (2L, Seq(20)))
      .toDF("doc_id", "token_ids")
    val got2 = Chunk.packSequences(docs2, "doc_id", "token_ids",
        seqLen = 4, eosId = -1)
      .orderBy($"seq_id")
      .as[(Long, Long, Seq[Int], Seq[Int])].collect().toSeq
    // concat: [10,11,12,13,14,15,-1] ++ [20,-1] = 9 ids -> 4 + 4 + 1
    assert(got2.map(_._3).flatten ==
      Seq(10, 11, 12, 13, 14, 15, -1, 20, -1), s"got $got2")
    assert(got2.map(_._2) == Seq(4L, 4L, 1L))
    assert(got2.map(_._1) == Seq(0L, 1L, 2L))
    // boundary metadata: seq1 = doc1's tail (3) + doc2's head (1)
    assert(got2.map(_._4) == Seq(Seq(4), Seq(3, 1), Seq(1)), s"got $got2")

    // corpus-scale: every id lands exactly once, in order
    val d = graft.Tables.load(spark, sf(), "documents").limit(100)
    val enc = graft.operators.Tokenizer
      .encode(d, "text", graft.queries.IncrementalOps.Merges)
      .select($"doc_id", $"token_ids").localCheckpoint()
    val packed = Chunk.packSequences(enc, "doc_id", "token_ids",
      seqLen = 256, eosId = 0)
    val flat = packed.orderBy($"seq_id")
      .select($"seq_id", $"n_ids", $"ids")
      .as[(Long, Long, Seq[Int])].collect().flatMap(_._3).toSeq
    val expected = enc.orderBy($"doc_id")
      .as[(Long, Seq[Int])].collect().flatMap(r => r._2 :+ 0).toSeq
    assert(flat == expected, "packing must be the exact concatenation recut")
    assert(packed.filter($"n_ids" =!= 256).count() <= 1,
      "only the corpus tail may run short")
  }

  test("bySentence: greedy packing at sentence boundaries, hand-computed") {
    import spark.implicits._
    // sentence token counts 3, 2, 4, 2 at budget 5: 3+2 fits (5), the
    // 4 opens a new chunk, 4+2 = 6 > 5 so the 2 opens a third
    val d = Seq((1L,
      "One two three. Four five! Six seven eight nine? Ten eleven."))
      .toDF("doc_id", "text")
    val got = Chunk.bySentence(d, "text", maxTokens = 5,
      maxSentenceTokens = 5)
      .orderBy($"chunk_idx")
      .select($"chunk_idx", $"chunk_tokens", $"chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (0L, 5L, "One two three. Four five!"),
      (1L, 4L, "Six seven eight nine?"),
      (2L, 2L, "Ten eleven.")))
  }

  test("bySentence: overlong sentences force-split into " +
      "maxSentenceTokens runs; no chunk ever exceeds the budget") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f g")).toDF("doc_id", "text") // one 7-token sentence
    val got = Chunk.bySentence(d, "text", maxTokens = 3,
      maxSentenceTokens = 3)
      .orderBy($"chunk_idx").select($"chunk_text").as[String].collect()
    assert(got.toSeq === Seq("a b c", "d e f", "g"))
    // budget property over real docs with injected punctuation
    val docs = graft.Tables.load(spark, sf(), "documents")
      .withColumn("text", regexp_replace($"text", "\\bthe\\b", "the."))
    val chunks = Chunk.bySentence(docs, "text", maxTokens = 48,
      maxSentenceTokens = 16)
    assert(chunks.filter($"chunk_tokens" > 48).count() === 0)
    // mass conservation: every token lands in exactly one chunk
    val total = docs
      .select(sum(size(graft.functions.Text.tokens($"text")))).head().getLong(0)
    assert(chunks.agg(sum($"chunk_tokens")).head().getLong(0) === total)
  }

  test("bySentence: differential vs an independent Scala re-implementation " +
      "over punctuated fixture docs") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf(), "documents")
      .withColumn("text", regexp_replace($"text", "\\bthe\\b", "the."))
      .limit(50)
    val got = Chunk.bySentence(docs, "text", maxTokens = 48,
      maxSentenceTokens = 16)
      .select($"doc_id", $"chunk_idx", $"chunk_text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val expected = docs.select($"doc_id", $"text").collect().flatMap { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val sents = text.replaceAll("([.!?])\\s+", "$1\u001f").split('\u001f')
        .map(_.split("\\s+").filter(_.nonEmpty)).filter(_.nonEmpty)
      val pieces = sents.flatMap(_.grouped(16))
      val chunks = pieces.foldLeft(List.empty[Array[String]]) { (acc, p) =>
        acc match {
          case h :: t if h.length + p.length <= 48 => (h ++ p) :: t
          case _ => p :: acc
        }
      }.reverse
      chunks.zipWithIndex.map { case (c, i) =>
        (id, i.toLong) -> c.mkString(" ") }
    }.toMap
    assert(got === expected)
  }

  test("bySentence: token-less and null docs produce no chunks; " +
      "fail-fast on bad budgets") {
    import spark.implicits._
    val d = Seq((1L, Some("   ")), (2L, Option.empty[String]),
      (3L, Some("ok fine."))).toDF("doc_id", "text")
    val got = Chunk.bySentence(d, "text", 8, 8)
    assert(got.select($"doc_id").as[Long].collect().toSeq === Seq(3L))
    intercept[IllegalArgumentException](Chunk.bySentence(d, "text", 0, 1))
    intercept[IllegalArgumentException](Chunk.bySentence(d, "text", 8, 9))
  }
}
