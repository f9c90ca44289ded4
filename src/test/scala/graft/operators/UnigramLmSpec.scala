package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{GraftFunctions, UnigramOps}
import org.apache.spark.unsafe.types.UTF8String

/** UnigramLm: the Viterbi kernel against brute-force enumeration (the
  * same differential the DuckDB oracle runs at query scale), EM
  * mechanics on a hand-checkable corpus, and the determinism contract
  * (exact dyadic ties, lexicographic tie-break, char coverage). */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.ensureRegistered(spark)

  private def model(pieces: (String, Double)*): UnigramOps.Model = {
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      pieces.map(p => UTF8String.fromString(p._1): Any).toArray)
    val lps = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      pieces.map(_._2: Any).toArray)
    UnigramOps.buildModel(arr, lps)
  }

  private def seg(word: String, m: UnigramOps.Model): Option[Seq[String]] =
    Option(UnigramOps.segment(UTF8String.fromString(word), m))
      .map(a => (0 until a.numElements()).map(a.getUTF8String(_).toString))

  /** All segmentations of `word` over the model's pieces, scored by the
    * same left-fold sum — the oracle's recursive-CTE enumeration. */
  private def enumerate(word: String, pieces: Map[String, Double])
      : Seq[(Double, String)] = {
    def go(pos: Int, score: Double, path: String): Seq[(Double, String)] =
      if (pos == word.length) Seq((score, path))
      else (1 to (word.length - pos)).flatMap { l =>
        pieces.get(word.substring(pos, pos + l)).toSeq.flatMap { lp =>
          go(pos + l, score + lp,
            if (path.isEmpty) word.substring(pos, pos + l)
            else path + " " + word.substring(pos, pos + l))
        }
      }
    go(0, 0.0, "")
  }

  test("kernel == brute-force enumeration winner (score desc, path asc)") {
    // dyadic log-probs, as the trainer produces: ties are exact
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    val pieceSet = (for {
      len <- 1 to 3
      _ <- 1 to 6
    } yield (1 to len).map(_ => alphabet(rnd.nextInt(3))).mkString).distinct ++
      alphabet.map(_.toString)
    val pieces = pieceSet.distinct.map { p =>
      p -> math.floor(-rnd.nextInt(1 << 22).toDouble) / UnigramLm.LqScale
    }.toMap
    val m = model(pieces.toSeq: _*)
    for (_ <- 1 to 200) {
      val w = (1 to (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(3))).mkString
      val expected = enumerate(w, pieces)
      val got = seg(w, m)
      if (expected.isEmpty) assert(got.isEmpty, s"word $w")
      else {
        val best = expected.minBy { case (s, p) => (-s, p) }
        assert(got.map(_.mkString(" ")).contains(best._2),
          s"word $w: got $got, want ${best._2} (score ${best._1})")
      }
    }
  }

  test("exact ties break to the lexicographically smallest path") {
    // 'ab'+'c' and 'a'+'bc' tie exactly (dyadic scores); 'a bc' < 'ab c'
    val m = model("a" -> -1.0, "bc" -> -2.0, "ab" -> -2.0, "c" -> -1.0)
    assert(seg("abc", m).contains(Seq("a", "bc")))
  }

  test("longer piece wins when probability mass says so") {
    val m = model("a" -> -5.0, "b" -> -5.0, "ab" -> -3.0)
    assert(seg("abab", m).contains(Seq("ab", "ab")))
    assert(seg("aba", m).contains(Seq("ab", "a")))
  }

  test("unsegmentable word (missing char) returns null; empty word is empty") {
    val m = model("a" -> -1.0)
    assert(seg("ax", m).isEmpty)
    assert(seg("", m).contains(Seq.empty))
  }

  test("train: chars always survive, multi-char pieces need evidence") {
    val df = Seq.fill(50)("abab abab cd").toDF("text")
    val vocab = UnigramLm.train(df, "text", iterations = 2,
      maxPieceLen = 3, seedSize = 6)
    val byPiece = vocab.map(p => p.piece -> p).toMap
    // every char of the corpus is present even if unused by Viterbi
    for (ch <- Seq("a", "b", "c", "d"))
      assert(byPiece.contains(ch), s"char $ch pruned")
    // 'ab' dominates the corpus: it must survive training with the
    // dominant count (50 docs x 2 words x 2 occurrences)
    assert(byPiece.get("ab").exists(_.cnt == 200L), byPiece.get("ab"))
    // counts renormalize: log-probs are dyadic numerators over 2^20
    vocab.foreach { p =>
      assert(p.lqMicro < 0, s"$p")
      assert(p.lq == p.lqMicro / UnigramLm.LqScale)
    }
  }

  test("every corpus word segments under the trained vocab (coverage)") {
    val df = Seq("the quick brown fox", "pack my box with five dozen jugs",
      "sphinx of black quartz judge my vow").toDF("text")
    val vocab = UnigramLm.train(df, "text", iterations = 2,
      maxPieceLen = 4, seedSize = 20)
    val segged = df.select(
      UnigramLm.segmentText(col("text"), vocab).as("pieces"),
      call_function("regexp_extract_all", lower(col("text")), lit("[a-z]+"), lit(0))
        .as("words"))
      .select(concat_ws("", col("pieces")).as("glued"),
        concat_ws("", col("words")).as("orig"))
      .as[(String, String)].collect()
    segged.foreach { case (glued, orig) =>
      assert(glued == orig, "segmentation must be lossless on letters")
    }
  }

  test("scoreDocs: integer piece-score sums, fluent beats shattered, empty doc null") {
    val df = Seq((1L, "abab abab"), (2L, "abab"), (3L, "zz zz zz"), (4L, "  "))
      .toDF("doc_id", "text")
    val vocab = UnigramLm.train(df, "text", iterations = 2,
      maxPieceLen = 3, seedSize = 8)
    val byPiece = vocab.map(p => p.piece -> p.lqMicro).toMap
    val got = UnigramLm.scoreDocs(df, "text", "doc_id", vocab)
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    // recompute: each doc's words segment under the kernel's own rules;
    // the spec's enumerate() twin already pins kernel == argmax, so here
    // pin the doc-level ALGEBRA: sums of the known per-word best paths
    def wordScore(w: String): (Long, Long) = {
      val m = model(vocab.map(p => p.piece -> p.lq): _*)
      val pieces = seg(w, m).get
      (pieces.length.toLong, pieces.map(byPiece).sum)
    }
    val ab = wordScore("abab")
    val zz = wordScore("zz")
    assert(got(0) == ((1L, 2 * ab._1, Some(2 * ab._2))))
    assert(got(1) == ((2L, ab._1, Some(ab._2))))
    assert(got(2) == ((3L, 3 * zz._1, Some(3 * zz._2))))
    assert(got(3) == ((4L, 0L, None)), "wordless doc: n=0, null score")
    // per-piece mean: the dominant bigram pattern scores higher than
    // the char-shattered rare word
    assert(ab._2.toDouble / ab._1 > zz._2.toDouble / zz._1)
  }

  test("pieceIds: dense stable ids, decode via vocab index round-trips") {
    val df = Seq("abab cd abab").toDF("text")
    val vocab = UnigramLm.train(df, "text", iterations = 2,
      maxPieceLen = 3, seedSize = 6)
    val ids = df.select(UnigramLm.pieceIds(col("text"), vocab).as("ids"))
      .as[Seq[Long]].head()
    assert(ids.nonEmpty && ids.forall(i => i >= 0 && i < vocab.length))
    // decoding by index re-concatenates to the letters of the text
    assert(ids.map(i => vocab(i.toInt).piece).mkString == "ababcdabab")
  }

  test("EM is deterministic: two runs produce identical models") {
    val df = Seq("alpha beta gamma alpha beta", "beta gamma delta").toDF("text")
    val a = UnigramLm.train(df, "text", iterations = 2, seedSize = 30)
    val b = UnigramLm.train(df, "text", iterations = 2, seedSize = 30)
    assert(a == b)
  }
}
