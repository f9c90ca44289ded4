package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text + vector primitives behind the LLM-pipeline operators. */
class TextVectorsSpec extends SparkSpec {

  import spark.implicits._

  test("tokens: splits on any whitespace run, drops empties") {
    val out = Seq("  a\tb\n c  ").toDF("t")
      .select(Text.tokens($"t")).as[Seq[String]].head()
    assert(out == Seq("a", "b", "c"))
  }

  test("shingles: n-grams of tokens; short docs -> empty array") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(Text.shingles(Text.tokens($"t"), 3).as("sh"))
    assert(df.as[Seq[String]].collect().toSeq ==
      Seq(Seq("a b c", "b c d"), Seq()))
  }

  test("fingerprint is invariant under case and whitespace noise") {
    val fps = Seq("Hello  World", "hello\nworld ").toDF("t")
      .select(Text.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("minhash: identical token sets share band values; band seed matters") {
    val df = Seq("x y z w v", "x y z w v", "q r s t u").toDF("t")
      .select(Text.minhash(Text.shingles(Text.tokens($"t"), 2), 1).as("m1"),
        Text.minhash(Text.shingles(Text.tokens($"t"), 2), 2).as("m2"))
    val rows = df.collect()
    assert(rows(0).getString(0) == rows(1).getString(0))
    assert(rows(0).getString(0) != rows(2).getString(0))
    assert(rows(0).getString(0) != rows(0).getString(1)) // different seeds differ
  }

  test("minhashBand: disjoint md5 slices; equal sets share all bands") {
    val df = Seq("x y z w v", "x y z w v").toDF("t")
      .select(Text.digests(Text.shingles(Text.tokens($"t"), 2)).as("dg"))
      .select((1 to 4).map(b => Text.minhashBand($"dg", b).as(s"b$b")): _*)
    val rows = df.collect()
    assert(rows(0) == rows(1))
    val sigs = (0 until 4).map(rows(0).getString)
    assert(sigs.distinct.length == 4)      // bands are different functions
    assert(sigs.forall(_.length == 8))     // 32-bit hex slices
  }

  test("simhash: deterministic, equal for equal token multisets, 32-bit range") {
    val hs = Seq("alpha beta gamma", "alpha beta gamma", "delta epsilon")
      .toDF("t").select(Text.simhash(Text.tokens($"t"))).as[Long].collect()
    assert(hs(0) == hs(1) && hs(0) != hs(2))
    assert(hs.forall(h => h >= 0 && h < (1L << 32)))
  }

  test("differential: native SimHash32 equals the composable md5-hex fold over fixtures") {
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select($"doc_id", Text.tokens($"text").as("tk"))
    val diff = docs.select(
      Text.simhashNative($"tk").as("native"),
      Text.simhashFromDigests(Text.digests($"tk")).as("composed"))
      .filter($"native" =!= $"composed")
    assert(diff.count() == 0)
  }

  test("differential: native MinHashBands equals the composable band extractors") {
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select($"doc_id", Text.tokens($"text").as("tk"))
      .select($"doc_id", $"tk", Text.digests(Text.shingles($"tk", 5)).as("dg"))
    val diff = docs.select(
      Text.minhashBandsNative($"tk", 5, 4).as("native"),
      array((1 to 4).map(b => Text.minhashBand($"dg", b)): _*).as("composed"))
      .filter(to_json($"native") =!= to_json($"composed"))
    assert(diff.count() == 0)
  }

  test("rollingFingerprint: order-sensitive, deterministic, empty -> 0, in-range") {
    val fps = Seq("alpha beta gamma", "gamma beta alpha", "alpha beta gamma", " ")
      .toDF("t").select(Text.rollingFingerprint(Text.tokens($"t"))).as[Long].collect()
    assert(fps(0) == fps(2))          // deterministic
    assert(fps(0) != fps(1))          // order matters (unlike MinHash)
    assert(fps(3) == 0L)              // empty token stream
    assert(fps.forall(h => h >= 0 && h < Text.RollingMod))
  }

  test("dot/norm/cosine: exact on known vectors") {
    val df = Seq((Seq(1f, 2f, 2f), Seq(2f, 4f, 4f))).toDF("a", "b")
    val r = df.select(
      Vectors.dot($"a", $"b"), Vectors.norm($"a"), Vectors.cosine($"a", $"b"))
      .collect().head
    assert(r.getDouble(0) == 18.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("signBucket: sign pattern over leading dims") {
    val out = Seq(Seq(0.5f, -1f, 0f, 2f)).toDF("v")
      .select(Vectors.signBucket($"v", 4)).as[String].head()
    assert(out == "1011") // 0 counts as non-negative
  }
}
