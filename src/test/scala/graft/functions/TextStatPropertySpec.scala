package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property coverage for the native text-stat kernels, driven directly
  * (kernel level) and checked against independent Scala reformulations.
  * Seeded batches, so failures reproduce. */
class TextStatPropertySpec extends SparkSpec {

  private val tokenGen: Gen[String] =
    Gen.oneOf(Gen.oneOf("a", "b", "ab", "ba", "x"), Gen.alphaNumStr.map(_.take(6)))
  private val toksGen: Gen[List[String]] = Gen.listOf(tokenGen)

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def arr(toks: Seq[String]): GenericArrayData =
    new GenericArrayData(toks.map(t =>
      if (t == null) null else UTF8String.fromString(t)).toArray[Any])

  test("repStats == independent groupBy reformulation") {
    val cases = sample(toksGen, 300, 7001L)
    cases.foreach { toks =>
      for (n <- Seq(1, 2, 3)) {
        val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size)
        val expected = (grams.length.toLong, counts.size.toLong,
          if (counts.isEmpty) 0L else counts.values.max.toLong)
        val row = TextStatOps.repStats(arr(toks), n)
        val got = (row.getLong(0), row.getLong(1), row.getLong(2))
        assert(got == expected, s"toks=$toks n=$n")
      }
    }
  }

  test("gramOverlap == independent set-intersection reformulation") {
    val benchToks = sample(toksGen, 40, 8002L)
    val bench = benchToks.flatMap(_.sliding(2).filter(_.length == 2)
      .map(_.mkString(" "))).toSet
    val set = new java.util.HashSet[UTF8String]()
    bench.foreach(g => set.add(UTF8String.fromString(g)))
    sample(toksGen, 300, 8003L).foreach { toks =>
      val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      val row = TextStatOps.gramOverlap(arr(toks), 2, set)
      assert((row.getLong(0), row.getLong(1)) ==
        (grams.size.toLong, grams.intersect(bench).size.toLong), s"toks=$toks")
    }
  }

  test("charStats: totals, bounds, and exact Simpson vs reformulation") {
    val strGen = Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.const(""), Gen.const("aaaa"), Gen.identifier)
    sample(strGen, 400, 9004L).foreach { s =>
      val row = TextStatOps.charStats(UTF8String.fromString(s))
      val cps = s.codePoints().toArray.toSeq
      val counts = cps.groupBy(identity).view.mapValues(_.size.toLong)
      val n = cps.length.toLong
      val expectedDiv =
        if (n == 0) 0.0
        else 1.0 - counts.values.map(c => c * c).sum.toDouble / (n * n).toDouble
      assert(row.getLong(0) == n && row.getLong(1) == counts.size.toLong)
      assert(row.getDouble(2) == expectedDiv, s"s=$s")
      assert(row.getDouble(2) >= 0.0 && row.getDouble(2) < 1.0 || n == 0)
    }
  }

  test("shinglesNative == composable Text.shingles over random token arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cases = sample(toksGen, 300, 11006L)
    val df = cases.zipWithIndex.map { case (toks, i) => (i, toks.map(Option(_))) }
      .toDF("i", "tk")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = df.select(col("i"),
        Text.shingles(col("tk"), n).as("composable"),
        Text.shinglesNative(col("tk"), n).as("native")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"i=${r.getInt(0)} n=$n")
      }
    }
  }

  test("bpeMerge: character sequence preserved, length shrinks by merge count") {
    val symGen = Gen.listOf(Gen.oneOf("a", "b", "c", "ab"))
    sample(symGen, 400, 10005L).foreach { syms =>
      for ((a, b) <- Seq(("a", "b"), ("a", "a"), ("b", "c"), ("ab", "a"))) {
        val out = TextStatOps.bpeMerge(arr(syms),
          UTF8String.fromString(a), UTF8String.fromString(b))
        val outSeq = (0 until out.numElements()).map(out.getUTF8String(_).toString)
        // the concatenated character stream is invariant under merging
        assert(outSeq.mkString == syms.mkString, s"syms=$syms pair=($a,$b)")
        // every merge removes exactly one element
        val merged = outSeq.count(_ == a + b) -
          syms.count(_ == a + b) // pre-existing concatenations don't count
        assert(outSeq.length == syms.length - merged,
          s"syms=$syms pair=($a,$b) out=$outSeq")
      }
    }
  }
}
