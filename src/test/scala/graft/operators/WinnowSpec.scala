package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprints: the w+k−1 sharing guarantee, adjacent-window
  * dedup, and the short-document boundary. */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  test("any shared run of >= w + k - 1 tokens shares a fingerprint") {
    // k=4, w=4: guarantee threshold is 7 tokens. The two docs share an
    // 8-token run embedded in different surroundings.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, s"one two three $shared x y z"),
      (2L, s"$shared completely different tail words here")
    ).toDF("id", "text")
    val fp = Winnow.fingerprints(df, "text", "id").cache()
    val a = fp.filter($"id" === 1L).select($"fp").as[String].collect().toSet
    val b = fp.filter($"id" === 2L).select($"fp").as[String].collect().toSet
    assert((a & b).nonEmpty, "shared 8-token run must share a fingerprint")
    fp.unpersist()
  }

  test("selected positions are in-range minima; adjacent dups collapse") {
    val df = Seq((1L, (1 to 12).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    // 12 tokens, k=4 -> 9 grams; w=4 -> 6 windows but <= 6 distinct picks
    val rows = Winnow.fingerprints(df, "text", "id")
      .select($"pos").as[Long].collect()
    assert(rows.nonEmpty && rows.length <= 6)
    assert(rows.forall(p => p >= 1 && p <= 9))
    assert(rows.distinct.length == rows.length, "duplicates must collapse")
  }

  test("property: the sharing guarantee holds on randomized surroundings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // 40 deterministic pairs: random prefixes/suffixes around a random
    // shared run of exactly w + k - 1 = 7 tokens (the guarantee's edge)
    def toks(alpha: String, n: Int, seed: Long): Seq[String] =
      Gen.listOfN(n, Gen.choose(0, 999).map(i => s"$alpha$i"))
        .apply(Gen.Parameters.default, Seed(seed)).get
    val docs = (0 until 40).flatMap { i =>
      val shared = toks("s", 7, 1000L + i)
      val a = toks("a", 5 + i % 7, 2000L + i) ++ shared ++ toks("b", 3, 3000L + i)
      val b = toks("c", 2 + i % 5, 4000L + i) ++ shared ++ toks("d", 6, 5000L + i)
      Seq((2L * i, a.mkString(" ")), (2L * i + 1, b.mkString(" ")))
    }
    val fp = Winnow.fingerprints(docs.toDF("id", "text"), "text", "id")
      .select($"id", $"fp").as[(Long, String)].collect()
      .groupBy(_._1 / 2).view.mapValues(_.groupBy(_._1 % 2)).toMap
    (0 until 40).foreach { i =>
      val byDoc = fp(i.toLong)
      val a = byDoc.getOrElse(0L, Array.empty).map(_._2).toSet
      val b = byDoc.getOrElse(1L, Array.empty).map(_._2).toSet
      assert((a & b).nonEmpty, s"pair $i: 7-token shared run yielded no shared fp")
    }
  }

  test("winnow is stateless: the same plan is valid mid-stream, stream == batch") {
    val src = java.nio.file.Files.createTempDirectory("wn_src").toString
    val out = java.nio.file.Files.createTempDirectory("wn_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wn_ckpt").toString
    val rows = Seq(
      (1L, (1 to 15).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 12).map(i => s"b$i").mkString(" "))).toDF("id", "text")
    rows.write.mode("append").parquet(src)
    val q = Winnow.fingerprints(
      spark.readStream.schema(rows.schema).parquet(src), "text", "id")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val batch = Winnow.fingerprints(rows, "text", "id")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("documents with fewer than w k-grams emit nothing") {
    val df = Seq((1L, "a b c d e f")).toDF("id", "text") // 3 grams < w=4
    assert(Winnow.fingerprints(df, "text", "id").isEmpty)
  }
}
