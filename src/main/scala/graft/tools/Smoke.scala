package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.{Lenient, Text, Vectors}
import graft.operators.Flatten

/** Dev smoke entry: drives the library end-to-end on the sf0.001 fixtures.
  * `sbt "runMain graft.tools.Smoke [sfDir]"` — prints one section per module
  * so a human (or the verify loop) can eyeball real runtime behavior.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    import spark.implicits._

    println(s"== Tables.resolve(\"*e*\") -> ${Tables.resolve("*e*").mkString(",")}")

    val li = Tables.load(spark, dir, "lineitem")
    println(s"== lineitem rows=${li.count()} cols=${li.columns.length}")

    val coerced = Seq("3", "3.7", "-3.7", "x", "19999999999", "20000000001")
      .toDF("v")
      .select(
        $"v",
        Lenient.lenientLong($"v").as("as_long"),
        Lenient.lenientTimestamp($"v").as("as_ts"))
    println("== Lenient coercions")
    coerced.show(truncate = false)

    val docs = Tables.load(spark, dir, "documents")
    val textDemo = docs
      .select(
        $"doc_id",
        Text.tokens($"text").as("toks"),
        Text.fingerprint($"text").as("fp"))
      .select(
        $"doc_id", size($"toks").as("n_tokens"), $"fp",
        Text.minhash(Text.shingles($"toks", 3), 1).as("mh1"))
    println("== Text over documents")
    textDemo.show(5, truncate = 40)

    val emb = Tables.load(spark, dir, "embeddings")
    val vecDemo = emb.limit(5).select(
      $"vec_id",
      round(Vectors.norm($"embedding"), 4).as("norm"),
      Vectors.signBucket($"embedding", 8).as("bucket"))
    println("== Vectors over embeddings")
    vecDemo.show()

    val nested = spark.sql(
      "select 1 as id, named_struct('b', 2, 'c', named_struct('d', 3)) as a")
    println(s"== Flatten cols: ${Flatten(nested).columns.mkString(",")}")
    Flatten(nested).show()

    spark.stop()
  }
}
