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
}
