package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate vs the window form it replaces: identical
  * results (including ties), bounded output, merge correctness across
  * partitions. */
class TopKSpec extends SparkSpec {

  import spark.implicits._

  test("graft_topk equals the window row_number form on fixture data") {
    val li = Tables.load(spark, sf(), "lineitem")
      .select($"l_returnflag".as("q_id"), $"l_orderkey".as("id"),
        $"l_extendedprice".as("score"))
      .repartition(7) // force partial buffers + merges
    val viaAgg = li.groupBy($"q_id")
      .agg(TopKByScore.topk($"score", $"id", 10).as("t"))
      .select($"q_id", explode($"t").as("e"))
      .select($"q_id", $"e.id".as("id"), $"e.score".as("score"))
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"id".asc)
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10).drop("rn")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("ties break toward the smaller id, exactly like ORDER BY score DESC, id") {
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 1.0))
      .toDF("id", "score").repartition(3)
    val kept = df.agg(TopKByScore.topk($"score", $"id", 2).as("t"))
      .select(explode($"t.id")).as[Long].collect().toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("k larger than the group returns the whole group, best-first") {
    val df = Seq((10L, 1.0), (20L, 3.0), (30L, 2.0)).toDF("id", "score")
    val kept = df.agg(TopKByScore.topk($"score", $"id", 99).as("t"))
      .select($"t").as[Seq[(Long, Double)]].collect().head
    assert(kept == Seq((20L, 3.0), (30L, 2.0), (10L, 1.0)))
  }

  test("null scores and ids are ignored; empty input yields an empty array") {
    val df = Seq[(java.lang.Long, java.lang.Double)]((1L, null), (null, 2.0))
      .toDF("id", "score")
    val kept = df.agg(TopKByScore.topk($"score", $"id", 3).as("t"))
      .select(size($"t")).as[Int].collect().head
    assert(kept == 0)
  }
}
