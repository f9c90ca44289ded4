package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  test("backward as-of: latest prior right row, inclusive, null when none") {
    val left = Seq(
      (1L, 10L, ts(100)),  // after right@50 -> 5.0
      (1L, 11L, ts(50)),   // equal ts -> inclusive match 5.0
      (1L, 12L, ts(10)),   // before any right -> null
      (2L, 20L, ts(100))   // key with no right rows -> null
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 100L, ts(50), 5.0),
      (1L, 101L, ts(99), 7.0)
    ).toDF("user_id", "event_id", "ts", "value")

    val out = AsofJoin.backward(left, right,
      keyCols = Seq("user_id"), tsCol = "ts", tieBreak = "event_id",
      rightCols = Seq("value"))
      .select($"event_id", $"value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(10L).contains(7.0))  // latest prior, not just any prior
    assert(out(11L).contains(5.0))  // inclusive at equal ts
    assert(out(12L).isEmpty)
    assert(out(20L).isEmpty)
  }

  test("left columns and row count are preserved exactly") {
    val left = Seq((1L, 1L, ts(1), "x")).toDF("user_id", "event_id", "ts", "payload")
    val right = Seq((1L, 2L, ts(0), 1.0)).toDF("user_id", "event_id", "ts", "value")
    val out = AsofJoin.backward(left, right, Seq("user_id"), "ts", "event_id", Seq("value"))
    assert(out.columns.toSeq == Seq("user_id", "event_id", "ts", "payload", "value"))
    assert(out.count() == 1)
  }
}
