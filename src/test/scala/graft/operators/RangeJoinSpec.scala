package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(us: Long) = new Timestamp(us / 1000) // micros -> Timestamp(ms)

  test("band pairs: inclusive boundaries, cross-bucket matches, no false pairs") {
    val tol = 1000000L // 1 s
    val left = Seq((1L, ts(10000000L))).toDF("lid", "l_ts")
    val right = Seq(
      (100L, ts(9000000L)),   // exactly -tol -> match (inclusive)
      (101L, ts(11000000L)),  // exactly +tol -> match
      (102L, ts(11001000L)),  // 1 ms past the tolerance -> no
      (103L, ts(12500000L)),  // outside -> no
      (104L, ts(10000001L))   // inside, adjacent bucket boundary -> match
    ).toDF("rid", "r_ts")
    val out = RangeJoin.bandPairs(left, right, "l_ts", "r_ts", tol)
      .select($"rid").as[Long].collect().sorted.toSeq
    assert(out == Seq(100L, 101L, 104L))
  }

  test("each qualifying pair appears exactly once despite the 2-bucket explode") {
    val tol = 500000L
    // right row sits in the same bucket as both of the left row's probes
    val left = Seq((1L, ts(1000000L)), (2L, ts(1200000L))).toDF("lid", "l_ts")
    val right = Seq((9L, ts(1100000L))).toDF("rid", "r_ts")
    val out = RangeJoin.bandPairs(left, right, "l_ts", "r_ts", tol)
    assert(out.count() == 2) // one match per left row, not duplicated
  }
}
