package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-Min sketch: never undercounts, exact when collision-free
  * (verified against an independent Java replay of the hash layout),
  * merges across partitions, fixed-size state. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val width = 64

  /** Independent witness for row r's bucket of an item. */
  private def jBucket(item: String, r: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(item.getBytes("UTF-8"))
    val h = ((d(4 * r) & 0xffL) << 24) | ((d(4 * r + 1) & 0xffL) << 16) |
      ((d(4 * r + 2) & 0xffL) << 8) | (d(4 * r + 3) & 0xffL)
    (h % width).toInt
  }

  private def estimates(df: org.apache.spark.sql.DataFrame, depth: Int)
      : Map[String, Long] = {
    val grid = df.agg(CmSketch.cms($"item", depth, width).as("g"))
      .as[Seq[Seq[Long]]].head()
    assert(grid.length == depth && grid.forall(_.length == width))
    df.select($"item").distinct().as[String].collect().map { it =>
      it -> (0 until depth).map(r => grid(r)(jBucket(it, r))).min
    }.toMap
  }

  test("exact counts when collision-free; never undercounts under collisions") {
    val items = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = items.toDF("item")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // no pairwise collisions among the 3 keys in any of the 4 rows?
    val collisionFree = (0 until 4).exists(r =>
      truth.keySet.map(jBucket(_, r)).size == truth.keySet.size)
    val est = estimates(df, depth = 4)
    truth.foreach { case (it, c) =>
      assert(est(it) >= c, s"$it undercounted: ${est(it)} < $c")
      if (collisionFree) assert(est(it) == c)
    }
  }

  test("partition-merge invariance: 1-partition grid == 8-partition grid") {
    val df = (1 to 500).map(i => s"tok${i % 37}").toDF("item")
    val one = df.coalesce(1).agg(CmSketch.cms($"item", 4, width).as("g"))
      .as[Seq[Seq[Long]]].head()
    val many = df.repartition(8).agg(CmSketch.cms($"item", 4, width).as("g"))
      .as[Seq[Seq[Long]]].head()
    assert(one == many, "element-wise merge must be partition-order independent")
  }

  test("nulls ignored; empty input yields an all-zero grid; depth 5 rejected") {
    // the aggregate sees the null row; the estimate replay checks "x"
    val withNull = Seq(Some("x"), None, Some("x")).toDF("item")
    val grid = withNull.agg(CmSketch.cms($"item", 2, width).as("g"))
      .as[Seq[Seq[Long]]].head()
    val estX = (0 until 2).map(r => grid(r)(jBucket("x", r))).min
    assert(estX == 2L, "null rows must not count anywhere")
    assert(grid.flatten.sum == 4L, "exactly 2 updates x 2 rows landed")
    val empty = Seq.empty[String].toDF("item")
      .agg(CmSketch.cms($"item", 2, width).as("g")).as[Seq[Seq[Long]]].head()
    assert(empty.flatten.forall(_ == 0L))
    val e = intercept[Exception] {
      Seq("x").toDF("item").agg(CmSketch.cms($"item", 5, width)).collect()
    }
    assert(e.getMessage.contains("depth"))
  }
}
