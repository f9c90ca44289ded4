package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** graft_vec_mean must match the composable posexplode/avg form it
  * replaces (the k-means centroid step), without the Generate row
  * amplification in the plan. */
class VecMeanSpec extends SparkSpec {

  import spark.implicits._

  private def posexplodeMean(df: org.apache.spark.sql.DataFrame) = df
    .select($"g", posexplode($"v".cast("array<double>")))
    .groupBy($"g", $"pos")
    .agg(avg($"col").as("m"))
    .groupBy($"g")
    .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
    .select($"g", expr("transform(pm, x -> x.m)").as("mean"))

  private def vecMeanRows(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    df.groupBy($"g").agg(VecMeanAgg.vecMean($"v").as("mean"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
  }

  test("element-wise mean, null vectors skipped, null elements skipped per position") {
    val df = Seq(
      ("a", Seq[java.lang.Double](1.0, 2.0, 3.0)),
      ("a", Seq[java.lang.Double](3.0, null, 5.0)),
      ("a", null),
      ("b", null)).toDF("g", "v")
    val out = vecMeanRows(df)
    assert(out("a") == Seq(2.0, 2.0, 4.0)) // pos 1: avg over the one non-null
    assert(out("b") == null)               // all-null group -> null
  }

  test("ragged vectors grow the state like per-position avg") {
    val df = Seq(
      ("a", Seq(1.0, 2.0)),
      ("a", Seq(3.0, 4.0, 10.0))).toDF("g", "v")
    assert(vecMeanRows(df)("a") == Seq(2.0, 3.0, 10.0))
  }

  test("differential: matches the posexplode/avg form on real embeddings") {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.load(spark, sf(), "embeddings")
      .select(($"vec_id" % 7).as("g"), $"embedding".as("v"))
    val native = emb.groupBy($"g").agg(VecMeanAgg.vecMean($"v").as("mean"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val composed = posexplodeMean(emb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(native.keySet == composed.keySet)
    for (g <- native.keySet) {
      val (n, c) = (native(g), composed(g))
      assert(n.length == c.length)
      n.zip(c).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
          s"group $g diverged: $x vs $y")
      }
    }
  }

  test("merge across partitions agrees with single-partition aggregation") {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.load(spark, sf(), "embeddings")
      .select(lit("all").as("g"), $"embedding".as("v"))
    def mean(parts: Int): Seq[Double] =
      emb.repartition(parts).groupBy($"g").agg(VecMeanAgg.vecMean($"v").as("m"))
        .collect().head.getSeq[Double](1)
    val one = mean(1)
    val many = mean(13)
    one.zip(many).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }

  test("plan: partial aggregation before the exchange, no Generate") {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.load(spark, sf(), "embeddings")
      .select(($"vec_id" % 7).as("g"), $"embedding".as("v"))
    val agg = emb.groupBy($"g").agg(VecMeanAgg.vecMean($"v").as("mean"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      "native vector mean must not explode rows")
    assert(plan.contains("partial_graft_vec_mean"),
      "members must fold map-side before the shuffle")
    // the old form's signature: two exchanges (groupBy(g,pos), groupBy(g))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected one shuffle (+AQE reads), got:\n$plan")
  }
}
