package graft.operators

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // points spread along (0.6, 0.8) with small orthogonal jitter: the
  // top component must recover that direction
  private def fixture = (1 to 40).map { i =>
    val t = (i - 20.5) // dominant coordinate
    val o = ((i % 5) - 2) * 0.01 // orthogonal jitter
    (i.toLong, Seq(0.6 * t - 0.8 * o, 0.8 * t + 0.6 * o))
  }.toDF("id", "emb")

  test("topComponent recovers the dominant direction, sign-fixed") {
    val m = Pca.topComponent(fixture, "emb", "id", iterations = 5)
    val cos = m.component.zip(Seq(0.6, 0.8)).map(p => p._1 * p._2).sum
    assert(math.abs(cos) > 0.9999, s"component ${m.component} not aligned")
    assert(m.component.head >= 0, "sign convention: first coordinate >= 0")
    // mean of 1..40 centered at 20.5 => t-mean = 0 => mean ~ (0, 0)
    assert(m.mean.forall(x => math.abs(x) < 1e-9), s"mean ${m.mean}")
  }

  test("training is deterministic: two runs give identical bits") {
    val a = Pca.topComponent(fixture, "emb", "id", iterations = 3)
    val b = Pca.topComponent(fixture, "emb", "id", iterations = 3)
    assert(a == b)
  }

  test("projection is the centered dot; projecting the mean gives zero") {
    val m = Pca.topComponent(fixture, "emb", "id", iterations = 5)
    val withMean = fixture
      .union(Seq((999L, m.mean)).toDF("id", "emb"))
    val proj = Pca.project(withMean, "emb", "id", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(proj(999L) == 0.0)
    // the two extreme points project to opposite ends
    assert(proj(1L) * proj(40L) < 0)
    assert(math.abs(proj(1L)) > 10)
  }

  test("fail-fast on ragged, empty, and all-null input") {
    val ragged = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0))).toDF("id", "emb")
    assert(intercept[IllegalArgumentException](
      Pca.topComponent(ragged, "emb", "id")).getMessage.contains("equal length"))
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "emb")
    assert(intercept[IllegalArgumentException](
      Pca.topComponent(empty, "emb", "id")).getMessage.contains("empty"))
    val nul = Seq((1L, Option.empty[Seq[Double]])).toDF("id", "emb")
    assert(intercept[IllegalArgumentException](
      Pca.topComponent(nul, "emb", "id")).getMessage.contains("non-null"))
  }

  test("topComponents: second component is orthogonal and recovers the jitter axis") {
    val m = Pca.topComponents(fixture, "emb", "id", nComponents = 2,
      iterations = 8)
    val Seq(v1, v2) = m.components
    val dot12 = v1.zip(v2).map(p => p._1 * p._2).sum
    assert(math.abs(dot12) < 1e-9, s"components not orthogonal: $dot12")
    // the residual after deflating (0.6, 0.8) is the jitter axis
    val cos = v2.zip(Seq(-0.8, 0.6)).map(p => p._1 * p._2).sum
    assert(math.abs(cos) > 0.9999, s"second component $v2 off the jitter axis")
    assert(v2.head >= 0, "sign convention applies per component")
    // component 1 of the pair == the single-component API
    assert(Pca.topComponent(fixture, "emb", "id", iterations = 8).component == v1)
  }

  test("projectK emits one column per component; p1 matches project") {
    val m2 = Pca.topComponents(fixture, "emb", "id", nComponents = 2,
      iterations = 3)
    val k = Pca.projectK(fixture, "emb", "id", m2)
    assert(k.columns.toSeq == Seq("id", "p1", "p2"))
    val p1 = Pca.project(fixture, "emb", "id", Pca.Model(m2.mean, m2.components.head))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    k.collect().foreach(r => assert(r.getDouble(1) == p1(r.getLong(0))))
  }

  test("project is fully narrow: zero exchanges in the plan") {
    val m = Pca.topComponent(fixture, "emb", "id", iterations = 2)
    val p = Pca.project(fixture, "emb", "id", m)
    val exchanges = collectPlan(p.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "PCA projection must not shuffle")
  }

  test("zero-variance corpus fails fast instead of dividing by zero") {
    val flat = (1 to 5).map(i => (i.toLong, Seq(1.0, 2.0))).toDF("id", "emb")
    assert(intercept[IllegalArgumentException](
      Pca.topComponent(flat, "emb", "id")).getMessage.contains("degenerate"))
  }
}
