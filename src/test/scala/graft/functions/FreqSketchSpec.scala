package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int = 4): Seq[(String, Long)] = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    items.toDF("item").repartition(parts)
      .agg(HeavyHitters.heavyHitters($"item", k).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.cnt")
      .as[(String, Long)].collect().toSeq
  }

  test("k at or above the key space is exact, sorted count desc then item asc") {
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    assert(sketch(items, 10) == Seq("a" -> 5L, "b" -> 3L, "c" -> 3L, "d" -> 1L))
  }

  test("guarantee: every item with count > n/(k+1) is present, never overcounted") {
    val gen = Gen.frequency(
      (8, Gen.const("hot")), (4, Gen.const("warm")),
      (1, Gen.oneOf("c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8")))
    (0 until 20).foreach { i =>
      val items = (0 until 400).flatMap(j =>
        gen.apply(Gen.Parameters.default, Seed(100L * i + j)))
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size
      for (k <- Seq(2, 4, 8)) {
        val est = sketch(items, k, parts = 3).toMap
        val bound = n.toDouble / (k + 1)
        exact.foreach { case (item, c) =>
          if (c > bound)
            assert(est.contains(item), s"missed $item (c=$c, bound=$bound, k=$k)")
        }
        est.foreach { case (item, e) =>
          val c = exact(item)
          assert(e <= c, s"overcount: $item est=$e exact=$c")
          assert(c - e <= bound + 1e-9, s"bound broken: $item est=$e exact=$c k=$k")
        }
      }
    }
  }

  test("merge across partitions agrees with single-partition guarantees") {
    val items = Seq.fill(50)("x") ++ Seq.fill(30)("y") ++
      (1 to 40).map(i => s"tail$i")
    for (parts <- Seq(1, 2, 8)) {
      val est = sketch(items, 4, parts).toMap
      assert(est.contains("x") && est.contains("y"), s"parts=$parts: $est")
      assert(est("x") <= 50 && est("y") <= 30)
    }
  }

  test("nulls are ignored; empty input yields an empty array") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val withNulls = Seq(Some("a"), None, Some("a"), None).toDF("item")
      .agg(HeavyHitters.heavyHitters($"item", 4).as("hh"))
      .select(size($"hh")).as[Int].collect().head
    assert(withNulls == 1)
    val empty = Seq.empty[String].toDF("item")
      .agg(HeavyHitters.heavyHitters($"item", 4).as("hh"))
      .select(size($"hh")).as[Int].collect().head
    assert(empty == 0)
  }

  test("state stays k-bounded over adversarial distinct streams") {
    val items = (1 to 5000).map(i => s"u$i") // all distinct: worst case
    val est = sketch(items, 8, parts = 4)
    assert(est.size <= 8)
  }
}
