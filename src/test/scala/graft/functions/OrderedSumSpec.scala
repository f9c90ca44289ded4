package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The native ordered-sum aggregate vs the composable
  * `aggregate(array_sort(collect_list(struct(ord, v))))` fold it
  * replaces: bit-identical doubles (same order, same strict left fold),
  * merge correctness across partitions, the empty-group 0.0 seed, and
  * null poisoning. */
class OrderedSumSpec extends SparkSpec {

  import spark.implicits._

  private def foldForm(ord: org.apache.spark.sql.Column,
                       v: org.apache.spark.sql.Column) =
    aggregate(
      array_sort(collect_list(struct(ord.as("__o"), v.as("__s")))),
      lit(0.0), (acc, s) => acc + s.getField("__s"))

  test("graft_ordered_sum is bit-identical to the struct-sort fold on fixture data") {
    val li = Tables.load(spark, sf(), "lineitem")
      .select($"l_returnflag".as("g"), $"l_orderkey".as("id"),
        ($"l_extendedprice" * $"l_discount").as("v"))
      .repartition(7) // force partial buffers + merges
    val native = li.groupBy($"g")
      .agg(OrderedSum.orderedSum($"id", $"v").as("s"))
    val fold = li.groupBy($"g")
      .agg(foldForm($"id", $"v").as("s"))
    val joined = native.as("a").join(fold.as("b"), "g")
      .select($"a.s".as("na"), $"b.s".as("fo")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("empty input yields the 0.0 seed, exactly like folding an empty array") {
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    val native = df.agg(OrderedSum.orderedSum($"id", $"v")).head.getDouble(0)
    val fold = df.agg(foldForm($"id", $"v")).head.getDouble(0)
    assert(native == 0.0 && fold == 0.0)
  }

  test("a null value poisons the group to null, same as the fold") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.5), (2L, null), (3L, 2.5)).toDF("id", "v")
    val native = df.agg(OrderedSum.orderedSum($"id", $"v")).head
    val fold = df.agg(foldForm($"id", $"v")).head
    assert(native.isNullAt(0) && fold.isNullAt(0))
  }

  test("summation order is ord-ascending (non-associative check)") {
    // 1.0 + 1e-16 + ... + 1e-16 differs from (1e-16 + ... ) + 1.0 in IEEE;
    // pin the ascending-id order on a deliberately shuffled input.
    val rows = (1L to 100L).map(i => (101L - i, if (i == 100) 1.0 else 1e-16))
    val df = rows.toDF("id", "v").repartition(5)
    val native = df.agg(OrderedSum.orderedSum($"id", $"v")).head.getDouble(0)
    var expect = 0.0
    rows.sortBy(_._1).foreach { case (_, v) => expect += v }
    assert(java.lang.Double.doubleToRawLongBits(native) ==
      java.lang.Double.doubleToRawLongBits(expect))
  }

  test("orderedSumBy falls back to the fold for non-integral order columns") {
    val df = Seq(("b", 2.0), ("a", 1.0), ("c", 4.0)).toDF("id", "v")
      .repartition(3)
    val viaBy = df.agg(OrderedSum.orderedSumBy($"id", $"v",
      org.apache.spark.sql.types.StringType)).head.getDouble(0)
    val fold = df.agg(foldForm($"id", $"v")).head.getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(viaBy) ==
      java.lang.Double.doubleToRawLongBits(fold))
  }
}
