package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom codegen'd dot-product expression vs the composable form. */
class VecDotSpec extends SparkSpec {

  import spark.implicits._

  test("differential: VecDot is bit-identical to the composable fold over fixtures") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select($"vec_id", $"embedding")
    val diff = e.select(
      Vectors.dot($"embedding", $"embedding").as("native"),
      Vectors.dotComposable($"embedding", $"embedding").as("composed"))
      .filter($"native" =!= $"composed")
    assert(diff.count() == 0)
  }

  test("null array input yields null; mixed float/double widths work") {
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(3.0, 4.0))),
      (None: Option[Seq[Float]], Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(Vectors.dot($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
  }

  test("unequal-length arrays: both forms sum over the shorter length") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    val out = df.select(
      Vectors.dot($"a", $"b").as("native"),
      Vectors.dotComposable($"a", $"b").as("composed")).collect()(0)
    assert(out.getDouble(0) == 14.0) // 1*4 + 2*5, third element ignored
    assert(out.getDouble(1) == 14.0)
  }

  test("participates in whole-stage codegen (no interpreted HOF in the plan)") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
    val plan = e.select(Vectors.dot($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_vec_dot"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact plan
    assert(plan.linesIterator.exists(l => l.contains("graft_vec_dot") && l.trim.startsWith("*(")))
  }

  test("type checking rejects non-array inputs") {
    val err = intercept[Exception] {
      Seq(1).toDF("x").select(Vectors.dot($"x", $"x")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
