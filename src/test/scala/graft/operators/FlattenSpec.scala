package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T3 struct flatten: parent_child naming, recursion, schema helper
  * (reference dump-es-parquet:97-110,139-144). */
class FlattenSpec extends SparkSpec {

  import spark.implicits._

  private val nested = Seq((1, 2, 3, "x")).toDF("id", "b", "d", "e")
    .select($"id",
      struct($"b", struct($"d").as("c"), $"e").as("a"))

  test("flatten hoists nested fields as parent_child columns, depth-first") {
    val flat = Flatten(nested)
    assert(flat.columns.toSeq == Seq("id", "a_b", "a_c_d", "a_e"))
    assert(flat.as[(Int, Int, Int, String)].head() == ((1, 2, 3, "x")))
  }

  test("schema helper matches the flattened frame's schema") {
    assert(Flatten.schema(nested.schema) == Flatten(nested).schema)
  }

  test("flat frames pass through unchanged") {
    val df = Seq((1, "a")).toDF("x", "y")
    assert(Flatten(df).columns.toSeq == Seq("x", "y"))
  }

  test("column names containing dots survive (backtick quoting)") {
    val df = Seq(1).toDF("weird.name")
    assert(Flatten(df).columns.toSeq == Seq("weird.name"))
  }
}
