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

  test("property: flatten names are the _-joined paths and leaves are preserved") {
    import org.scalacheck.{Gen, rng}
    val leaf = Gen.oneOf[DataType](IntegerType, StringType, DoubleType, BooleanType)
    def genSchema(depth: Int, idx: Int): Gen[StructType] =
      Gen.choose(1, 3).flatMap { width =>
        Gen.sequence[Seq[StructField], StructField]((0 until width).map { i =>
          val name = s"f${depth}_${idx}_$i"
          if (depth == 0) leaf.map(StructField(name, _))
          else Gen.frequency(
            2 -> leaf.map(StructField(name, _)),
            1 -> genSchema(depth - 1, i).map(StructField(name, _)))
        }).map(fs => StructType(fs))
      }
    def leafPaths(s: StructType, prefix: String = ""): Seq[(String, DataType)] =
      s.fields.toSeq.flatMap {
        case StructField(n, st: StructType, _, _) => leafPaths(st, s"$prefix${n}_")
        case StructField(n, dt, _, _) => Seq((s"$prefix$n", dt))
      }
    val schemas = Gen.listOfN(30, genSchema(3, 0))
      .pureApply(Gen.Parameters.default, rng.Seed(7L))
    schemas.foreach { s =>
      val flat = Flatten.schema(s)
      assert(flat.fields.toSeq.map(f => (f.name, f.dataType)) == leafPaths(s))
      assert(flat.fields.forall(!_.dataType.isInstanceOf[StructType]))
    }
  }
}
