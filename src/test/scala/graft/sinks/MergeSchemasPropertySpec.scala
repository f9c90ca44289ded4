package graft.sinks

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the commit-time schema gate
  * ([[Snapshots.mergeSchemas]]): random nested schemas through the
  * merge, asserting the three contracts the snapshot log's correctness
  * rides on — self-merge is the nullable identity, widening keeps
  * every field of both sides with table-side order, and a type
  * conflict on ANY common path throws naming that path. Seeded
  * batches, so failures reproduce. */
class MergeSchemasPropertySpec extends AnyFunSuite {

  private val leafGen: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, DoubleType, StringType, BooleanType,
    DateType, TimestampType, BinaryType)

  private def typeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      5 -> leafGen,
      1 -> Gen.lzy(typeGen(depth - 1).map(ArrayType(_, containsNull = true))),
      1 -> Gen.lzy(typeGen(depth - 1).map(v =>
        MapType(StringType, v, valueContainsNull = true))),
      1 -> Gen.lzy(structGen(depth - 1)))

  private def structGen(depth: Int): Gen[StructType] = for {
    n <- Gen.choose(1, 5)
    names <- Gen.pick(n, Seq("a", "b", "c", "d", "e", "f", "g"))
    types <- Gen.listOfN(n, typeGen(depth))
    nulls <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield StructType(names.zip(types.zip(nulls)).map {
    case (nm, (t, nl)) => StructField(nm, t, nl)
  }.toArray)

  private def sample[A](g: Gen[A], seed: Long): A =
    Iterator.from(0).map(i =>
        g.apply(Gen.Parameters.default, Seed(seed + i)))
      .collectFirst { case Some(v) => v }.get

  private def nullable(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(f.name, nullable(f.dataType), nullable = true, f.metadata)))
    case at: ArrayType => ArrayType(nullable(at.elementType), containsNull = true)
    case mt: MapType =>
      MapType(nullable(mt.keyType), nullable(mt.valueType), valueContainsNull = true)
    case o => o
  }

  test("self-merge is the all-nullable identity") {
    (1L to 200L).foreach { seed =>
      val t = sample(structGen(2), seed)
      assert(Snapshots.mergeSchemas(t, t, "prop") == nullable(t),
        s"seed $seed: $t")
    }
  }

  test("widening: disjoint-field merge keeps every field, table side first") {
    (1L to 200L).foreach { seed =>
      val t = sample(structGen(2), seed)
      val extra = sample(structGen(2), seed + 10000)
      // make the incoming side disjoint by renaming
      val incoming = StructType(extra.fields.map(f =>
        StructField("x_" + f.name, f.dataType, f.nullable)))
      val merged = Snapshots.mergeSchemas(t, incoming, "prop")
      assert(merged.fieldNames.toSeq ==
        t.fieldNames.toSeq ++ incoming.fieldNames.toSeq, s"seed $seed")
      t.fields.foreach(f =>
        assert(merged(f.name).dataType == nullable(f.dataType)))
      incoming.fields.foreach(f =>
        assert(merged(f.name).dataType == nullable(f.dataType)))
    }
  }

  test("conflict: a changed leaf type under any common path throws naming the path") {
    // hand-picked nested shapes — random pairs rarely collide usefully
    val table = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("tags", ArrayType(StringType)),
        StructField("score", DoubleType)))),
      StructField("kv", MapType(StringType, LongType))))
    def expectConflict(incoming: StructType, path: String): Unit = {
      val e = intercept[IllegalArgumentException](
        Snapshots.mergeSchemas(table, incoming, "prop"))
      assert(e.getMessage.contains(path), s"$path not in: ${e.getMessage}")
    }
    expectConflict(StructType(Seq(StructField("id", StringType))), "'id'")
    expectConflict(StructType(Seq(StructField("meta", StructType(Seq(
      StructField("score", StringType)))))), "'meta.score'")
    expectConflict(StructType(Seq(StructField("meta", StructType(Seq(
      StructField("tags", ArrayType(LongType))))))), "'meta.tags.element'")
    expectConflict(StructType(Seq(
      StructField("kv", MapType(StringType, StringType)))), "'kv.value'")
    expectConflict(StructType(Seq(StructField("meta", LongType))), "'meta'")
    // nullability alone is NEVER a conflict
    val relaxed = StructType(table.fields.map(f =>
      StructField(f.name, f.dataType, nullable = !f.nullable)))
    assert(Snapshots.mergeSchemas(table, relaxed, "prop") == nullable(table))
  }
}
