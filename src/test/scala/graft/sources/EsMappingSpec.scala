package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** S2 schema inference (reference dump-es-parquet:33-49,97-110,185-204).
  * Pure Scala — no Spark session needed. */
class EsMappingSpec extends AnyFunSuite {

  test("full type table maps per reference :33-49") {
    val json =
      """{"properties": {
        |  "b": {"type": "byte"}, "s": {"type": "short"},
        |  "i": {"type": "integer"}, "l": {"type": "long"},
        |  "hf": {"type": "half_float"}, "f": {"type": "float"},
        |  "d": {"type": "double"}, "t": {"type": "text"},
        |  "k": {"type": "keyword"}, "bo": {"type": "boolean"},
        |  "dt": {"type": "date"}, "ip": {"type": "ip"},
        |  "o": {"type": "object"}
        |}}""".stripMargin
    val (st, warnings) = EsMapping.toStructType(json)
    val types = st.fields.map(f => f.name -> f.dataType).toMap
    assert(types("b") == ByteType && types("s") == ShortType)
    assert(types("i") == IntegerType && types("l") == LongType)
    assert(types("hf") == FloatType && types("f") == FloatType)
    assert(types("d") == DoubleType)
    assert(types("t") == StringType && types("k") == StringType)
    assert(types("bo") == BooleanType && types("dt") == TimestampType)
    assert(types("ip") == StringType && types("o") == StringType)
    assert(warnings.isEmpty)
  }

  test("geo_point becomes lat/lon double struct (reference :46)") {
    val (st, _) = EsMapping.toStructType("""{"properties": {"g": {"type": "geo_point"}}}""")
    assert(st("g").dataType == StructType(Seq(
      StructField("lat", DoubleType), StructField("lon", DoubleType))))
  }

  test("nested properties recurse into StructType (reference :101-105)") {
    val json =
      """{"properties": {"a": {"properties": {
        |  "b": {"type": "long"},
        |  "c": {"properties": {"d": {"type": "keyword"}}}
        |}}}}""".stripMargin
    val (st, _) = EsMapping.toStructType(json)
    val a = st("a").dataType.asInstanceOf[StructType]
    assert(a("b").dataType == LongType)
    assert(a("c").dataType.asInstanceOf[StructType]("d").dataType == StringType)
  }

  test("unhandled types are dropped with a warning (reference :107-109)") {
    val (st, warnings) = EsMapping.toStructType(
      """{"properties": {"n": {"type": "nested"}, "ok": {"type": "long"}}}""")
    assert(st.fieldNames.toSeq == Seq("ok"))
    assert(warnings.exists(_.contains("nested")))
  }

  test("ES7+ get_mapping response shape (reference :196-199)") {
    val resp =
      """{"myindex": {"mappings": {"properties": {"x": {"type": "long"}}}}}"""
    val (st, _) = EsMapping.fromMappingResponse(resp, "myindex")
    assert(st("x").dataType == LongType)
  }

  test("legacy multi-doc-type mapping takes the first doc type (reference :200-203)") {
    val resp =
      """{"old": {"mappings": {
        |  "doc_a": {"properties": {"x": {"type": "keyword"}}},
        |  "doc_b": {"properties": {"y": {"type": "long"}}}
        |}}}""".stripMargin
    val (st, _) = EsMapping.fromMappingResponse(resp, "old")
    assert(st.fieldNames.toSeq == Seq("x"))
  }
}
