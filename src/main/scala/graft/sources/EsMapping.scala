package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** S2 — schema inference from an Elasticsearch/OpenSearch mapping document
  * (reference dump-es-parquet:185-204 fetch, :97-110 recursive map, :33-49
  * type table; SURVEY.md §1.2-1.3).
  *
  * The schema is inferred once per table from the mapping, BEFORE reading
  * any data, and is then fixed — fields in documents but not in the schema
  * are dropped (reference :117-118). Unhandled mapping types are dropped
  * with a warning (reference :107-109).
  */
object EsMapping {

  private val mapper = new ObjectMapper()

  /** ES mapping `type` → Spark type (reference dump-es-parquet:33-49).
    * `object` (no properties) → stringified JSON, like the reference. */
  val typeTable: Map[String, DataType] = Map(
    "byte"       -> ByteType,
    "short"      -> ShortType,
    "integer"    -> IntegerType,
    "long"       -> LongType,
    "half_float" -> FloatType,
    "float"      -> FloatType,
    "double"     -> DoubleType,
    "string"     -> StringType,
    "text"       -> StringType,
    "keyword"    -> StringType,
    "boolean"    -> BooleanType,
    "date"       -> TimestampType,
    "ip"         -> StringType,
    "object"     -> StringType,
    "geo_point"  -> StructType(Seq(
      StructField("lat", DoubleType), StructField("lon", DoubleType))),
  )

  /** Map a `properties` JSON object to a StructType; returns the schema and
    * the warnings for dropped (unhandled-type) fields. Nested objects with
    * `properties` recurse into StructType (reference :101-105); leaves use
    * the type table; anything else is dropped with a warning (:107-109).
    */
  def fromProperties(props: JsonNode): (StructType, Seq[String]) = {
    val warnings = Seq.newBuilder[String]
    def walk(node: JsonNode): StructType = StructType(
      node.properties().asScala.toSeq.flatMap { e =>
        val (name, spec) = (e.getKey, e.getValue)
        if (spec.has("properties")) {
          Some(StructField(name, walk(spec.get("properties"))))
        } else {
          val tpe = Option(spec.get("type")).map(_.asText).getOrElse("object")
          typeTable.get(tpe) match {
            case Some(dt) => Some(StructField(name, dt))
            case None =>
              warnings += s"unhandled es mapping type '$tpe' for field '$name'"
              None
          }
        }
      })
    val st = walk(props)
    (st, warnings.result())
  }

  /** Parse a raw `{"properties": {...}}` mapping JSON. */
  def toStructType(mappingJson: String): (StructType, Seq[String]) = {
    val root = mapper.readTree(mappingJson)
    val props = if (root.has("properties")) root.get("properties") else root
    fromProperties(props)
  }

  /** Full `indices.get_mapping` response shape: `{index: {mappings: ...}}`.
    * ES7+/OpenSearch has `mappings.properties` directly; legacy multi-
    * doc-type mappings take the FIRST doc type (reference :196-203).
    */
  def fromMappingResponse(responseJson: String, index: String): (StructType, Seq[String]) = {
    val mappings = mapper.readTree(responseJson).get(index).get("mappings")
    val props =
      if (mappings.has("properties")) mappings.get("properties")
      else { // legacy: {doc_type: {properties: ...}}; first doc type wins
        val firstType = mappings.properties().asScala.head.getValue
        firstType.get("properties")
      }
    fromProperties(props)
  }
}
