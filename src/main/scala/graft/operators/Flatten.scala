package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** Struct flatten (T3): recursively hoist nested struct fields to top-level
  * columns named `parent_child` (reference dump-es-parquet:97-110,139-144;
  * rationale README.md:14 — flattened columns merge across tables and are
  * required for CSV output).
  *
  * Pure projection — Catalyst collapses it into the scan's ReadSchema, so
  * flattening never materializes the intermediate struct.
  */
object Flatten {

  /** Column list flattening `schema`, e.g. a.{b,c:{d}} -> a_b, a_c_d. */
  def columns(schema: StructType, prefix: String = "", path: String = ""): Seq[Column] =
    schema.fields.toSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        columns(st, s"$prefix${name}_", s"$path`$name`.")
      case StructField(name, _, _, _) =>
        Seq(col(s"$path`$name`").alias(s"$prefix$name"))
    }

  def apply(df: DataFrame): DataFrame = df.select(columns(df.schema): _*)

  /** Flattened shape of a schema, for schema-only callers (sinks, tests). */
  def schema(s: StructType, prefix: String = ""): StructType =
    StructType(s.fields.toSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        schema(st, s"$prefix${name}_").fields
      case f => Seq(f.copy(name = s"$prefix${f.name}"))
    })
}
