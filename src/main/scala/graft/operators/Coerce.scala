package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Lenient

/** T1 assembled — the schema-driven lenient coercion stage (reference
  * dump-es-parquet:112-183, SURVEY.md §1.4): walk a target StructType and
  * coerce whatever the source DataFrame holds into it, field by field,
  * with the reference's log-and-null semantics.
  *
  * Rules reproduced:
  *   - unknown source fields are dropped (projection to the target schema,
  *     reference :117-118);
  *   - missing target fields become typed nulls (schema fixed up front);
  *   - list values scalarize to their first element, empty -> null (:132-137);
  *   - numerics/timestamps/strings go through the Lenient combinators;
  *   - nested structs recurse (:139-144).
  *
  * Everything is a pure Column expression — the whole stage collapses into
  * one codegen'd projection, so at 100 TB it costs a map, never a shuffle.
  * Observability (T6) is via `withMetrics`: `df.observe` metrics counting
  * rows nulled per field — Spark's accumulator-backed, dedup-by-definition
  * equivalent of the reference's warning counters (:85,304-305,352-353).
  */
object Coerce {

  /** Expression coercing `src` (typed as in the source schema) to `target`. */
  def coerceColumn(src: Column, srcType: DataType, target: DataType): Column =
    (srcType, target) match {
      // native ArrayType target (beyond the reference, e.g. embeddings)
      case (ArrayType(_, _), at: ArrayType) => src.cast(at)
      // T2 first-of-list scalarization, then coerce the element
      case (ArrayType(et, _), t) =>
        coerceColumn(Lenient.firstOfList(src), et, t)
      case (s, t) if s == t => src
      case (_, ByteType | ShortType | IntegerType | LongType) =>
        Lenient.lenientLong(src).cast(target)
      case (_, FloatType | DoubleType) =>
        Lenient.lenientDouble(src).cast(target)
      case (st: StructType, TimestampType) => lit(null).cast(TimestampType)
      // numeric sources skip string round-tripping: a double epoch like
      // 1.7000000005e9 stringifies in E-notation, which the digits regex
      // would miss — truncate toward zero (Python int(float)) and apply
      // the epoch heuristic directly, matching MapSource's number branch
      case (ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType,
            TimestampType) =>
        Lenient.epochToTimestamp(src.cast("long"))
      case (_, TimestampType) => Lenient.lenientTimestamp(src)
      case (st: StructType, StringType) => to_json(src) // object -> raw JSON
      case (_, StringType) => Lenient.lenientString(src)
      case (_, BooleanType) => src.cast("string").cast(BooleanType)
      // nested struct target: rebuild field by field (recursion, :139-144)
      case (s: StructType, t: StructType) =>
        val fields = t.fields.flatMap { tf =>
          s.find(_.name == tf.name) match {
            case Some(sf) =>
              Seq(lit(tf.name), coerceColumn(src.getField(tf.name), sf.dataType, tf.dataType))
            case None => Seq(lit(tf.name), lit(null).cast(tf.dataType))
          }
        }
        when(src.isNotNull, struct_from(fields.toSeq)).otherwise(lit(null).cast(t))
      case _ => lit(null).cast(target)
    }

  private def struct_from(nameValuePairs: Seq[Column]): Column = {
    // named_struct('a', col, 'b', col, ...)
    call_function("named_struct", nameValuePairs: _*)
  }

  /** Project `df` onto `target`: drop unknown columns, null-fill missing
    * ones, lenient-coerce the rest. */
  def apply(target: StructType)(df: DataFrame): DataFrame = {
    val srcFields = df.schema.fields.map(f => f.name -> f).toMap
    val cols = target.fields.map { tf =>
      srcFields.get(tf.name) match {
        case Some(sf) => coerceColumn(col(s"`${tf.name}`"), sf.dataType, tf.dataType).as(tf.name)
        case None     => lit(null).cast(tf.dataType).as(tf.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** T6 — coercion observability: wrap the coerced frame with an `observe`
    * node counting, per target field, rows where the input was present but
    * the coerced value is null (the reference's per-message warning
    * counters, flushed once per table). Read back via
    * `QueryExecution.observedMetrics` or a QueryExecutionListener.
    */
  def withMetrics(target: StructType, metricName: String = "graft_coerce")(df: DataFrame): DataFrame =
    build(target, df, w => cs => w.observe(metricName, cs.head, cs.tail: _*))

  /** Like [[withMetrics]] but bound to an [[org.apache.spark.sql.Observation]]:
    * the caller can block on `obs.get` after its action and read the
    * counters directly (how DumpJob flushes per-table warnings). Returns
    * the coerced frame and whether the observation was attached (no
    * overlapping fields -> nothing to count -> `obs.get` would hang). */
  def withObservation(target: StructType, obs: org.apache.spark.sql.Observation)(
      df: DataFrame): (DataFrame, Boolean) = {
    var attached = false
    val out = build(target, df, w => cs => { attached = true; w.observe(obs, cs.head, cs.tail: _*) })
    (out, attached)
  }

  private def build(target: StructType, df: DataFrame,
                    attach: DataFrame => Seq[Column] => DataFrame): DataFrame = {
    val srcFields = df.schema.fields.map(f => f.name -> f).toMap
    // keep source and coerced columns side by side so the metrics can
    // compare "input present, output lost" per field, then project down
    val coercedCols = target.fields.toSeq.map { tf =>
      val c = srcFields.get(tf.name) match {
        case Some(sf) => coerceColumn(col(s"`${tf.name}`"), sf.dataType, tf.dataType)
        case None     => lit(null).cast(tf.dataType)
      }
      c.as(s"__coerced_${tf.name}")
    }
    val wide = df.select(df.columns.toSeq.map(c => col(s"`$c`")) ++ coercedCols: _*)
    val counters = target.fields.toSeq.collect {
      case tf if srcFields.contains(tf.name) =>
        sum(when(col(s"`${tf.name}`").isNotNull &&
                 col(s"`__coerced_${tf.name}`").isNull, 1L).otherwise(0L))
          .as(s"null_${tf.name}")
    }
    val observed = if (counters.isEmpty) wide else attach(wide)(counters)
    observed.select(target.fields.toSeq.map(tf =>
      col(s"`__coerced_${tf.name}`").as(tf.name)): _*)
  }
}
