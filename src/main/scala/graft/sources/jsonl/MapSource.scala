package graft.sources.jsonl

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Lenient

/** The reference's `map_source` document→row coercion
  * (dump-es-parquet:112-183, SURVEY §1.4) as a JsonNode → InternalRow
  * kernel for the DSv2 reader. Shares its semantics (and constants) with
  * the Column-based Coerce/Lenient stage; CoerceSpec + JsonlSourceSpec pin
  * the two implementations to each other.
  *
  * Rules: unknown fields dropped by construction (we walk the schema, not
  * the document); missing/null -> null; array -> first element, empty ->
  * null (:132-137); nested object -> recurse (:139-144); every conversion
  * failure -> null, never throw.
  */
object MapSource {

  def coerce(doc: JsonNode, schema: StructType): InternalRow = {
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      values(i) = coerceValue(field(doc, f.name), f.dataType)
      i += 1
    }
    new GenericInternalRow(values)
  }

  private def field(doc: JsonNode, name: String): JsonNode =
    if (doc == null || !doc.has(name)) null else doc.get(name)

  /** T2: multi-valued field -> first element; empty -> omitted (null). */
  private def scalarize(v: JsonNode): JsonNode =
    if (v != null && v.isArray) { if (v.size() > 0) v.get(0) else null } else v

  def coerceValue(raw: JsonNode, target: DataType): Any = {
    val v = target match {
      case _: ArrayType => raw // native arrays pass through un-scalarized
      case _            => scalarize(raw)
    }
    if (v == null || v.isNull) return null
    target match {
      case ByteType    => box(longOf(v))(_.toByte)
      case ShortType   => box(longOf(v))(_.toShort)
      case IntegerType => box(longOf(v))(_.toInt)
      case LongType    => box(longOf(v))(identity)
      case FloatType   => box(doubleOf(v))(_.toFloat)
      case DoubleType  => box(doubleOf(v))(identity)
      case BooleanType => booleanOf(v)
      case StringType  =>
        // str(v); objects/arrays keep their raw JSON (reference's
        // `object` handling)
        UTF8String.fromString(if (v.isTextual) v.asText else v.toString)
      case TimestampType => timestampMicros(v)
      case st: StructType => if (v.isObject) coerce(v, st) else null
      case ArrayType(et, _) =>
        if (!v.isArray) null
        else {
          val arr = new Array[Any](v.size())
          var i = 0
          while (i < arr.length) { arr(i) = coerceValue(v.get(i), et); i += 1 }
          new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
        }
      case _ => null
    }
  }

  private def box[T](l: Option[T])(f: T => Any): Any = l match {
    case Some(x) => f(x)
    case None    => null
  }

  /** Python int(v) with int(float(v)) fallback (reference :163-170). */
  private def longOf(v: JsonNode): Option[Long] =
    if (v.isIntegralNumber) Some(v.asLong())
    else if (v.isFloatingPointNumber) Some(v.asDouble().toLong) // trunc toward 0
    else if (v.isTextual) {
      val s = v.asText.trim
      s.toLongOption.orElse(s.toDoubleOption.map(_.toLong))
    } else None

  /** Mirrors the Column stage's `cast(string).cast(boolean)` (Coerce:46):
    * Spark's non-ANSI string→boolean accepts t/true/y/yes/1 and
    * f/false/n/no/0, trimmed and case-insensitive — so the same dumped
    * document reads back identically through either path. */
  private def booleanOf(v: JsonNode): Any =
    if (v.isBoolean) java.lang.Boolean.valueOf(v.asBoolean)
    else if (v.isTextual || v.isNumber) {
      (if (v.isTextual) v.asText else v.toString).trim.toLowerCase match {
        case "t" | "true" | "y" | "yes" | "1" => java.lang.Boolean.TRUE
        case "f" | "false" | "n" | "no" | "0" => java.lang.Boolean.FALSE
        case _                                => null
      }
    } else null

  /** Python float(v) (reference :171-175). */
  private def doubleOf(v: JsonNode): Option[Double] =
    if (v.isNumber) Some(v.asDouble())
    else if (v.isTextual) v.asText.trim.toDoubleOption
    else None

  /** ISO-8601 first, else epoch with the 2e10 seconds/millis heuristic
    * bounded to Python datetime's range (reference :145-162); null on
    * anything unparseable. Returns micros since epoch (UTC). */
  def timestampMicros(v: JsonNode): Any = {
    def fromEpoch(l: Long): Any =
      if (l < Lenient.EpochBoundary) {
        if (l >= Lenient.MinEpochSeconds) java.lang.Long.valueOf(l * 1000000L) else null
      } else {
        if (l <= Lenient.MaxEpochMillis) java.lang.Long.valueOf(l * 1000L) else null
      }
    if (v.isIntegralNumber) fromEpoch(v.asLong())
    else if (v.isFloatingPointNumber) fromEpoch(v.asDouble().toLong)
    else if (v.isTextual) {
      val s = v.asText.trim
      if (s.matches("^-?\\d+$")) s.toLongOption.map(fromEpoch).orNull
      else parseIso(s)
    } else null
  }

  private def parseIso(s: String): Any = {
    import java.time._
    import java.time.format.DateTimeFormatter
    val norm = if (s.length > 10 && s.charAt(10) == ' ') s.updated(10, 'T') else s
    def micros(i: Instant) = java.lang.Long.valueOf(
      i.getEpochSecond * 1000000L + i.getNano / 1000L)
    try micros(OffsetDateTime.parse(norm).toInstant)
    catch { case _: Exception =>
      try micros(LocalDateTime.parse(norm).toInstant(ZoneOffset.UTC))
      catch { case _: Exception =>
        try micros(LocalDate.parse(norm, DateTimeFormatter.ISO_LOCAL_DATE)
          .atStartOfDay(ZoneOffset.UTC).toInstant)
        catch { case _: Exception => null }
      }
    }
  }
}
