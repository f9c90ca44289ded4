package graft.sources.jsonl

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Evaluates pushed-down source filters against coerced rows inside the
  * DSv2 reader (P1). Only simple top-level comparisons are claimed
  * (`supported`); Spark re-evaluates everything above the scan, so this
  * only needs to be sound for rows it DROPS: a row is dropped only when a
  * pushed predicate definitely evaluates false (three-valued logic:
  * null comparisons keep the row and let Spark decide). */
object RowFilter {

  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNull | _: IsNotNull => true
    case _ => false
  }

  def apply(schema: StructType, filters: Array[Filter]): InternalRow => Boolean = {
    val evals = filters.filter(supported).flatMap(compile(schema, _))
    if (evals.isEmpty) _ => true
    else row => evals.forall(_(row))
  }

  private def compile(schema: StructType, f: Filter): Option[InternalRow => Boolean] = {
    def idx(name: String): Option[(Int, DataType)] = {
      val i = schema.fieldNames.indexOf(name)
      if (i < 0) None else Some((i, schema(i).dataType))
    }

    // SQL equates -0.0 with 0.0; Double/Float.compareTo does not — without
    // normalization a pushed `d = 0.0` would unsoundly drop a -0.0 row
    // that Spark's own residual evaluation keeps. (NaN needs no special
    // case: compareTo's NaN-equal/NaN-greatest matches SQL ordering.)
    def norm(x: Any): Any = x match {
      case d: java.lang.Double => java.lang.Double.valueOf(d.doubleValue() + 0.0d)
      case f: java.lang.Float  => java.lang.Float.valueOf(f.floatValue() + 0.0f)
      case other => other
    }

    def cmp(name: String, value: Any)(keep: Int => Boolean): Option[InternalRow => Boolean] =
      idx(name).flatMap { case (i, dt) =>
        lit(value, dt).map { v =>
          val nv = norm(v)
          row =>
            // every internal scalar rep (boxed numbers, UTF8String,
            // Boolean) is Comparable against its own type
            row.isNullAt(i) ||
              keep(norm(row.get(i, dt)).asInstanceOf[Comparable[Any]].compareTo(nv))
        }
      }

    f match {
      case EqualTo(a, v)            => cmp(a, v)(_ == 0)
      case GreaterThan(a, v)        => cmp(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v)(_ >= 0)
      case LessThan(a, v)           => cmp(a, v)(_ < 0)
      case LessThanOrEqual(a, v)    => cmp(a, v)(_ <= 0)
      case IsNull(a)    => idx(a).map { case (i, _) => row => row.isNullAt(i) }
      case IsNotNull(a) => idx(a).map { case (i, _) => row => !row.isNullAt(i) }
      case _ => None
    }
  }

  /** External literal -> the internal representation `coerce` produces. */
  private def lit(value: Any, dt: DataType): Option[Any] = (value, dt) match {
    case (null, _) => None // null literals: let Spark handle 3VL above
    case (s: String, StringType) => Some(UTF8String.fromString(s))
    case (n: Number, ByteType) => Some(n.byteValue())
    case (n: Number, ShortType) => Some(n.shortValue())
    case (n: Number, IntegerType) => Some(n.intValue())
    case (n: Number, LongType) => Some(n.longValue())
    case (n: Number, FloatType) => Some(n.floatValue())
    case (n: Number, DoubleType) => Some(n.doubleValue())
    case (b: java.lang.Boolean, BooleanType) => Some(b.booleanValue())
    case (t: java.sql.Timestamp, TimestampType) =>
      Some(t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L)
    case _ => None
  }

}
