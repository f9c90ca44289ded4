package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Deterministic ordered double sum as a native aggregate — the kernel
  * form of the engine's reproducible-sum discipline.
  *
  * Every floating reduction that must hash-match the DuckDB oracle is an
  * ORDERED fold: sum the group's values in ascending `ord` order, so two
  * runs (and two engines) add doubles in the same sequence. The
  * composable spelling — `aggregate(array_sort(collect_list(struct(ord,
  * v))), 0.0, (acc, s) -> acc + s.v)` — buffers every element as a
  * Catalyst struct, sorts interpreted, and folds through a non-codegen
  * lambda: measured, it dominates the gradient-descent trainers (q184
  * runs 10 such folds per iteration). This aggregate keeps a primitive
  * (long, double) buffer, sorts once at eval, and sums in a tight loop —
  * identical IEEE result by construction (same order, same strict
  * left-to-right `+`, same 0.0 init).
  *
  * `graft_ordered_sum(ord bigint, v double)` returns double. An empty
  * group yields 0.0 — same as folding collect_list's empty array, where
  * the 0.0 seed comes straight through. A null `v` poisons the group to
  * null (in the fold, acc + null = null and every later step stays
  * null); a null `ord` cannot occur at the call sites (row ids are
  * non-null by construction) and is treated as poison too, rather than
  * silently ordered.
  *
  * Tie order: `ord` then `v` under Spark's double ordering (NaN greatest,
  * ±0.0 equal) — the same total order `array_sort` applies to
  * `struct(ord, v)`. Ties only matter when equal `ord` carries different
  * `v`, which no current call site produces (ids are unique per group).
  */
case class OrderedSum(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OrderedSum.Buf]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType || right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, double) arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = OrderedSum.name

  override def createAggregationBuffer(): OrderedSum.Buf = new OrderedSum.Buf()

  override def update(buf: OrderedSum.Buf, input: InternalRow): OrderedSum.Buf = {
    val o = left.eval(input)
    val v = right.eval(input)
    if (o == null || v == null) buf.poisoned = true
    else buf.add(o.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: OrderedSum.Buf, other: OrderedSum.Buf): OrderedSum.Buf = {
    buf.poisoned ||= other.poisoned
    buf.addAll(other)
    buf
  }

  override def eval(buf: OrderedSum.Buf): Any =
    if (buf.poisoned) null else buf.orderedSum()

  override def serialize(buf: OrderedSum.Buf): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeBoolean(buf.poisoned)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeLong(buf.ords(i)); out.writeDouble(buf.vals(i)); i += 1
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): OrderedSum.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.poisoned = in.readBoolean()
    val n = in.readInt()
    (1 to n).foreach(_ => buf.add(in.readLong(), in.readDouble()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OrderedSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OrderedSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OrderedSum =
    copy(left = newLeft, right = newRight)
}

object OrderedSum {
  val name = "graft_ordered_sum"

  /** Growable primitive-array pair buffer — no boxing, no per-element
    * allocation; sort happens once at eval over index permutation. */
  final class Buf {
    var poisoned = false
    var size = 0
    var ords = new Array[Long](16)
    var vals = new Array[Double](16)
    def add(o: Long, v: Double): Unit = {
      if (size == ords.length) {
        ords = java.util.Arrays.copyOf(ords, size * 2)
        vals = java.util.Arrays.copyOf(vals, size * 2)
      }
      ords(size) = o; vals(size) = v; size += 1
    }
    def addAll(other: Buf): Unit = {
      var i = 0
      while (i < other.size) { add(other.ords(i), other.vals(i)); i += 1 }
    }
    /** Spark's double total order for the value tie-break: NaN greatest
      * (and equal to itself), ±0.0 equal — `nanSafeCompareDoubles`. */
    private def cmpV(a: Double, b: Double): Int =
      if (a < b) -1 else if (a > b) 1
      else {
        val na = java.lang.Double.isNaN(a); val nb = java.lang.Double.isNaN(b)
        if (na && nb) 0 else if (na) 1 else if (nb) -1 else 0
      }
    def orderedSum(): Double = {
      val idx = Array.range(0, size)
      // boxed index sort (size-bounded, once per group at eval) — the
      // ELEMENTS stay primitive; this replaces a full Catalyst struct
      // array sort plus an interpreted fold per group
      val sorted = idx.sortWith { (i, j) =>
        val c = java.lang.Long.compare(ords(i), ords(j))
        (if (c != 0) c else cmpV(vals(i), vals(j))) < 0
      }
      var s = 0.0
      var i = 0
      while (i < size) { s += vals(sorted(i)); i += 1 }
      s
    }
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[OrderedSum].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments (ord, value), got ${children.length}")
      OrderedSum(children(0), children(1))
    })

  /** Column form: sum of `value` in ascending (`ord`, value) order.
    * Casts cover what ImplicitCastInputTypes would have done. */
  def orderedSum(ord: Column, value: Column): Column =
    call_function(name, ord.cast("long"), value.cast("double"))

  /** [[orderedSum]] when the order column is integral — else the
    * composable struct-sort fold, so non-integral ids (UUID strings)
    * keep their own sort order rather than null-casting away. Callers
    * pass the order column's resolved type; results are identical
    * either way for integral ids (same order, same strict left fold). */
  def orderedSumBy(ord: Column, value: Column, ordType: DataType): Column =
    ordType match {
      case ByteType | ShortType | IntegerType | LongType =>
        orderedSum(ord, value)
      case _ =>
        import org.apache.spark.sql.functions._
        aggregate(
          array_sort(collect_list(struct(ord.as("__o"), value.as("__s")))),
          lit(0.0), (acc, s) => acc + s.getField("__s"))
    }
}
