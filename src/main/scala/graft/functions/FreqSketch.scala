package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native aggregate — frequent-item
  * detection with O(k) state, the sketch shape for "which n-grams/tokens
  * dominate this corpus" when the key space is too large to groupBy
  * (n-grams at 100 TB): the exact formulation shuffles a key-space-sized
  * aggregate; this carries at most k counters per partition.
  *
  * Stream update is classic Misra–Gries (increment a held counter, else
  * claim a free slot, else decrement ALL counters — each decrement round
  * "spends" k+1 occurrences, so an item with true count c is reported
  * with c − n/(k+1) ≤ ĉ ≤ c, and EVERY item with c > n/(k+1) is
  * guaranteed present). Partial buffers merge by summing counters and
  * re-trimming: subtract the (k+1)-th largest combined count from every
  * entry and drop the non-positives (Agarwal et al., "Mergeable
  * Summaries" — the error bound adds across merges, staying ≤ n/(k+1)
  * total). Estimates never exceed true counts.
  *
  * `graft_heavy_hitters(item string, k int)` returns
  * `array<struct<item, cnt>>` sorted count desc, item asc. Null items
  * are ignored; an empty group yields an empty array.
  */
case class HeavyHitters(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with BinaryLike[Expression] {

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string item, got ${left.dataType.simpleString}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be an int literal")
    else if (right.eval() == null || right.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = HeavyHitters.name

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = left.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k =>
          // clone: unsafe-row-backed UTF8Strings alias reused buffers
          buf.update(item.clone(), 1L)
        case None =>
          // decrement-all: spends one occurrence of each held item plus
          // this one — the k+1 denominator in the error bound
          val dead = buf.collect { case (i, 1L) => i }
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (i, c) =>
      buf.update(i, buf.getOrElse(i, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count; at most k survive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - k - 1)
      val dead = buf.collect { case (i, c) if c <= sub => i }
      buf.mapValuesInPlace((_, c) => c - sub)
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0)
    }
    new GenericArrayData(sorted.map { case (i, c) => InternalRow(i, c) })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val b = i.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HeavyHitters =
    copy(left = newLeft, right = newRight)
}

object HeavyHitters {
  val name = "graft_heavy_hitters"

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[HeavyHitters].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments (item, k), got ${children.length}")
      HeavyHitters(children(0), children(1))
    })

  /** Column form: `array<struct<item, cnt>>`, count desc then item asc. */
  def heavyHitters(item: Column, k: Int): Column =
    call_function(name, item, lit(k))
}
