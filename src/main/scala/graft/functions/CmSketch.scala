package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a native aggregate — POINT-frequency estimation
  * with O(depth × width) state, the complement of [[HeavyHitters]]
  * (Misra–Gries finds WHICH items are frequent; Count-Min answers "how
  * often did THIS item occur" for any item, without holding the key
  * space). The exact formulation is a key-space-sized groupBy; this is
  * a fixed-size counter grid that merges by element-wise addition —
  * re-aggregable, partition-order independent, streaming-state friendly.
  *
  * Row hashes are the four disjoint 32-bit slices of ONE md5 per update
  * (the [[HashOps.minhashBands]] digest-slice construction), so
  * `depth <= 4`, updates cost a single digest, and the ESTIMATE side is
  * expressible in plain SQL over the emitted grid:
  * `est(x) = min_d grid[d][ (md5-slice d of x) % width ]` — which is
  * how the oracle replays it. Estimates NEVER undercount (each grid
  * cell only ever gains); overcount per row is bounded by hash
  * collisions (expected n/width per row, min over depth rows).
  *
  * `graft_cms(item string, depth int, width int)` returns the grid as
  * `array<array<bigint>>` (depth rows × width columns). Null items are
  * ignored. */
case class CmSketch(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with TernaryLike[Expression] {

  private lazy val depth: Int = second.eval().asInstanceOf[Number].intValue()
  private lazy val width: Int = third.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string item, got ${first.dataType.simpleString}")
    else if (!second.foldable || second.dataType != IntegerType ||
      second.eval() == null || second.eval().asInstanceOf[Number].intValue() < 1 ||
      second.eval().asInstanceOf[Number].intValue() > 4)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName depth must be an int literal in [1, 4] (md5 yields 4 disjoint slices)")
    else if (!third.foldable || third.dataType != IntegerType ||
      third.eval() == null || third.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName width must be a positive int literal")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = CmSketch.name

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = first.eval(input)
    if (v != null) {
      val d = CmSketch.md5.get().digest(v.asInstanceOf[UTF8String].getBytes)
      var r = 0
      while (r < depth) {
        // unsigned 32-bit slice r of the digest, mod width — the same
        // value SQL's TRY_CAST('0x' || substring(md5(x), 8r+1, 8)) sees
        val h = ((d(4 * r) & 0xffL) << 24) | ((d(4 * r + 1) & 0xffL) << 16) |
          ((d(4 * r + 2) & 0xffL) << 8) | (d(4 * r + 3) & 0xffL)
        buf(r * width + (h % width).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData((0 until depth).map { r =>
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, r * width, (r + 1) * width))
    }.toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(buf.length * 8 + 4)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CmSketch =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CmSketch {
  val name = "graft_cms"

  private[functions] val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[CmSketch].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"$name expects exactly 3 arguments (item, depth, width), got ${children.length}")
      CmSketch(children(0), children(1), children(2))
    })

  /** Column form: the depth × width counter grid. */
  def cms(item: Column, depth: Int, width: Int): Column =
    call_function(name, item, lit(depth), lit(width))
}
