package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bounded top-k as a native aggregate — the scale-correct form of
  * "top k per group".
  *
  * The window form (`row_number() over (partition by g order by score)`)
  * must shuffle and SORT every candidate row of a group onto one task
  * before it can cut to k. This aggregate keeps a k-bounded heap per
  * group instead: partial aggregation trims to k on the map side, so the
  * shuffle carries at most `groups × k` entries no matter how many
  * candidates exist — at 100 TB the difference between shuffling the
  * candidate set and shuffling the answer. State is O(k), re-aggregable,
  * and deterministic (ties break toward the smaller id, the same
  * `ORDER BY score DESC, id` rule as the window form).
  *
  * `graft_topk(score double, id long, k int)` returns
  * `array<struct<id,score>>` sorted best-first. Null score or id rows are
  * ignored; an empty group yields an empty array.
  */
case class TopKByScore(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with TernaryLike[Expression] {

  // head of the queue = the WORST of the kept entries (lowest score;
  // ties: larger id), i.e. the one a better candidate evicts
  private val worstFirst: Ordering[(Double, Long)] = (a, b) => {
    val c = java.lang.Double.compare(b._1, a._1)
    if (c != 0) c else java.lang.Long.compare(a._2, b._2)
  }

  private lazy val k: Int = third.eval().asInstanceOf[Number].intValue()

  // ImplicitCastInputTypes is sealed away from third-party packages in
  // Spark 4, so exact types are required here and the Column helper
  // ([[TopKByScore.topk]]) inserts the casts.
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != DoubleType || second.dataType != LongType ||
        third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint, int) arguments, got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    else if (!third.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a literal")
    else if (third.eval() == null || third.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = TopKByScore.name

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def add(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(buf.head, e) > 0) { buf.dequeue(); buf.enqueue(e) }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = first.eval(input)
    val i = second.eval(input)
    if (s != null && i != null)
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortWith { (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    }
    new GenericArrayData(best.map { case (s, i) => InternalRow(i, s) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (1 to n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKByScore =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TopKByScore {
  val name = "graft_topk"

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[TopKByScore].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"$name expects exactly 3 arguments (score, id, k), got ${children.length}")
      TopKByScore(children(0), children(1), children(2))
    })

  /** Column form: `array<struct<id,score>>` of the k best, best-first.
    * Casts cover what ImplicitCastInputTypes would have done. */
  def topk(score: Column, id: Column, k: Int): Column =
    call_function(name, score.cast("double"), id.cast("long"), lit(k))
}
