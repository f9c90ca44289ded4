package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of an `array<double>` column as a native aggregate —
  * the scale-correct form of "centroid = mean of member vectors".
  *
  * The composable form (`posexplode` → `groupBy(key, pos).avg` →
  * re-assemble) amplifies every n-row group into n × dim (pos, value)
  * rows that cross TWO exchanges before collapsing back — at dim=768
  * that is a 768× row amplification through the shuffle, paid on every
  * k-means iteration. This aggregate keeps one dim-length sums array and
  * one dim-length counts array per group: partial aggregation folds the
  * members map-side, so the single shuffle carries `groups × partitions`
  * buffers of O(dim) instead of `n × dim` rows. State is bounded,
  * re-aggregable, and matches the composable form's null semantics
  * (per-position counts: a null element just doesn't count at its
  * position; positions never seen stay null; a null vector contributes
  * nothing).
  *
  * `graft_vec_mean(emb array<double>)` returns `array<double>` of
  * per-position means, sized to the longest vector seen; an all-null
  * group yields null.
  */
case class VecMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanAgg.Buffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = VecMeanAgg.name

  override def createAggregationBuffer(): VecMeanAgg.Buffer = new VecMeanAgg.Buffer

  override def update(buf: VecMeanAgg.Buffer, input: InternalRow): VecMeanAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.grow(n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          buf.sums(i) += arr.getDouble(i)
          buf.counts(i) += 1L
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: VecMeanAgg.Buffer, other: VecMeanAgg.Buffer): VecMeanAgg.Buffer = {
    buf.grow(other.dim)
    var i = 0
    while (i < other.dim) {
      buf.sums(i) += other.sums(i)
      buf.counts(i) += other.counts(i)
      i += 1
    }
    buf
  }

  override def eval(buf: VecMeanAgg.Buffer): Any =
    if (buf.dim == 0) null
    else {
      val out = new Array[Any](buf.dim)
      var i = 0
      while (i < buf.dim) {
        out(i) = if (buf.counts(i) == 0L) null else buf.sums(i) / buf.counts(i)
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(buf: VecMeanAgg.Buffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.dim)
    var i = 0
    while (i < buf.dim) {
      out.writeDouble(buf.sums(i)); out.writeLong(buf.counts(i)); i += 1
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecMeanAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecMeanAgg.Buffer
    val n = in.readInt()
    buf.grow(n)
    var i = 0
    while (i < n) { buf.sums(i) = in.readDouble(); buf.counts(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMeanAgg =
    copy(child = newChild)
}

object VecMeanAgg {
  val name = "graft_vec_mean"

  /** O(dim) sums + per-position counts; grows to the longest vector seen
    * so ragged inputs merge like the composable per-position avg. */
  final class Buffer {
    var sums: Array[Double] = Array.emptyDoubleArray
    var counts: Array[Long] = Array.emptyLongArray
    def dim: Int = sums.length
    def grow(n: Int): Unit = if (n > dim) {
      sums = java.util.Arrays.copyOf(sums, n)
      counts = java.util.Arrays.copyOf(counts, n)
    }
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[VecMeanAgg].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 1) throw new IllegalArgumentException(
        s"$name expects exactly 1 argument (emb), got ${children.length}")
      VecMeanAgg(children.head)
    })

  /** Column form; the cast covers what ImplicitCastInputTypes would have
    * done (float embeddings widen to double). */
  def vecMean(emb: Column): Column =
    org.apache.spark.sql.functions.call_function(name, emb.cast("array<double>"))
}
