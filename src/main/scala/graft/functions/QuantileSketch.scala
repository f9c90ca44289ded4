package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Mergeable bounded-state QUANTILE sketch — the rank/quantile member of
  * the sketch family beside [[CmSketch]] (point frequency),
  * [[HeavyHitters]] (frequent items), HLL (distinct count) and
  * [[BloomSketch]] (membership): "what is the p50/p99 of this column"
  * in ONE pass with O(k · log(n/k)) state, where the exact alternative
  * ([[graft.operators.Percentiles]]) is a full distributed sort — the
  * right tool for a dashboard/monitoring pass over 100 TB, re-aggregable
  * across partitions, days, and streaming state.
  *
  * The construction is the deterministic Munro–Paterson / MRL collapse
  * (Manku et al. 1998; mergeability per Agarwal et al. 2012 "Mergeable
  * Summaries"): items live in levels, every item at level i representing
  * 2^i raw rows. A level reaching `2k` items collapses — sort, keep the
  * odd-indexed half at level i+1. Keeping every other element of a
  * sorted run perturbs any rank by at most the source weight, so the
  * sketch carries a RIGOROUS running error budget `err += 2^i` per
  * collapse: for every threshold x, |est_rank(x) − rank(x)| ≤ err holds
  * under ANY partition/merge order (each collapse's perturbation bound
  * is order-independent; the total is a triangle inequality). No
  * randomness anywhere — same input multiset + same arrival order ⇒
  * bit-identical sketch; any order ⇒ the same guarantee. The budget is
  * also capped deterministically: collapses at level i consume 2k·2^i
  * raw rows each, bounding the budget by a small multiple of n/k times
  * the level count — q193's oracle checks the
  * (n/k) · (⌈log₂(max(2, n/k))⌉ + 2) form of that cap, which holds
  * under any partition/merge order without seeing the sketch (the +2
  * absorbs the partial top level and the merge-order slack a tighter
  * +1 constant would have to prove per-order).
  *
  * `graft_quantile_sketch(value double, k int)` (k even, ≥ 2) returns
  * `struct<items: array<struct<v double, w bigint>>, err bigint,
  * n bigint>` with items sorted by (v, w): est_rank(x) = Σ w over
  * v ≤ x — plain SQL over the emitted struct, which is how the oracle
  * replays estimates. Null and NaN values are ignored (NaN has no rank
  * in a total order both engines agree on). */
case class QuantileSketch(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.State]
  with BinaryLike[Expression] {

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double value, got ${left.dataType.simpleString}")
    else if (!right.foldable || right.dataType != IntegerType ||
      right.eval() == null || right.eval().asInstanceOf[Number].intValue() < 2 ||
      right.eval().asInstanceOf[Number].intValue() % 2 != 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be an even int literal >= 2")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = QuantileSketch.outType
  override def prettyName: String = QuantileSketch.name

  override def createAggregationBuffer(): QuantileSketch.State =
    new QuantileSketch.State(k)

  override def update(buf: QuantileSketch.State, input: InternalRow): QuantileSketch.State = {
    val v = left.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buf.add(0, d)
    }
    buf
  }

  override def merge(buf: QuantileSketch.State, other: QuantileSketch.State): QuantileSketch.State = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: QuantileSketch.State): Any = {
    // (v, w) pairs sorted by (v, w) — a deterministic function of the
    // sketch state, and the shape SQL rank replays read directly
    val flat = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < buf.levels.length) {
      val w = 1L << i
      buf.levels(i).foreach(v => flat += ((v, w)))
      i += 1
    }
    val sorted = flat.sortBy(identity)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new GenericArrayData(sorted.map { case (v, w) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](v, w))
      }.toArray[Any]),
      buf.err, buf.n))
  }

  override def serialize(buf: QuantileSketch.State): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.k)
    out.writeLong(buf.n)
    out.writeLong(buf.err)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketch.State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt()
    val st = new QuantileSketch.State(kk)
    st.n = in.readLong()
    st.err = in.readLong()
    val nl = in.readInt()
    var i = 0
    while (i < nl) {
      val sz = in.readInt()
      val lvl = ArrayBuffer.empty[Double]
      var j = 0
      while (j < sz) { lvl += in.readDouble(); j += 1 }
      st.setLevel(i, lvl)
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketch =
    copy(left = newLeft, right = newRight)
}

object QuantileSketch {
  val name = "graft_quantile_sketch"

  val outType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))

  /** Levels of < 2k items each; an item at level i weighs 2^i rows.
    * `err` is the accumulated rigorous rank-error budget. */
  final class State(val k: Int) {
    var n: Long = 0L
    var err: Long = 0L
    var levels: Array[ArrayBuffer[Double]] = Array(ArrayBuffer.empty[Double])

    private[QuantileSketch] def setLevel(i: Int, lvl: ArrayBuffer[Double]): Unit = {
      while (levels.length <= i) levels = levels :+ ArrayBuffer.empty[Double]
      levels(i) = lvl
    }

    /** Insert one item at `level` (counting it into n only at level 0 —
      * higher-level inserts are re-homed existing mass), collapsing any
      * level that reaches 2k. */
    def add(level: Int, v: Double): Unit = {
      if (level == 0) n += 1
      while (levels.length <= level) levels = levels :+ ArrayBuffer.empty[Double]
      levels(level) += v
      var i = level
      while (i < levels.length && levels(i).length >= 2 * k) {
        // deterministic collapse: sort, keep the odd-indexed half one
        // level up; rank perturbation <= 2^i, accounted exactly
        val sorted = levels(i).sorted
        levels(i) = ArrayBuffer.empty[Double]
        err += 1L << i
        while (levels.length <= i + 1) levels = levels :+ ArrayBuffer.empty[Double]
        var j = 1
        while (j < sorted.length) { levels(i + 1) += sorted(j); j += 2 }
        i += 1
      }
    }

    def mergeFrom(other: State): Unit = {
      require(other.k == k, s"quantile sketch k mismatch: $k vs ${other.k}")
      n += other.n
      err += other.err
      var i = 0
      while (i < other.levels.length) {
        other.levels(i).foreach { v =>
          while (levels.length <= i) levels = levels :+ ArrayBuffer.empty[Double]
          levels(i) += v
        }
        // collapse after bulk-adding the level, not per item — same
        // invariant (levels end < 2k), fewer sorts
        var j = i
        while (j < levels.length && levels(j).length >= 2 * k) {
          val sorted = levels(j).sorted
          // a merged level can briefly hold up to 2k-1 + 2k-1 items:
          // collapse 2k at a time, carry the remainder
          val (head, tail) = sorted.splitAt(2 * k)
          levels(j) = ArrayBuffer.from(tail)
          err += 1L << j
          while (levels.length <= j + 1) levels = levels :+ ArrayBuffer.empty[Double]
          var x = 1
          while (x < head.length) { levels(j + 1) += head(x); x += 2 }
          if (levels(j).length < 2 * k) j += 1
        }
        i += 1
      }
    }
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[QuantileSketch].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments (value, k), got ${children.length}")
      QuantileSketch(children(0), children(1))
    })

  /** Column form: the (items, err, n) sketch struct. */
  def sketch(value: Column, k: Int): Column =
    call_function(name, value, lit(k))

  /** Estimated rank of `x` under a sketch struct: Σ w over items with
    * v ≤ x — a plain fold over the emitted array, usable anywhere the
    * struct column is (including SQL replays). */
  def estRank(sketchCol: Column, x: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(sketchCol.getField("items"), lit(0L),
      (acc, it) => acc + when(it.getField("v") <= x, it.getField("w"))
        .otherwise(lit(0L)))
  }

  /** Estimated `q`-quantile (q in (0, 1]): the smallest sketch value
    * whose estimated rank reaches ⌈q·n⌉. Items are already sorted by
    * (v, w), so one ordered fold finds it. */
  def quantile(sketchCol: Column, q: Double): Column = {
    import org.apache.spark.sql.functions._
    require(q > 0.0 && q <= 1.0, s"quantile: q in (0, 1]: $q")
    val target = greatest(lit(1L),
      ceil(sketchCol.getField("n").cast("double") * lit(q)).cast("long"))
    val folded = aggregate(sketchCol.getField("items"),
      struct(lit(0L).as("cum"), lit(null).cast("double").as("ans")),
      (acc, it) => struct(
        (acc.getField("cum") + it.getField("w")).as("cum"),
        when(acc.getField("ans").isNotNull, acc.getField("ans"))
          .when(acc.getField("cum") + it.getField("w") >= target,
            it.getField("v"))
          .otherwise(lit(null).cast("double")).as("ans")))
    folded.getField("ans")
  }
}
