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
import org.apache.spark.sql.functions.{call_function, conv, element_at, lit, md5, pmod, substring, typedlit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter as a native aggregate — the SET-membership complement of
  * [[CmSketch]] (Count-Min answers "how often"; a bloom answers "have I
  * ever seen this", with no false NEGATIVES). Built once over a corpus
  * fingerprint store, it becomes the narrow pre-screen of incremental
  * dedup ([[graft.operators.Dedup.againstCorpus]]): a new document whose
  * probe misses any bit is DEFINITELY novel and skips the anti-join
  * entirely; only bloom-positive rows — true duplicates plus the small
  * false-positive tail — pay the join. Exactness is never at stake:
  * the anti-join rescues false positives, the no-false-negative
  * property covers the skipped majority.
  *
  * Hashing follows the [[CmSketch]]/[[HashOps.minhashBands]] digest-slice
  * construction: the `numHashes <= 4` hash functions are the disjoint
  * unsigned 32-bit big-endian slices of ONE md5 per item, each taken mod
  * `numBits` into a single shared bit array — so an update costs one
  * digest, and membership is expressible in plain SQL via
  * `TRY_CAST('0x' || substring(md5(x), 8r+1, 8) AS BIGINT) % numBits`,
  * which is how the oracle replays it (q104). State is `numBits / 8`
  * bytes regardless of item count; merge is word-wise OR, so the
  * aggregate is re-aggregable and partition-order independent.
  *
  * `graft_bloom(item string, numBits int, numHashes int)` returns the
  * packed bit array as `array<bigint>` (ceil(numBits/64) little-endian
  * words: bit p lives at word p/64, bit p%64). Null items are ignored.
  *
  * Sizing (k = numHashes, n = expected distinct items, m = numBits):
  * false-positive rate ≈ (1 − e^(−kn/m))^k; m = 10n bits with k = 4
  * gives ~1.2%. The filter is DRIVER-bounded state by design — size m
  * to the driver budget and let the anti-join absorb whatever FP rate
  * that buys; past the budget, disable the pre-screen rather than
  * shrink below usefulness (see `againstCorpus`'s `bloomBits <= 0`). */
case class BloomSketch(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with TernaryLike[Expression] {

  private lazy val numBits: Long = second.eval().asInstanceOf[Number].longValue()
  private lazy val numHashes: Int = third.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string item, got ${first.dataType.simpleString}")
    else if (!second.foldable || second.dataType != IntegerType ||
      second.eval() == null || second.eval().asInstanceOf[Number].intValue() < 64)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName numBits must be an int literal >= 64")
    else if (!third.foldable || third.dataType != IntegerType ||
      third.eval() == null || third.eval().asInstanceOf[Number].intValue() < 1 ||
      third.eval().asInstanceOf[Number].intValue() > 4)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName numHashes must be an int literal in [1, 4] (md5 yields 4 disjoint slices)")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = BloomSketch.name

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](((numBits + 63) / 64).toInt)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = first.eval(input)
    if (v != null) {
      val d = CmSketch.md5.get().digest(v.asInstanceOf[UTF8String].getBytes)
      var r = 0
      while (r < numHashes) {
        // unsigned 32-bit slice r of the digest, mod numBits — the same
        // value SQL's TRY_CAST('0x' || substring(md5(x), 8r+1, 8)) sees
        val h = ((d(4 * r) & 0xffL) << 24) | ((d(4 * r + 1) & 0xffL) << 16) |
          ((d(4 * r + 2) & 0xffL) << 8) | (d(4 * r + 3) & 0xffL)
        val p = h % numBits
        buf((p >> 6).toInt) |= 1L << (p & 63)
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomSketch =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BloomSketch {
  val name = "graft_bloom"

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[BloomSketch].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"$name expects exactly 3 arguments (item, numBits, numHashes), got ${children.length}")
      BloomSketch(children(0), children(1), children(2))
    })

  /** Column form: the packed bit array. */
  def bloom(item: Column, numBits: Int, numHashes: Int): Column =
    call_function(name, item, lit(numBits), lit(numHashes))

  /** Membership probe against a COLLECTED filter, as a pure narrow
    * column over codegen'd built-ins (md5 + conv + shifts — no UDF, no
    * join): true iff every hash slice's bit is set. The word array rides
    * the plan as one literal; item hashing replays exactly the update
    * path, so there are no false negatives by construction.
    *
    * Sizing note: the literal is embedded per probe term, so the filter
    * taxes every task's serialized plan — size `numBits` to the corpus
    * (~10 bits per expected distinct item ≈ 1% FP at 4 hashes), don't
    * reflexively max it out (a 2^22-bit filter is a 512 KB plan literal;
    * measured ~2x query overhead vs a right-sized one at sf0.1). */
  def mightContain(item: Column, words: Seq[Long], numBits: Int,
                   numHashes: Int): Column = {
    require(numHashes >= 1 && numHashes <= 4,
      s"numHashes must be in [1, 4]: $numHashes")
    require(words.length == (numBits + 63) / 64,
      s"word count ${words.length} does not match numBits $numBits")
    val wlit = typedlit(words)
    (0 until numHashes).map { r =>
      val h = pmod(
        conv(substring(md5(item), 8 * r + 1, 8), 16, 10).cast("long"),
        lit(numBits.toLong))
      val word = element_at(wlit, (h / 64).cast("int") + 1)
      // dynamic shift distance needs the SQL builtin (the Column-API
      // shiftright only takes a literal distance)
      call_function("shiftright", word, (h % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _) && item.isNotNull // null item: definitely-not-present
  }
}
