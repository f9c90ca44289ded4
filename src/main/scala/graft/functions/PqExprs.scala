package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd product-quantization encode: all m subspace argmins
  * in ONE static call per row. The composable literal-fold form
  * (Similarity.pqEncodeFold — aggregate over a typedlit codebook with
  * VecDot distances) evaluates the whole when/struct expression tree
  * interpreted per codebook entry, which dominated q73/q74 wall time
  * (~77 us/row at sf0.1); this kernel runs the same arithmetic as
  * primitive loops. Bit-parity contract with the fold (differential-
  * pinned by DedupSimilaritySpec, hash-pinned by the q73/q74 oracles):
  * strict left-to-right double folds for ||sub||^2 and sub·entry,
  * distance = ss - 2*dot + ||entry||^2 with the SAME operation order,
  * strict `d < best` so ties keep the smaller code, and any subspace
  * left at the -1 sentinel (null/short/NaN-poisoned embedding) nulls
  * the whole code array — the library's log-and-null convention. */
object PqKernel {

  /** Codebook prebuilt for the kernel: per subspace, its slice offset,
    * slice length, and code-ordered entry vectors with precomputed
    * self-dots (entry i IS code i — dense 0..k-1). */
  final class Codebook(val offsets: Array[Int], val lens: Array[Int],
                       val vecs: Array[Array[Array[Double]]],
                       val norms: Array[Array[Double]]) extends Serializable

  /** Builds [[Codebook]] from the foldable literal child: an array of
    * struct(subspace, code, vector, norm) rows, any order, codes dense
    * 0..k-1 per subspace (the Similarity.collectCodebooks contract —
    * re-validated here because a bad literal would otherwise silently
    * mis-encode). */
  def buildCodebook(raw: Any): Codebook = {
    require(raw != null, "PQ codebook literal must not be null")
    val arr = raw.asInstanceOf[ArrayData]
    val rows = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      val v = r.getArray(2)
      val ds = new Array[Double](v.numElements())
      var j = 0
      while (j < ds.length) { ds(j) = v.getDouble(j); j += 1 }
      (r.getInt(0), r.getInt(1), ds, r.getDouble(3))
    }
    require(rows.nonEmpty, "PQ codebook literal must be non-empty")
    val m = rows.map(_._1).max + 1
    val bySub = (0 until m).map { s =>
      val entries = rows.filter(_._1 == s).sortBy(_._2)
      require(entries.map(_._2) == (0 until entries.length),
        s"PQ subspace $s: codes must be dense 0..k-1")
      entries
    }
    val lens = bySub.map(_.head._3.length).toArray
    val offsets = lens.scanLeft(0)(_ + _).dropRight(1)
    new Codebook(offsets, lens,
      bySub.map(_.map(_._3).toArray).toArray,
      bySub.map(_.map(_._4).toArray).toArray)
  }

  /** The per-row encode. Returns null (not a partial array) if any
    * subspace cannot be coded. `fromFloat` widens elements exactly like
    * the cast the fold form applies. */
  def pqCodes(emb: ArrayData, cb: Codebook, fromFloat: Boolean): ArrayData = {
    val n = emb.numElements()
    val m = cb.offsets.length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = cb.offsets(s)
      val len = math.min(cb.lens(s), math.max(0, n - off))
      // ||sub||^2: strict left-to-right, same fold as VecDot(sub, sub)
      var ss = 0.0
      var i = 0
      while (i < len) {
        val v = if (fromFloat) emb.getFloat(off + i).toDouble
                else emb.getDouble(off + i)
        ss += v * v
        i += 1
      }
      var best = -1
      var bestD = Double.MaxValue
      val vecs = cb.vecs(s)
      val norms = cb.norms(s)
      var c = 0
      while (c < vecs.length) {
        val ev = vecs(c)
        val dn = math.min(len, ev.length)
        var dot = 0.0
        i = 0
        while (i < dn) {
          val v = if (fromFloat) emb.getFloat(off + i).toDouble
                  else emb.getDouble(off + i)
          dot += v * ev(i)
          i += 1
        }
        val d = ss - 2.0 * dot + norms(c)
        // strict <, NaN never wins: identical to the fold's `when(d < acc.d)`
        if (d < bestD) { best = c; bestD = d }
        c += 1
      }
      if (best < 0) return null
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** (array<float|double> embedding, CONSTANT array<struct<subspace, code,
  * vector, norm>>) -> array<int> pq codes (null when uncodable). The
  * codebook is built once per plan and shipped as a codegen reference
  * object. */
case class PqCodesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = PqCodesExpr.name

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(et, _), ArrayType(StructType(fs), _))
          if (et == FloatType || et == DoubleType) && right.foldable &&
            fs.length == 4 && fs(0).dataType == IntegerType &&
            fs(1).dataType == IntegerType &&
            fs(2).dataType == ArrayType(DoubleType, containsNull = false) &&
            fs(3).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, foldable array<struct<" +
          s"int, int, array<double>, double>>), got (${a.simpleString}, " +
          s"${b.simpleString}${if (right.foldable) "" else ", non-foldable"})")
    }

  private def fromFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val cb: PqKernel.Codebook =
    PqKernel.buildCodebook(right.eval(null))

  protected override def nullSafeEval(e: Any, unused: Any): Any =
    PqKernel.pqCodes(e.asInstanceOf[ArrayData], cb, fromFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("graftPqCodebook", cb,
      classOf[PqKernel.Codebook].getName)
    nullSafeCodeGen(ctx, ev, (e, _) => {
      s"""
         |${ev.value} = graft.functions.PqKernel.pqCodes($e, $cbRef, $fromFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqCodesExpr {
  val name = "graft_pq_codes"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[PqCodesExpr].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments (embedding, codebook), got ${children.length}")
      PqCodesExpr(children(0), children(1))
    })
}
