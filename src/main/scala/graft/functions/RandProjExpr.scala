package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Deterministic sign random projection (Achlioptas 2003): reduce an
  * embedding to `outDim` dimensions via out[j] = Σ_i emb[i] · s(i,j) ·
  * scale, with s(i,j) = ±1 drawn from the md5 of "i:j" (top bit of the
  * leading digest byte) — reproducible across engines, reruns, and
  * cluster sizes, unlike a seeded RNG matrix. The Johnson–Lindenstrauss
  * workhorse for cheapening downstream ANN: project 64 → 16 dims, run
  * IVF/LSH in the reduced space, re-rank survivors at full width.
  *
  * `scale` is fixed at 1/sqrt(outDim) and `outDim` is REQUIRED to be a
  * power of four so the scale is an exact power of two: every product
  * emb[i]·(±2^-k) is then exactly representable, and the strict i-order
  * fold produces bit-identical doubles in any engine that sums in the
  * same order — the DuckDB oracle replays the identical arithmetic.
  *
  * The sign matrix is built once per plan (outDim × dim bytes, bounded
  * driver state) and ships to generated code as a reference object; the
  * per-row cost is a dim × outDim primitive multiply-add loop. */
object RandProjOps {

  /** s(i, j) for 0-based in-dim i, out-dim j: +1 iff the top bit of
    * md5("i:j")'s first byte is set. */
  private[functions] def sign(i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes("UTF-8"))
    if ((d(0) & 0x80) != 0) 1 else -1
  }

  /** signs(j)(i) over [outDim][dim]. */
  private[functions] def signMatrix(dim: Int, outDim: Int): Array[Array[Byte]] =
    Array.tabulate(outDim, dim)((j, i) => sign(i, j).toByte)

  def project(emb: ArrayData, signs: Array[Array[Byte]], scale: Double,
              fromFloat: Boolean): ArrayData = {
    val n = emb.numElements()
    val out = new Array[Any](signs.length)
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      val m = math.min(n, row.length)
      var s = 0.0
      var i = 0
      while (i < m) {
        val v = if (fromFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
        s += (if (row(i) > 0) v else -v) * scale
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** (array<float|double> embedding) -> array<double> of `outDim`
  * sign-projected components. `outDim` must be a literal power of four
  * (exact power-of-two scale — see [[RandProjOps]]). */
case class RandProj(child: Expression, dim: Int, outDim: Int)
    extends UnaryExpression {
  require(outDim >= 1 && (outDim & (outDim - 1)) == 0 &&
    (java.lang.Integer.numberOfTrailingZeros(outDim) % 2 == 0),
    s"outDim must be a power of four for an exact power-of-two scale: $outDim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = RandProj.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.simpleString}")
  }

  private def fromFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def scale: Double = 1.0 / math.sqrt(outDim.toDouble)

  @transient private lazy val signs: Array[Array[Byte]] =
    RandProjOps.signMatrix(dim, outDim)

  protected override def nullSafeEval(input: Any): Any =
    RandProjOps.project(input.asInstanceOf[ArrayData], signs, scale, fromFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NB: classOf[Array[Array[Byte]]].getName is the JVM-internal "[[B",
    // which is not valid Java source — spell the array type out
    val signsRef = ctx.addReferenceObj("graftRpSigns", signs, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RandProjOps.project($c, $signsRef, $scale, $fromFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RandProj {
  val name = "graft_rand_proj"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[RandProj].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"$name expects exactly 3 arguments (embedding, dim, outDim), got ${children.length}")
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$name: $what must be an integer literal, got $other")
      }
      RandProj(children(0), intLit(children(1), "dim"), intLit(children(2), "outDim"))
    })

  /** Column form: `outDim` sign-projected doubles. */
  def randProj(emb: Column, dim: Int, outDim: Int): Column =
    call_function(name, emb, lit(dim), lit(outDim))
}
