package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over `array<float|double>` columns.
  *
  * The composable form (`aggregate(zip_with(...))`, Vectors.dot) evaluates
  * interpreted — higher-order functions have no codegen — and allocates an
  * intermediate product array per row. This expression participates in
  * whole-stage codegen: a tight primitive loop, no boxing, no allocation,
  * which is what the brute-force/IVF similarity scans want when each
  * corpus row is compared against many queries/centroids.
  *
  * Semantics match Vectors.dot exactly: elements widened to double, strict
  * left-to-right accumulation (bit-identical to the DuckDB oracle's
  * list_aggregate sum), length = min of the two arrays. Array elements are
  * assumed non-null (embedding vectors); a null ARRAY input yields null.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (isFloat(left), isFloat(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getL = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $getL * $getR; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  val name = "graft_vec_dot"

  /** For SparkSessionExtensions.injectFunction / FunctionRegistry. */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[VecDot].getName, name),
    (children: Seq[Expression]) => VecDot(children(0), children(1)))

  /** Idempotent per-session registration (delegates to the registry). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.ensureRegistered(spark)
}
