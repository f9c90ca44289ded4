package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd forms of the text-hash operators. The composable
  * md5-hex versions in [[Text]] stay as the spec (and the DuckDB oracle
  * mirrors them); these compile to a single static call per row
  * (HashOps), removing the per-token interpreted-expression overhead that
  * dominates SimHash/MinHash at scale. Differential tests pin native ==
  * composable over the fixtures.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = SimHash32.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    HashOps.simhash32(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {
  val name = "graft_simhash32"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[SimHash32].getName, name),
    (children: Seq[Expression]) => SimHash32(children.head))
}

/** array<string> tokens -> 64-bit SimHash fingerprint (HashOps.simhash64):
  * the production width for [[graft.operators.Dedup.simhashNearDup]]. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = SimHash64.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    HashOps.simhash64(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  val name = "graft_simhash64"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[SimHash64].getName, name),
    (children: Seq[Expression]) => SimHash64(children.head))
}

/** array<string> tokens -> array of `bands` MinHash band signatures using
  * `shingle`-token word shingles (null band elements for short docs). */
case class MinHashBands(child: Expression, shingle: Int, bands: Int) extends UnaryExpression {
  require(shingle >= 1 && bands >= 1 && bands <= 4,
    "md5 yields 4 disjoint 32-bit band slices")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = MinHashBands.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    HashOps.minhashBands(input.asInstanceOf[ArrayData], shingle, bands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.minhashBands($c, $shingle, $bands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<string> tokens -> array of `bands` weighted-MinHash band
  * signatures (`rows` consistent-weighted-sampling draws per band,
  * joined "|"); null for token-less input. One kernel call computes
  * every draw with a single-pass tf map — the HOF fold form
  * ([[graft.operators.Dedup.weightedMinhashSigsFold]], kept as the
  * differential witness) re-derives tf per distinct token and pays one
  * interpreted expression tree per (band, draw, token). */
case class WeightedMinhashExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {
  require(bands >= 1 && rows >= 1, "need bands >= 1 and rows >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = WeightedMinhashExpr.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    HashOps.weightedMinhash(input.asInstanceOf[ArrayData], bands, rows)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HashOps.weightedMinhash($c, $bands, $rows);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WeightedMinhashExpr {
  val name = "graft_weighted_minhash"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[WeightedMinhashExpr].getName, name),
    (children: Seq[Expression]) => {
      def lit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$name: $what must be an integer literal, got $other")
      }
      WeightedMinhashExpr(children.head,
        lit(children(1), "band count"), lit(children(2), "rows per band"))
    })
}

object MinHashBands {
  val name = "graft_minhash_bands"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[MinHashBands].getName, name),
    (children: Seq[Expression]) => {
      def lit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$name: $what must be an integer literal, got $other")
      }
      MinHashBands(children.head, lit(children(1), "shingle size"), lit(children(2), "band count"))
    })
}

/** text -> struct(bs array<int>, xs array<double>): the FUSED hashed
  * char-n-gram bag of words ([[HashOps.charBow]]) — the whole
  * featureArrays(charNgrams) pipeline (gram transform → explode → md5
  * bucket → two shuffled groupBys → sorted pack) as ONE codegen'd call
  * per row, zero shuffles. Bit-identical values to the composable path
  * (ClassifierSpec differential); null text -> null (callers coalesce
  * to empty feature arrays, the featureArrays contract). */
case class CharBowExpr(child: Expression, n: Int, dim: Int)
    extends UnaryExpression {
  require(n >= 1, "charBow: n must be positive")
  require(dim >= 1, "charBow: dim must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("bs", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("xs", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = CharBowExpr.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    HashOps.charBow(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.charBow($c, $n, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharBowExpr {
  val name = "graft_char_bow"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[CharBowExpr].getName, name),
    (children: Seq[Expression]) => {
      def lit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$name: $what must be an integer literal, got $other")
      }
      if (children.length != 3) throw new IllegalArgumentException(
        s"$name expects exactly 3 arguments (text, n, dim), got ${children.length}")
      CharBowExpr(children.head, lit(children(1), "gram size"), lit(children(2), "dim"))
    })
}
