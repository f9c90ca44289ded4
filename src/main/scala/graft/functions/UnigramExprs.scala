package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for unigram-LM (SentencePiece-style) Viterbi
  * segmentation — see [[graft.operators.UnigramLm]] for the training
  * loop that owns the semantics and the cross-engine determinism
  * contract.
  *
  * `segment(word, model)` returns the maximum-score segmentation of
  * `word` under per-piece log-probabilities, where the score of a
  * segmentation is the left-fold sum of its piece scores. Determinism
  * across engines (the DuckDB oracle enumerates ALL segmentations and
  * picks the same winner):
  *  - piece scores are dyadic rationals (integer multiples of 2^-20),
  *    so path sums are EXACT in IEEE doubles — no summation-order or
  *    rounding ambiguity, ties are exact ties;
  *  - exact ties break to the lexicographically smallest space-joined
  *    path string (ASCII memcmp order, identical in Java and DuckDB
  *    for the [a-z] piece alphabet the trainer produces).
  */
object UnigramOps {

  /** word -> logp lookup built once per plan from two foldable literal
    * arrays (the BpeIdsExpr reference-object discipline). Also records
    * the longest piece so the DP inner loop is bounded by the model,
    * not the word. */
  final class Model(val logp: java.util.HashMap[String, java.lang.Double],
                    val maxPieceLen: Int) extends Serializable

  def buildModel(piecesRaw: Any, lpsRaw: Any): Model = {
    val pieces = piecesRaw.asInstanceOf[ArrayData]
    val lps = lpsRaw.asInstanceOf[ArrayData]
    require(pieces.numElements() == lps.numElements(),
      s"graft_unigram_seg: ${pieces.numElements()} pieces vs " +
        s"${lps.numElements()} log-probs")
    val m = new java.util.HashMap[String, java.lang.Double](pieces.numElements() * 2)
    var maxLen = 1
    var i = 0
    while (i < pieces.numElements()) {
      val p = pieces.getUTF8String(i).toString
      m.put(p, lps.getDouble(i))
      if (p.length > maxLen) maxLen = p.length
      i += 1
    }
    new Model(m, maxLen)
  }

  /** Best segmentation of `word` as array<string>, or null when no
    * character path exists (some character of the word has no piece). */
  def segment(wordRaw: UTF8String, model: Model): ArrayData = {
    val word = wordRaw.toString
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // dp over prefix lengths: best exact score + its tie-broken path
    val score = new Array[Double](n + 1)
    val path = new Array[String](n + 1)
    java.util.Arrays.fill(score, Double.NegativeInfinity)
    score(0) = 0.0
    path(0) = ""
    var pos = 1
    while (pos <= n) {
      val maxL = math.min(model.maxPieceLen, pos)
      var len = 1
      while (len <= maxL) {
        val start = pos - len
        if (path(start) != null) {
          val lp = model.logp.get(word.substring(start, pos))
          if (lp != null) {
            val cand = score(start) + lp.doubleValue() // exact: dyadic terms
            if (cand > score(pos)) {
              score(pos) = cand
              path(pos) = joinPath(path(start), word, start, pos)
            } else if (cand == score(pos) && path(pos) != null) {
              val candPath = joinPath(path(start), word, start, pos)
              if (candPath.compareTo(path(pos)) < 0) path(pos) = candPath
            }
          }
        }
        len += 1
      }
      pos += 1
    }
    if (path(n) == null) null
    else {
      val ps = path(n).split(' ')
      new GenericArrayData(ps.map(p => UTF8String.fromString(p): Any))
    }
  }

  private def joinPath(prefix: String, word: String, start: Int, end: Int): String =
    if (prefix.isEmpty) word.substring(start, end)
    else prefix + " " + word.substring(start, end)
}

/** `graft_unigram_seg(word, pieces, logps)` — array<string> Viterbi
  * segmentation of one word under a foldable unigram model. */
case class UnigramSegExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = UnigramSegExpr.name

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(DoubleType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable array<string>, foldable " +
          s"array<double>), got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  @transient private lazy val model: UnigramOps.Model =
    UnigramOps.buildModel(second.eval(null), third.eval(null))

  protected override def nullSafeEval(w: Any, unused1: Any, unused2: Any): Any =
    UnigramOps.segment(w.asInstanceOf[UTF8String], model)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("graftUnigramModel", model,
      classOf[UnigramOps.Model].getName)
    nullSafeCodeGen(ctx, ev, (w, _, _) => {
      s"""${ev.value} = graft.functions.UnigramOps.segment($w, $modelRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object UnigramSegExpr {
  val name = "graft_unigram_seg"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[UnigramSegExpr].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 3) throw new IllegalArgumentException(
        s"$name expects exactly 3 arguments (word, pieces, logps), got ${children.length}")
      UnigramSegExpr(children(0), children(1), children(2))
    })
}
