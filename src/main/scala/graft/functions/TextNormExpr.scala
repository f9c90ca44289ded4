package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernel (NFC/NFD/NFKC/NFKD via the JDK's
  * `java.text.Normalizer`) — the corpus-cleaning stage Spark has no
  * built-in for. Mixed-source training text arrives with the same
  * glyph in composed and decomposed encodings (and, for NFKC, in
  * compatibility variants: ligatures, fullwidth forms, circled
  * digits); every downstream fingerprint/dedup/shingle operator keys
  * on raw bytes, so normalization has to happen before any of them
  * can see through the encoding difference.
  *
  * Scale posture: stateless row-at-a-time, valid in batch and
  * streaming plans, zero shuffles. The hot path for real corpora is
  * the ASCII fast path — a byte scan that returns the input
  * UTF8String untouched (no String materialization, no allocation);
  * non-ASCII rows take `Normalizer.isNormalized` (already-normalized
  * text is returned as-is) before paying for a rewrite.
  */
object TextNormOps {

  /** True iff every byte is 7-bit — ASCII is normalized under all four
    * forms, so such strings pass through without materializing a
    * java.lang.String. */
  private[functions] def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def normalize(s: UTF8String, f: Normalizer.Form): UTF8String = {
    if (isAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}

/** string -> its Unicode-normalized form under the literal `form`
  * (NFC, NFD, NFKC, or NFKD), one codegen'd call per row. */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {

  @transient private lazy val f: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = UnicodeNormalize.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if UnicodeNormalize.Forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: form must be one of ${UnicodeNormalize.Forms.mkString(", ")}, got '$form'")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextNormOps.normalize(input.asInstanceOf[UTF8String], f)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("graftNormForm", f, "java.text.Normalizer.Form")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormOps.normalize($c, $formRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val name = "graft_unicode_norm"
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[UnicodeNormalize].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 2) throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments (text, form), got ${children.length}")
      children(1) match {
        case Literal(v: UTF8String, StringType) => UnicodeNormalize(children.head, v.toString)
        case other => throw new IllegalArgumentException(
          s"$name: form must be a string literal, got $other")
      }
    })
}
