package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.DataType

/** Identity pass-through that DECLARES itself non-deterministic — the
  * evaluate-once barrier for expensive projection columns.
  *
  * Mechanism: `PushPredicateThroughNonJoin` only pushes a filter through
  * a Project whose fields are ALL deterministic; when it pushes, it
  * substitutes the alias, RE-INLINING the column's entire expression
  * tree into the filter condition below the projection — so a cheap
  * gate like `n_lines_kept >= 2` re-runs the full interpreted
  * HOF/regexp chain that computed the column (measured: q179's Filter
  * carried TWO complete copies of the Extract+LineFilter chain below
  * the projections that compute it a third time). Wrapping the
  * expensive column in `graft_once` stops the push (and stops
  * CollapseProject / PhysicalOperation from duplicating the tree into
  * consumers), so the chain is evaluated exactly once per row and the
  * gate filters on the materialized attribute above it.
  *
  * This is the expression-level form of the documented Spark remedy for
  * duplicated expensive Python UDFs (mark them non-deterministic so the
  * optimizer may not reorder, duplicate or constant-fold them); values
  * are identical by construction — eval and codegen delegate to the
  * child unchanged — so task retries are safe (re-execution reproduces
  * the same values; nothing here behaves like rand()).
  *
  * Cost of the barrier: OTHER predicates written downstream of the
  * wrapped projection also stop pushing past it (toward the scan).
  * Apply it inside operators that REWRITE their text column — anything
  * filtering on the rewritten value could never push to the source
  * anyway, and selective source predicates in shipped pipelines are
  * applied before the rewrite stages.
  */
case class Once(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def prettyName: String = Once.name
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Once =
    copy(child = newChild)
}

object Once {
  val name = "graft_once"

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[Once].getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 1) throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${children.length}")
      Once(children.head)
    })

  /** Column form: `value`, evaluated exactly once per row at this plan
    * position (no filter-pushdown re-inline, no duplication). */
  def once(value: Column): Column = call_function(name, value)
}
