package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Evaluate-once pin for an EXPENSIVE projected expression.
  *
  * Catalyst's predicate pushdown substitutes a filter's attribute
  * references with the defining projection's expressions and pushes the
  * rewritten predicate below the Project — duplicating the expression:
  * `select(parse(x).as("k")).where($"k".isNotNull)` plans as
  * `Filter isnotnull(parse(x)) → Project parse(x)`, so every surviving
  * row pays the parse TWICE (the optimization-guide §4.4 duplication,
  * which that guide fixes for Python UDFs with `asNondeterministic()`).
  * Built-in expressions have no such handle, so this wrapper provides
  * one: a pure passthrough (same value, same nullability, same codegen —
  * the child's generated code is emitted inline, whole-stage codegen
  * preserved) that only REPORTS itself non-deterministic. Predicates
  * referencing the pinned column then stay ABOVE the projection (pushing
  * them would make the predicate non-deterministic, which
  * PushPredicateThroughNonJoin refuses) and the expression is evaluated
  * exactly once per row.
  *
  * Use it only on genuinely expensive projections that a downstream
  * filter references (JSON parses, per-row fingerprints): the pin also
  * blocks LEGITIMATE pushdown of those predicates past the projection,
  * which is the whole point here but would be a pessimization on a cheap
  * column (guide §4.4 makes the same "apply to the expensive ones, not
  * blanket" caveat).
  */
case class PinnedEval(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  /** The pin: value semantics are the child's (pure passthrough), but the
    * optimizer must treat the result as unreproducible so it never clones
    * the child into pushed-down predicates. */
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): PinnedEval =
    copy(child = newChild)

  override def prettyName: String = "pinned"
}

object PinnedEval {
  /** Column-level door: `pinned(expensiveColumn)`. */
  def pinned(c: Column): Column = Bridge.column(PinnedEval(Bridge.expression(c)))
}
