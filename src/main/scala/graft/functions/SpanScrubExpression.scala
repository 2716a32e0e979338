package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row span rewrite (SURVEY §2.11 preference order (b)) — the
  * second half of ExactSubstr duplicate-span scrubbing.
  *
  * The declarative form in [[graft.ops.DedupOps.applySpanScrub]] ran three
  * chained higher-order array expressions per document —
  * `flatten(transform(ss, s → sequence(s, s+g−1)))` to expand covered
  * positions, `array_except(sequence(1, n), covered)` for the survivors,
  * and `transform(keep_pos, p → element_at(toks, p))` to project tokens —
  * all interpreted lambda evaluation (HigherOrderFunction has no codegen),
  * allocating three intermediate arrays per document. This expression
  * computes the identical result in ONE compiled pass with a boolean
  * cover mask: O(tokens + covered) like the form it replaces, zero
  * intermediate allocation beyond the output string.
  *
  * Parity contract (pinned in LlmOpsSpec against the retired composed
  * form, and by the `q_dedup_span_scrub` oracle):
  *  - covered = ∪ [s, s+gram) over `starts` (1-based, clamped to the doc);
  *  - `n_kept` counts UNCOVERED POSITIONS — including positions holding a
  *    null token, exactly like `size(clean)` counted null elements;
  *  - `clean_text` joins the uncovered, NON-NULL tokens with single
  *    spaces, exactly like `array_join(clean, " ")` skipped nulls;
  *  - a null `starts` (the left-join miss for a doc with no duplicated
  *    spans) keeps everything — the `coalesce(ss, [])` the composed form
  *    applied.
  */
object SpanScrub {

  /** Shared by interpreted eval and generated code. `starts` may be null
    * (no duplicated windows — keep everything). */
  def compute(toks: ArrayData, starts: ArrayData, gram: Int): InternalRow = {
    val n = toks.numElements()
    val covered = new Array[Boolean](n + 1) // 1-based positions
    if (starts != null) {
      val m = starts.numElements()
      var i = 0
      while (i < m) {
        if (!starts.isNullAt(i)) {
          val s = starts.getInt(i)
          var p = math.max(s, 1)
          val end = math.min(s.toLong + gram - 1, n.toLong).toInt
          while (p <= end) { covered(p) = true; p += 1 }
        }
        i += 1
      }
    }
    var kept = 0L
    val sb = new java.lang.StringBuilder
    var first = true
    var p = 1
    while (p <= n) {
      if (!covered(p)) {
        kept += 1
        if (!toks.isNullAt(p - 1)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(p - 1).toString)
          first = false
        }
      }
      p += 1
    }
    InternalRow(kept, UTF8String.fromString(sb.toString))
  }
}

/** `span_scrub(toks, starts)` → struct(n_kept, clean_text); `starts`
  * nullable (null = keep everything), `toks` null → null row. */
case class SpanScrubExpr(left: Expression, right: Expression, gram: Int)
    extends BinaryExpression {

  require(gram >= 1, s"gram must be >= 1, got $gram")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = StructType(
    Seq(StructField("n_kept", LongType, nullable = false),
      StructField("clean_text", StringType, nullable = false)))

  // null iff toks is null — a null starts side still produces a row
  // (keep-everything), so the default both-sides null propagation of
  // BinaryExpression does not apply
  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val toks = left.eval(input)
    if (toks == null) null
    else {
      val starts = right.eval(input)
      SpanScrub.compute(
        toks.asInstanceOf[ArrayData],
        if (starts == null) null else starts.asInstanceOf[ArrayData],
        gram)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val t = left.genCode(ctx)
    val s = right.genCode(ctx)
    val call = s"graft.functions.SpanScrub.compute(" +
      s"${t.value}, ${s.isNull} ? null : ${s.value}, $gram)"
    if (nullable) {
      ev.copy(code =
        code"""
          |${t.code}
          |${s.code}
          |boolean ${ev.isNull} = ${t.isNull};
          |InternalRow ${ev.value} = null;
          |if (!${ev.isNull}) { ${ev.value} = $call; }
        """.stripMargin)
    } else {
      ev.copy(code =
        code"""
          |${t.code}
          |${s.code}
          |InternalRow ${ev.value} = $call;
        """.stripMargin, isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "span_scrub"
}

object SpanScrubExpressions {
  /** Column API for [[SpanScrubExpr]]. */
  def span_scrub(toks: Column, starts: Column, gram: Int): Column =
    Bridge.column(SpanScrubExpr(
      Bridge.expression(toks), Bridge.expression(starts), gram))
}
