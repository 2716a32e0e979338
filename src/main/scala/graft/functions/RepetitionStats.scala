package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row repetition statistics (SURVEY §2.11 preference order (b)).
  *
  * The declarative form in [[graft.ops.TextOps.qualityRepetitionOf]] ran
  * TWO explode → count-per-(doc, gram) → per-doc-aggregate pipelines (one
  * for tokens, one for word bigrams) joined on doc_id — four shuffles of
  * the exploded token stream for statistics that depend only on ONE row's
  * own tokens. This expression computes the identical five integer
  * aggregates in one compiled pass per document: the whole operator
  * becomes map-side (zero exchanges before the final sort), which at
  * 100 TB removes two full shuffles of the corpus token stream (guide
  * §1.2 step 1 — fix the distributed algorithm first).
  *
  * Parity contract (pinned in TextOpsSpec/LlmOpsSpec and by the
  * `q_quality_repetition` oracle): token counts group split-tokens
  * exactly like `groupBy(doc_id, g)` (null elements — impossible under
  * `split` but handled — form their own group, matching groupBy's
  * null-key semantics); bigram i (1-based, i ≤ max(n−1, 1)) is
  * `concat_ws(' ', toks[i], toks[i+1])` with concat_ws null-skipping
  * (`UTF8String.concatWs` IS Spark's concat_ws kernel), NON-distinct —
  * counts matter. Only the raw integer stats are computed here; the
  * fraction division + 4dp rounding stay in the Catalyst projection
  * above, so float behavior is bit-identical to the retired form.
  */
object RepetitionStats {

  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. `bigrams = false`
    * skips the bigram half (zeros in its slots) for consumers that only
    * need unigram stats ([[graft.ops.TextOps.qualityFilter]]). */
  def compute(arr: ArrayData, bigrams: Boolean): InternalRow = {
    val n = arr.numElements()
    // ---- unigram counts ----
    val uni = new java.util.HashMap[UTF8String, Array[Int]]()
    var nullCount = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nullCount += 1
      else {
        val t = arr.getUTF8String(i)
        val c = uni.get(t)
        if (c == null) uni.put(t, Array(1)) else c(0) += 1
      }
      i += 1
    }
    var uTop = 0L
    var uDup = 0L
    val it = uni.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > uTop) uTop = c
      if (c > 1) uDup += c
    }
    if (nullCount > uTop) uTop = nullCount
    if (nullCount > 1) uDup += nullCount
    val uUniq = uni.size().toLong + (if (nullCount > 0) 1L else 0L)
    if (!bigrams)
      return InternalRow(uTop, uDup, n.toLong, uUniq, 0L, 0L)
    // ---- bigram counts (1-based window i, i ≤ max(n−1, 1)) ----
    val bi = new java.util.HashMap[UTF8String, Array[Int]]()
    val top = math.max(n - 1, 1)
    var bTop = 0L
    i = 1
    while (i <= top) {
      val a = if (i - 1 < n && !arr.isNullAt(i - 1)) arr.getUTF8String(i - 1) else null
      val b = if (i < n && !arr.isNullAt(i)) arr.getUTF8String(i) else null
      // concat_ws(' ', a, b): null operands skipped, never joined
      val g = UTF8String.concatWs(Space, a, b)
      val c = bi.get(g)
      if (c == null) { bi.put(g, Array(1)); if (bTop < 1) bTop = 1 }
      else { c(0) += 1; if (c(0) > bTop) bTop = c(0) }
      i += 1
    }
    InternalRow(uTop, uDup, n.toLong, uUniq, bTop, top.toLong)
  }
}

case class RepetitionStatsExpr(child: Expression, bigrams: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("u_top_c", LongType, nullable = false),
    StructField("u_dup_c", LongType, nullable = false),
    StructField("u_n", LongType, nullable = false),
    StructField("u_uniq", LongType, nullable = false),
    StructField("b_top_c", LongType, nullable = false),
    StructField("b_n", LongType, nullable = false)))

  override def nullSafeEval(a: Any): Any =
    RepetitionStats.compute(a.asInstanceOf[ArrayData], bigrams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionStats.compute($c, $bigrams)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStatsExpressions {
  /** Column API for [[RepetitionStatsExpr]]. */
  def repetition_stats(toks: Column, bigrams: Boolean = true): Column =
    Bridge.column(RepetitionStatsExpr(Bridge.expression(toks), bigrams))
}
