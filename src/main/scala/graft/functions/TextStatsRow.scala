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

/** Native per-row text statistics (SURVEY §2.11 preference order (b);
  * round-18 optimization, same device as [[RepetitionStats]]).
  *
  * The declarative form in [[graft.ops.TextOps.textStats]] paid THREE
  * interpreted array passes per document — `size(array_distinct(toks))`,
  * `size(filter(toks, isin(...)))`, and the `aggregate(transform(...))`
  * BPE fold (higher-order functions have no codegen and allocate a lambda
  * row per element). This expression computes the identical four integer
  * aggregates in one compiled pass; divisions and 4-dp rounding stay in
  * the Catalyst projection above, so float behavior is bit-identical.
  *
  * Parity contract (pinned in LlmOpsSpec against the retired composed
  * form and by the `q_text_stats` oracle):
  *  - `n`      = total element count INCLUDING nulls (`size(toks)`);
  *  - `uniq`   = distinct element count where all nulls form ONE group
  *    (`size(array_distinct(toks))`);
  *  - `stop_c` = count of non-null elements equal to a stopword
  *    (`size(filter(toks, isin(stopwords)))` — `isin` is null for a null
  *    element, which `filter` drops);
  *  - `bpe`    = Σ ceil(numChars/4.0) as `(numChars + 3) / 4` integer
  *    math (exact for numChars ≥ 0) over the elements, and NULL if any
  *    element is null — `aggregate`'s running `acc + ceil(length(t)/4)`
  *    turns null at the first null element and never recovers.
  */
object TextStatsRow {

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, stops: Array[UTF8String]): InternalRow = {
    val n = arr.numElements()
    val uni = new java.util.HashSet[UTF8String]()
    var nullSeen = false
    var stopC = 0L
    var bpe = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nullSeen = true
      else {
        val t = arr.getUTF8String(i)
        uni.add(t)
        var j = 0
        while (j < stops.length) {
          if (stops(j).equals(t)) { stopC += 1L; j = stops.length }
          else j += 1
        }
        bpe += (t.numChars() + 3) / 4
      }
      i += 1
    }
    val uniq = uni.size().toLong + (if (nullSeen) 1L else 0L)
    InternalRow(n.toLong, uniq, stopC, if (nullSeen) null else bpe)
  }
}

case class TextStatsRowExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("uniq", LongType, nullable = false),
    StructField("stop_c", LongType, nullable = false),
    StructField("bpe", LongType, nullable = true)))

  private lazy val stops: Array[UTF8String] =
    stopwords.map(UTF8String.fromString).toArray

  override def nullSafeEval(a: Any): Any =
    TextStatsRow.compute(a.asInstanceOf[ArrayData], stops)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStatsStops", stops,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsRow.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_stats_row"
}

object TextStatsRowExpressions {
  /** Column API for [[TextStatsRowExpr]]. */
  def text_stats_row(toks: Column, stopwords: Seq[String]): Column =
    Bridge.column(TextStatsRowExpr(Bridge.expression(toks), stopwords))
}
