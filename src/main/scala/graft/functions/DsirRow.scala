package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}

/** Native per-row DSIR log-likelihood-ratio fold (SURVEY §2.11 preference
  * order (b)).
  *
  * The declarative scoring pass in [[graft.ops.CorpusOps.dsirWeightsOf]]
  * exploded each document's unigram+bigram feature array (the bigram half
  * built by an interpreted zip_with/filter lambda chain), md5-hashed each
  * feature row, looked its bucket up in the folded literal table, and
  * shuffled the stream into a per-(doc, lang) sum — one exchange and one
  * generate for a quantity that depends only on the row's own tokens.
  * This expression computes the identical (n_features, Σ logr) pair in
  * one compiled pass per document; the operator becomes map-side.
  *
  * Parity contract (pinned against the composed form in
  * SelectionDedupOpsSpec and by the `q_dsir_weights` oracle):
  *  - features = unigrams in token order, then bigrams
  *    `toks[i] + " " + toks[i+1]` (i = 1..n−1; none for a 1-token doc) —
  *    exactly `concat(toks, filter(zip_with(toks, slice(toks, 2, …)),
  *    isNotNull))`'s explode order;
  *  - bucket = first-15-md5-hex-digits-as-60-bit-int mod B
  *    (TextOps.hash60 ∘ pmod — non-negative, so % is pmod);
  *  - the sum left-folds in feature order, bit-identical to the
  *    partial-aggregate fold over the exploded stream (each doc's
  *    features sat in ONE partition in explode order);
  *  - a null token contributes a counted feature with a null (skipped)
  *    log-ratio, matching count(1)/sum(logr) over a null-hash row; a
  *    null-adjacent bigram is filtered out entirely, matching the
  *    composed filter(isNotNull).
  */
object DsirRow {

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, table: Array[Double]): InternalRow = {
    val n = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val b = table.length
    var lw = 0.0
    var count = 0L
    def add(s: String): Unit = {
      val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = h >>> 4 // first 15 hex digits = 60-bit non-negative value
      lw += table((h % b).toInt)
      count += 1L
    }
    // unigrams, in token order (a null token row still counts but its
    // null hash contributes nothing to the sum)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) count += 1L
      else add(arr.getUTF8String(i).toString)
      i += 1
    }
    // bigrams toks[i] + " " + toks[i+1] — concat (not concat_ws): a null
    // neighbor nulls the feature, which the composed form filters out
    i = 0
    while (i < n - 1) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1))
        add(arr.getUTF8String(i).toString + " " + arr.getUTF8String(i + 1).toString)
      i += 1
    }
    InternalRow(count, lw)
  }
}

case class DsirRowExpr(child: Expression, table: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("lw", DoubleType, nullable = false)))

  override def nullSafeEval(a: Any): Any =
    DsirRow.compute(a.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirTable", table, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.DsirRow.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "dsir_row"
}

object DsirRowExpressions {
  /** Column API for [[DsirRowExpr]]. */
  def dsir_row(toks: Column, table: Array[Double]): Column =
    Bridge.column(DsirRowExpr(Bridge.expression(toks), table))
}
