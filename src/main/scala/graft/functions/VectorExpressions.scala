package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for cosine similarity over two double arrays.
  *
  * Why custom (SURVEY §2.11 preference order (b)): the composed form —
  * `aggregate(zip_with(a,b,*),0,+) / (sqrt(..)*sqrt(..))` — walks each array
  * SIX times through interpreted higher-order lambdas (no codegen, no
  * subexpression sharing). This expression makes ONE codegen'd pass
  * accumulating dot, ‖a‖² and ‖b‖² together.
  *
  * Numeric contract: each accumulator is a left-fold in index order —
  * bit-identical to the composed form and to the DuckDB oracle's
  * `list_sum(list_transform(...))`, so ANN rankings are unchanged.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  // Length mismatch OR a null element → null, matching the composed
  // zip_with/aggregate form exactly (zip_with pads the shorter side with
  // nulls, and any null poisons the whole fold). A malformed embedding
  // surfaces as a null, not a plausible wrong score — and the exact parity
  // is what licenses NativeKernelRule to substitute this expression for
  // the composed fold unconditionally.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // null element → null result, matching the composed form (a null
      // poisons the whole zip_with/aggregate fold)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Native squared-L2 distance over two double arrays — the PQ hot path
  * (codebook assignment + ADC lookup tables both score Σ(aᵢ−bᵢ)²). Same
  * design rules as [[CosineSimilarity]]: one codegen'd pass, left-fold in
  * index order (bit-identical to the composed `aggregate(zip_with(...))`
  * form and DuckDB's `list_sum(list_transform(...))`), length mismatch →
  * null.
  */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_sq"
}

/** Native dot product over two double arrays — the LSH sign-bit path.
  * [[CosineSimilarity]] is NOT a substitute there: for a zero-norm vector
  * cosine is NaN (0/0) so `cos >= 0` is false, while `dot >= 0` is true —
  * a silent signature divergence vs any oracle computing the raw dot. Same
  * design rules as the siblings: one codegen'd pass, left-fold in index
  * order, length mismatch → null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Native ADC (asymmetric-distance-computation) sum — the PQ search inner
  * loop (round-18 optimization): adc_d2 = Σ_j dtab[j·k + codes[j]] over the
  * m subspaces, evaluated once per (candidate, query) PAIR. The composed
  * form — `aggregate(sequence(0, m−1), 0.0, (acc, j) -> acc +
  * element_at(dtab, j·k + element_at(codes, j+1) + 1))` — is a
  * HigherOrderFunction: no codegen, a lambda-variable row per step, and a
  * materialized m-element sequence per PAIR, on the one stream whose row
  * count is the ADC scan itself (n·q for the flat scan, Σ cell·q for
  * IVF-PQ). This expression makes the same m lookups in one compiled loop.
  *
  * Numeric contract (pinned in VectorExpressionSpec and by the three ADC
  * oracles): the sum left-folds in subspace order j = 0..m−1 — bit-identical
  * to the composed fold and to the oracle's ORDER BY j list_sum. A null
  * codes/dtab element poisons the fold to null exactly like `acc + null`;
  * an out-of-range slot (impossible against the densified m·k dtab — see
  * [[graft.ops.SimilarityOps]] pqLutWide) also yields null rather than a
  * fabricated distance.
  */
case class AdcSum(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint> codes, array<double> dtab), " +
        s"got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val dtab = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val nt = dtab.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val slot = j * k + codes.getLong(j)
      if (slot < 0 || slot >= nt || dtab.isNullAt(slot.toInt)) return null
      acc += dtab.getDouble(slot.toInt)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val nt = ctx.freshName("nt")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val slot = ctx.freshName("slot")
      s"""
         |int $m = $a.numElements();
         |int $nt = $b.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $slot = (long) $j * $k + $a.getLong($j);
         |  if ($slot < 0 || $slot >= $nt || $b.isNullAt((int) $slot)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += $b.getDouble((int) $slot);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_sum"
}

object VectorExpressions {
  /** Column API for [[CosineSimilarity]]. */
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[AdcSum]]. */
  def adc_sum(codes: Column, dtab: Column, k: Int): Column =
    Bridge.column(AdcSum(Bridge.expression(codes), Bridge.expression(dtab), k))

  /** Column API for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[L2SquaredDistance]]. */
  def l2_sq(a: Column, b: Column): Column =
    Bridge.column(L2SquaredDistance(Bridge.expression(a), Bridge.expression(b)))
}
