package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule (SURVEY §2.11 tier (c), the logical-plan half of the
  * custom surface next to [[RangeJoinStrategy]]'s physical half): rewrite
  * the DECLARATIVE dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)
  *
  * to the native codegen'd [[graft.functions.DotProduct]]. Higher-order
  * lambdas never enter whole-stage codegen, so a user who writes the
  * natural declarative form pays interpreted per-element lambda dispatch;
  * with this rule they get the compiled single-pass kernel automatically —
  * the same contract Catalyst itself applies (declare intent, the engine
  * picks the implementation).
  *
  * The substitution is unconditionally semantics-preserving because the
  * native expression reproduces the fold exactly: left-to-right summation
  * order (bit-identical doubles), null on length mismatch (zip_with pads
  * with nulls → fold is null), null on any null element. The composed
  * COSINE (dot / (sqrt(dot)·sqrt(dot))) is deliberately NOT fused into
  * [[graft.functions.CosineSimilarity]]: Spark's `Divide` yields null for
  * a 0.0 divisor (zero-norm vector) where the fused kernel's Java division
  * yields NaN — the three inner folds still become native kernels, which
  * is where the per-element cost lives.
  *
  * Runs in the operator-optimization fixpoint batch
  * (`injectOptimizerRule`), so a zero literal reaching this shape via
  * casts is constant-folded before the pattern is re-checked.
  */
object NativeKernelRule extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def argIds(l: LambdaFunction): Option[Seq[ExprId]] = {
    val ids = l.arguments.collect { case v: NamedLambdaVariable => v.exprId }
    if (ids.length == l.arguments.length) Some(ids) else None
  }

  /** (x, y) -> x * y over exactly the two lambda arguments, either order. */
  private def isProductLambda(f: Expression): Boolean = f match {
    case l: LambdaFunction =>
      (l.function, argIds(l)) match {
        case (m: Multiply, Some(Seq(a, b))) =>
          (m.left, m.right) match {
            case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
              Set(x.exprId, y.exprId) == Set(a, b)
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  /** (acc, v) -> acc + v over exactly the two lambda arguments. */
  private def isSumLambda(f: Expression): Boolean = f match {
    case l: LambdaFunction =>
      (l.function, argIds(l)) match {
        case (ad: Add, Some(Seq(a, b))) =>
          (ad.left, ad.right) match {
            case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
              Set(x.exprId, y.exprId) == Set(a, b)
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  /** acc -> acc (the identity finish the Column API attaches). */
  private def isIdentityLambda(f: Expression): Boolean = f match {
    case l: LambdaFunction =>
      (l.function, argIds(l)) match {
        case (v: NamedLambdaVariable, Some(Seq(a))) => v.exprId == a
        case _ => false
      }
    case _ => false
  }

  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case agg: ArrayAggregate =>
        (agg.argument, agg.zero) match {
          case (zw: ZipWith, Literal(zero: Double, DoubleType))
              if zero == 0.0 &&
                isDoubleArray(zw.left) && isDoubleArray(zw.right) &&
                isProductLambda(zw.function) &&
                isSumLambda(agg.merge) && isIdentityLambda(agg.finish) =>
            Some((zw.left, zw.right))
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p => p.transformExpressionsUp {
      case DotFold(a, b) => DotProduct(a, b)
    }
  }
}
