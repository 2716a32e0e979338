package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom-plan-tier (c) operator: a broadcast RANGE (interval) join.
  *
  * Vanilla Spark plans a join whose only condition is `point >= lo AND
  * point <= hi` (no equi-key) as BroadcastNestedLoopJoin — every stream
  * row is compared against EVERY interval, O(n·m). This strategy plans the
  * same logical shape as [[RangeJoinExec]]: the broadcast interval side is
  * sorted by `lo` and indexed with a max-`hi` segment tree, so each stream
  * row probes O(log m + k) intervals. Same inputs, same output, same
  * broadcast cost — strictly less compute; at 100 TB the stream side never
  * shuffles at all (map-side join), exactly like the BNLJ it replaces.
  *
  * Fires only on the shape it can improve:
  *  - INNER join, no join hints, condition is a conjunction containing
  *    exactly one lower and one upper bound comparing ONE expression over
  *    the left side against expressions over the right side;
  *  - no equi-conjunct (Spark's hash/sort-merge strategies win there);
  *  - any remaining conjuncts become a residual filter on matched pairs;
  *  - the bound type is an orderable atomic (timestamp, numeric, ...).
  *
  * Registered via `SparkSessionExtensions.injectPlannerStrategy` in
  * [[graft.functions.GraftExtensions]] — users keep writing plain
  * `df.join(wins, $"ts" >= $"lo" && $"ts" < $"hi")`.
  *
  * Reference semantics anchor: the window-membership lookups of
  * fetch-weather/src/tasks.py:63-73 (events against forecast windows),
  * generalized to arbitrary interval tables.
  */
object RangeJoinStrategy extends SparkStrategy with PredicateHelper {

  /** (point, bound, isLower, isStrict) for a single comparison whose two
    * sides split cleanly across the join's children; None otherwise.
    */
  private def asBound(
      c: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Boolean, Boolean)] = {
    def split(a: Expression, b: Expression): Option[(Expression, Expression, Boolean)] =
      // returns (leftSideExpr, rightSideExpr, flipped)
      if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
        Some((a, b, false))
      else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        Some((b, a, true))
      else None
    c match {
      case GreaterThanOrEqual(a, b) => // a >= b
        split(a, b).map { case (p, r, flipped) => (p, r, !flipped, false) }
      case LessThanOrEqual(a, b) => // a <= b
        split(a, b).map { case (p, r, flipped) => (p, r, flipped, false) }
      case GreaterThan(a, b) =>
        split(a, b).map { case (p, r, flipped) => (p, r, !flipped, true) }
      case LessThan(a, b) =>
        split(a, b).map { case (p, r, flipped) => (p, r, flipped, true) }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(cond), hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
      val conjuncts = splitConjunctivePredicates(cond)
      // EqualNullSafe counts too: `a <=> b` is an equi-key for Spark's
      // hash/sort-merge strategies, so intercepting that shape here would
      // demote the equality to a residual filter and replace a hash join
      // with an all-buckets interval probe.
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        case EqualNullSafe(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        case _ => false
      }
      if (hasEqui) return Nil
      val bounds = conjuncts.map(c => c -> asBound(c, left, right))
      val lowers = bounds.collect { case (c, Some((p, r, true, st))) => (c, p, r, st) }
      val uppers = bounds.collect { case (c, Some((p, r, false, st))) => (c, p, r, st) }
      // Broadcast-safety guard: this exec MUST broadcast the interval
      // (right) side, so only fire when that is a safe choice — the side
      // fits the auto-broadcast threshold, or it is no larger than the
      // left side (in which case vanilla BNLJ would broadcast it anyway).
      // Otherwise fall back to Spark's own strategies rather than force a
      // driver-OOM-sized broadcast.
      val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val rightBroadcastSafe =
        right.stats.sizeInBytes <= BigInt(math.max(threshold, 0L)) ||
          right.stats.sizeInBytes <= left.stats.sizeInBytes
      if (!rightBroadcastSafe) return Nil
      (lowers, uppers) match {
        case (Seq((lc, lp, lo, loStrict)), Seq((uc, up, hi, hiStrict)))
            if lp.semanticEquals(up) &&
              RowOrdering.isOrderable(lp.dataType) =>
          val residual = conjuncts.filterNot(c => c.fastEquals(lc) || c.fastEquals(uc))
            .reduceOption(And)
          graft.plans.RangeJoinExec(
            planLater(left), planLater(right),
            lp, lo, loStrict, hi, hiStrict, residual) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Physical broadcast interval join (see [[RangeJoinStrategy]]).
  *
  * Build side (right, broadcast): intervals with non-null bounds, sorted
  * by `lo`, augmented with a segment tree of subtree-max `hi`. A probe
  * for stream value p descends the tree pruning (a) subtrees whose max
  * `hi` is below p — no interval there can contain p — and (b) subtrees
  * whose leftmost `lo` is above p (the array is lo-sorted). Matched rows
  * pass the residual condition before emission.
  */
case class RangeJoinExec(
    streamed: SparkPlan,
    broadcast: SparkPlan,
    point: Expression,
    lower: Expression,
    lowerStrict: Boolean,
    upper: Expression,
    upperStrict: Boolean,
    residual: Option[Expression]) extends BinaryExecNode {

  override def left: SparkPlan = streamed
  override def right: SparkPlan = broadcast
  override def output: Seq[Attribute] = streamed.output ++ broadcast.output

  // rows pass through the streamed side untouched — keep its partitioning
  // visible so a downstream groupBy on an already-partitioned key doesn't
  // re-shuffle (BroadcastNestedLoopJoin does the same)
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    streamed.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(streamed = newLeft, broadcast = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    import org.apache.spark.sql.types._
    // All three bound expressions evaluate to a JVM integral? → the
    // primitive probe path: bounds in long[] arrays, comparisons on
    // primitives — no per-comparison boxing or Ordering dispatch. This is
    // the dominant shape (timestamps, ids, dates); the boxed interpreted
    // path remains for decimals/strings/doubles (doubles stay boxed so NaN
    // keeps the interpreted total order rather than primitive-< semantics).
    def integral(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
          TimestampType | TimestampNTZType => true
      case _ => false
    }
    if (Seq(point, lower, upper).map(_.dataType).forall(integral))
      doExecutePrimitive()
    else doExecuteGeneric()
  }

  /** Boxed path: arbitrary orderable atomic types via interpreted Ordering. */
  private def doExecuteGeneric(): RDD[InternalRow] = {
    val relation = broadcast.executeBroadcast[Array[InternalRow]]()
    val boundPoint = BindReferences.bindReference(point, streamed.output)
    val boundLo = BindReferences.bindReference(lower, broadcast.output)
    val boundHi = BindReferences.bindReference(upper, broadcast.output)
    val boundResidual = residual.map(BindReferences.bindReference(_, output))
    val ordering = TypeUtils.getInterpretedOrdering(point.dataType)
    val loStrict = lowerStrict
    val hiStrict = upperStrict
    val outputAttrs = output
    val subKey = s"gen:${lower.semanticHash()}:${upper.semanticHash()}"

    streamed.execute().mapPartitions { iter =>
      // index built once per EXECUTOR per broadcast (weak-keyed on the
      // broadcast array so it is GC'd with the broadcast), not once per
      // task — thousands of tasks would otherwise repeat the same
      // O(m log m) sort+build over identical immutable rows
      val (intervals, maxHi) = RangeJoinExec.indexFor[
          (Array[(Any, Any, InternalRow)], Array[Any])](relation.value, subKey)({
        val ivs = relation.value.flatMap { r =>
          val lo = boundLo.eval(r)
          val hi = boundHi.eval(r)
          if (lo == null || hi == null) None else Some((lo, hi, r))
        }.sortWith((x, y) => ordering.lt(x._1, y._1))
        val n = ivs.length
        val mh = new Array[Any](4 * math.max(n, 1))
        def build(node: Int, s: Int, e: Int): Any = {
          val v =
            if (s == e) ivs(s)._2
            else {
              val m = (s + e) / 2
              val l = build(2 * node, s, m)
              val r = build(2 * node + 1, m + 1, e)
              if (ordering.gteq(l, r)) l else r
            }
          mh(node) = v
          v
        }
        if (n > 0) build(1, 0, n - 1)
        (ivs, mh)
      })
      val n = intervals.length

      def containsPoint(i: Int, p: Any): Boolean = {
        val okLo =
          if (loStrict) ordering.lt(intervals(i)._1, p)
          else ordering.lteq(intervals(i)._1, p)
        val okHi =
          if (hiStrict) ordering.gt(intervals(i)._2, p)
          else ordering.gteq(intervals(i)._2, p)
        okLo && okHi
      }

      def query(p: Any, emit: Int => Unit): Unit = {
        def visit(node: Int, s: Int, e: Int): Unit = {
          // prune: every hi in this subtree is below p
          val hiOk =
            if (hiStrict) ordering.gt(maxHi(node), p) else ordering.gteq(maxHi(node), p)
          if (!hiOk) return
          // prune: every lo in this subtree is above p (lo-sorted array)
          val loOk =
            if (loStrict) ordering.lt(intervals(s)._1, p)
            else ordering.lteq(intervals(s)._1, p)
          if (!loOk) return
          if (s == e) { if (containsPoint(s, p)) emit(s) }
          else {
            val m = (s + e) / 2
            visit(2 * node, s, m)
            visit(2 * node + 1, m + 1, e)
          }
        }
        if (n > 0) visit(1, 0, n - 1)
      }

      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
      iter.flatMap { srow =>
        val p = boundPoint.eval(srow)
        if (p == null) Iterator.empty
        else {
          val matches = scala.collection.mutable.ArrayBuffer.empty[Int]
          query(p, matches += _)
          matches.iterator
            .map(i => joined(srow, intervals(i)._3))
            .filter(jr => boundResidual.forall(r => r.eval(jr) == true))
            .map(toUnsafe)
        }
      }
    }
  }

  /** Primitive path: integral bound types normalized to Long; the sorted-lo
    * array, hi array and subtree-max-hi segment tree are all long[] — the
    * probe loop compares primitives only (ScaleProbe wall time 1.2 s →
    * 0.9 s at 10⁵ intervals × 5·10⁵ points incl. job overhead; identical
    * outputs — see ROADMAP.md).
    */
  private def doExecutePrimitive(): RDD[InternalRow] = {
    val relation = broadcast.executeBroadcast[Array[InternalRow]]()
    val boundPoint = BindReferences.bindReference(point, streamed.output)
    val boundLo = BindReferences.bindReference(lower, broadcast.output)
    val boundHi = BindReferences.bindReference(upper, broadcast.output)
    val boundResidual = residual.map(BindReferences.bindReference(_, output))
    val loStrict = lowerStrict
    val hiStrict = upperStrict
    val outputAttrs = output

    def toLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }

    val subKey = s"prim:${lower.semanticHash()}:${upper.semanticHash()}"
    streamed.execute().mapPartitions { iter =>
      val idx = RangeJoinExec.indexFor[RangeJoinExec.PrimitiveIndex](relation.value, subKey)({
        val kept = relation.value.flatMap { r =>
          val lo = boundLo.eval(r)
          val hi = boundHi.eval(r)
          if (lo == null || hi == null) None else Some((toLong(lo), toLong(hi), r))
        }.sortBy(_._1)
        val n = kept.length
        val lo = new Array[Long](n)
        val hi = new Array[Long](n)
        val rows = new Array[InternalRow](n)
        var i = 0
        while (i < n) {
          lo(i) = kept(i)._1; hi(i) = kept(i)._2; rows(i) = kept(i)._3
          i += 1
        }
        val mh = new Array[Long](4 * math.max(n, 1))
        def build(node: Int, s: Int, e: Int): Long = {
          val v =
            if (s == e) hi(s)
            else {
              val m = (s + e) / 2
              math.max(build(2 * node, s, m), build(2 * node + 1, m + 1, e))
            }
          mh(node) = v
          v
        }
        if (n > 0) build(1, 0, n - 1)
        RangeJoinExec.PrimitiveIndex(lo, hi, rows, mh)
      })
      val lo = idx.lo
      val hi = idx.hi
      val rows = idx.rows
      val maxHi = idx.maxHi
      val n = lo.length

      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
      val matches = scala.collection.mutable.ArrayBuffer.empty[Int]

      def query(p: Long): Unit = {
        def visit(node: Int, s: Int, e: Int): Unit = {
          // prune: every hi in this subtree is below p
          if (if (hiStrict) maxHi(node) <= p else maxHi(node) < p) return
          // prune: every lo in this subtree is above p (lo-sorted array)
          if (if (loStrict) lo(s) >= p else lo(s) > p) return
          if (s == e) {
            val okLo = if (loStrict) lo(s) < p else lo(s) <= p
            val okHi = if (hiStrict) hi(s) > p else hi(s) >= p
            if (okLo && okHi) matches += s
          } else {
            val m = (s + e) / 2
            visit(2 * node, s, m)
            visit(2 * node + 1, m + 1, e)
          }
        }
        if (n > 0) visit(1, 0, n - 1)
      }

      iter.flatMap { srow =>
        val p = boundPoint.eval(srow)
        if (p == null) Iterator.empty
        else {
          matches.clear()
          query(toLong(p))
          matches.toArray.iterator
            .map(i => joined(srow, rows(i)))
            .filter(jr => boundResidual.forall(r => r.eval(jr) == true))
            .map(toUnsafe)
        }
      }
    }
  }
}

object RangeJoinExec {
  /** Index for the primitive (integral-typed) probe path: parallel long[]
    * bound arrays + the subtree-max-hi segment tree, all unboxed.
    */
  final case class PrimitiveIndex(
      lo: Array[Long], hi: Array[Long],
      rows: Array[InternalRow], maxHi: Array[Long])

  /** Per-JVM (executor) index memo: weak-keyed on the broadcast row array
    * (entries die with their broadcast), sub-keyed by the bound
    * expressions + index kind — two RangeJoinExec nodes CAN probe the same
    * broadcast on different interval columns, and must not share an index.
    * Writes through the synchronized/CHM layers are not atomic across the
    * compound op — a rare concurrent first use can build twice, which is
    * harmless (idempotent value, last write wins).
    */
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      AnyRef, java.util.concurrent.ConcurrentHashMap[String, AnyRef]]())

  private[plans] def indexFor[T <: AnyRef](
      key: AnyRef, subKey: String)(build: => T): T = {
    var inner = cache.get(key)
    if (inner == null) {
      inner = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
      val prev = cache.putIfAbsent(key, inner)
      if (prev != null) inner = prev
    }
    val got = inner.get(subKey)
    if (got != null) got.asInstanceOf[T]
    else {
      val v = build
      inner.put(subKey, v)
      v
    }
  }
}
