package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}

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
    residual: Option[Expression]) extends BinaryExecNode with CodegenSupport {

  override def left: SparkPlan = streamed
  override def right: SparkPlan = broadcast
  override def output: Seq[Attribute] = streamed.output ++ broadcast.output

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  private def allIntegral: Boolean = {
    import org.apache.spark.sql.types._
    def integral(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
          TimestampType | TimestampNTZType => true
      case _ => false
    }
    Seq(point, lower, upper).map(_.dataType).forall(integral)
  }

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
    // All three bound expressions evaluate to a JVM integral? → the
    // primitive probe path: bounds in long[] arrays, comparisons on
    // primitives — no per-comparison boxing or Ordering dispatch. This is
    // the dominant shape (timestamps, ids, dates); the boxed interpreted
    // path remains for decimals/strings/doubles (doubles stay boxed so NaN
    // keeps the interpreted total order rather than primitive-< semantics).
    if (allIntegral) doExecutePrimitive()
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
    val numOutput = longMetric("numOutputRows")
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
            .map { jr => numOutput.add(1); toUnsafe(jr) }
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
    val builder = indexBuilder
    val boundPoint = BindReferences.bindReference(point, streamed.output)
    val boundResidual = residual.map(BindReferences.bindReference(_, output))
    val loStrict = lowerStrict
    val hiStrict = upperStrict
    val outputAttrs = output
    val numOutput = longMetric("numOutputRows")

    streamed.execute().mapPartitions { iter =>
      val probe = new RangeProbe(builder.get(relation.value), loStrict, hiStrict)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
      iter.flatMap { srow =>
        val p = boundPoint.eval(srow)
        if (p == null) Iterator.empty
        else {
          val n = probe.query(RangeJoinExec.anyToLong(p))
          (0 until n).iterator
            .map(i => joined(srow, probe.row(i)))
            .filter(jr => boundResidual.forall(r => r.eval(jr) == true))
            .map { jr => numOutput.add(1); toUnsafe(jr) }
        }
      }
    }
  }

  /** The per-executor-memoizing index builder shipped to tasks (and, on
    * the codegen path, into the generated class as a reference object). */
  private def indexBuilder: PrimitiveIndexBuilder =
    PrimitiveIndexBuilder(
      BindReferences.bindReference(lower, broadcast.output),
      BindReferences.bindReference(upper, broadcast.output),
      s"prim:${lower.semanticHash()}:${upper.semanticHash()}")

  // ---- whole-stage codegen (primitive path only) ---------------------------
  //
  // The interpreted doExecute is a per-row iterator chain (eval point →
  // segment-tree probe → JoinedRow → residual eval → UnsafeProjection) and
  // a codegen BOUNDARY: upstream and downstream stages materialize rows to
  // cross it. With CodegenSupport the probe loop fuses into the streamed
  // side's stage — point evaluation, match loop, broadcast-column loads and
  // the residual check all compile into the same Java method, and the only
  // non-generated call per probe is RangeProbe.query (a final method over
  // primitive arrays, the same shape as the HashedRelation.get call inside
  // Spark's generated broadcast-hash-join loop). The boxed (non-integral)
  // path keeps the interpreted exec: supportCodegen gates on the bound types.

  override def supportCodegen: Boolean = allIntegral

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    streamed.asInstanceOf[CodegenSupport].inputRDDs()

  // one stream row can emit many joined rows; downstream must copy
  override def needCopyResult: Boolean = true

  protected override def doProduce(ctx: CodegenContext): String =
    streamed.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    // per-partition probe over the per-executor memoized index: built once
    // in the generated class's init, exactly like BroadcastHashJoin's
    // relation term
    val relation = broadcast.executeBroadcast[Array[InternalRow]]()
    val bcTerm = ctx.addReferenceObj("rangeJoinBroadcast", relation,
      relation.getClass.getName)
    val builderTerm = ctx.addReferenceObj("rangeJoinIndexBuilder",
      indexBuilder, classOf[PrimitiveIndexBuilder].getName)
    val probeCls = classOf[RangeProbe].getName
    val probeTerm = ctx.addMutableState(probeCls, "rangeJoinProbe",
      v => s"$v = new $probeCls($builderTerm.get(" +
        s"(InternalRow[]) $bcTerm.value()), $lowerStrict, $upperStrict);")

    // evaluate the probe point from the streamed side's current variables
    ctx.currentVars = input
    val pointEv =
      BindReferences.bindReference(point, streamed.output).genCode(ctx)

    // inside the match loop: load the broadcast row's columns
    val matched = ctx.freshName("rangeJoinMatchedRow")
    ctx.currentVars = null
    ctx.INPUT_ROW = matched
    val buildVars = broadcast.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val buildCode = evaluateVariables(buildVars)

    // residual conjuncts run over streamed + broadcast variables
    val checkResidual = residual.map { cond =>
      ctx.currentVars = input ++ buildVars
      val ev = BindReferences
        .bindReference(cond, streamed.output ++ broadcast.output).genCode(ctx)
      s"""
         |${ev.code}
         |if (${ev.isNull} || !${ev.value}) continue;
       """.stripMargin
    }.getOrElse("")

    val nTerm = ctx.freshName("rangeJoinMatches")
    val iTerm = ctx.freshName("rangeJoinIdx")
    val numOutput = metricTerm(ctx, "numOutputRows")
    s"""
       |${pointEv.code}
       |if (!${pointEv.isNull}) {
       |  int $nTerm = $probeTerm.query((long) ${pointEv.value});
       |  for (int $iTerm = 0; $iTerm < $nTerm; $iTerm++) {
       |    InternalRow $matched = $probeTerm.row($iTerm);
       |    $buildCode
       |    $checkResidual
       |    $numOutput.add(1);
       |    ${consume(ctx, input ++ buildVars)}
       |  }
       |}
     """.stripMargin
  }
}

/** Per-partition probe state over a shared [[RangeJoinExec.PrimitiveIndex]]:
  * the iterative-recursive segment-tree descent plus a growable match
  * buffer. One instance per task/generated-class instance — the INDEX is
  * shared across tasks (executor-memoized, immutable), the buffer is not.
  * Final methods over primitive arrays: the JIT compiles the descent tight
  * whether called from the interpreted iterator or from generated code.
  */
final class RangeProbe(idx: RangeJoinExec.PrimitiveIndex,
    loStrict: Boolean, hiStrict: Boolean) {
  private[this] val lo = idx.lo
  private[this] val hi = idx.hi
  private[this] val maxHi = idx.maxHi
  private[this] val n = idx.lo.length
  private[this] var buf = new Array[Int](math.min(math.max(n, 8), 64))
  private[this] var count = 0

  /** The i-th matched interval's broadcast row (valid after [[query]]). */
  def row(i: Int): InternalRow = idx.rows(buf(i))

  /** Collect all intervals containing p; returns the match count. */
  def query(p: Long): Int = {
    count = 0
    if (n > 0) visit(1, 0, n - 1, p)
    count
  }

  private def visit(node: Int, s: Int, e: Int, p: Long): Unit = {
    // prune: every hi in this subtree is below p
    if (if (hiStrict) maxHi(node) <= p else maxHi(node) < p) return
    // prune: every lo in this subtree is above p (lo-sorted array)
    if (if (loStrict) lo(s) >= p else lo(s) > p) return
    if (s == e) {
      val okLo = if (loStrict) lo(s) < p else lo(s) <= p
      val okHi = if (hiStrict) hi(s) > p else hi(s) >= p
      if (okLo && okHi) {
        if (count == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        buf(count) = s
        count += 1
      }
    } else {
      val m = (s + e) / 2
      visit(2 * node, s, m, p)
      visit(2 * node + 1, m + 1, e, p)
    }
  }
}

/** Builds (or fetches the executor-memoized) primitive interval index for
  * a broadcast row array — serializable so both the interpreted task
  * closure and the generated class (as a reference object) can call
  * [[get]]. The memo key is the broadcast array identity + the bound
  * expressions, so re-plans and multi-stage reuse share one build.
  */
case class PrimitiveIndexBuilder(boundLo: Expression, boundHi: Expression,
    subKey: String) {
  def get(rows: Array[InternalRow]): RangeJoinExec.PrimitiveIndex =
    RangeJoinExec.indexFor[RangeJoinExec.PrimitiveIndex](rows, subKey)({
      val kept = rows.flatMap { r =>
        val lo = boundLo.eval(r)
        val hi = boundHi.eval(r)
        if (lo == null || hi == null) None
        else Some((RangeJoinExec.anyToLong(lo), RangeJoinExec.anyToLong(hi), r))
      }.sortBy(_._1)
      val n = kept.length
      val lo = new Array[Long](n)
      val hi = new Array[Long](n)
      val rws = new Array[InternalRow](n)
      var i = 0
      while (i < n) {
        lo(i) = kept(i)._1; hi(i) = kept(i)._2; rws(i) = kept(i)._3
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
      RangeJoinExec.PrimitiveIndex(lo, hi, rws, mh)
    })
}

object RangeJoinExec {
  /** Index for the primitive (integral-typed) probe path: parallel long[]
    * bound arrays + the subtree-max-hi segment tree, all unboxed.
    */
  final case class PrimitiveIndex(
      lo: Array[Long], hi: Array[Long],
      rows: Array[InternalRow], maxHi: Array[Long])

  /** Integral eval result → Long (Int for date, Long for timestamp, …). */
  def anyToLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

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
