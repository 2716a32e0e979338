package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom plan tier end-to-end: [[graft.plans.RangeJoinStrategy]] must
  * intercept exactly the pure-interval join shape, plan
  * [[graft.plans.RangeJoinExec]], and produce results identical to an
  * independently computed (driver-side Scala) interval join — including
  * boundary hits, overlapping intervals, strict bounds, nulls, and the
  * residual-conjunct case. Shapes the strategy must NOT touch (equi+range)
  * are pinned too.
  */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // deterministic overlapping test data: points 0..99, 60 intervals of
  // width 0..12 with duplicated lo values
  private lazy val pts =
    (0 until 500).map(i => (i.toLong, (i * 37 % 100).toLong)).toDF("id", "p")
  private lazy val ivs =
    (0 until 60).map { i =>
      val lo = (i * 17 % 90).toLong
      (i.toLong, lo, lo + (i % 13).toLong)
    }.toDF("w", "lo", "hi")

  private def expected(strictHi: Boolean): Seq[(Long, Long)] =
    (for {
      (id, p) <- (0 until 500).map(i => (i.toLong, (i * 37 % 100).toLong))
      (w, lo, hi) <- (0 until 60).map { i =>
        val lo = (i * 17 % 90).toLong
        (i.toLong, lo, lo + (i % 13).toLong)
      }
      if p >= lo && (if (strictHi) p < hi else p <= hi)
    } yield (id, w)).sorted

  test("pure range join plans RangeJoinExec, not BroadcastNestedLoopJoin") {
    val j = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
    assert(planOf(j).contains("RangeJoin"), planOf(j))
    assert(!planOf(j).contains("BroadcastNestedLoop"), planOf(j))
  }

  test("inclusive-bound results match a driver-side interval join exactly") {
    val got = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
      .select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == expected(strictHi = false))
  }

  test("strict upper bound (half-open window) honored") {
    val got = pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi")
      .select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == expected(strictHi = true))
  }

  test("double-typed bounds take the boxed path and match a driver-side join") {
    // doubles deliberately stay on the interpreted-Ordering path (NaN
    // total-order semantics); results must equal the Long-typed expected set
    val dpts = pts.select($"id", $"p".cast("double").as("p"))
    val divs = ivs.select($"w", $"lo".cast("double").as("lo"), $"hi".cast("double").as("hi"))
    val j = dpts.join(divs, $"p" >= $"lo" && $"p" <= $"hi")
    assert(planOf(j).contains("RangeJoin"), planOf(j))
    val got = j.select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == expected(strictHi = false))
  }

  test("null points and null bounds never match") {
    val npts = Seq((1L, Some(5L)), (2L, None)).toDF("id", "p")
    val nivs = Seq((10L, Some(0L), Some(9L)), (11L, None, Some(9L)), (12L, Some(0L), None))
      .toDF("w", "lo", "hi")
    val got = npts.join(nivs, $"p" >= $"lo" && $"p" <= $"hi")
      .select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planOf(npts.join(nivs, $"p" >= $"lo" && $"p" <= $"hi")).contains("RangeJoin"))
    assert(got == Set((1L, 10L)))
  }

  test("extra cross-side conjunct becomes a residual filter, still RangeJoinExec") {
    val j = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi" && $"id" =!= $"w")
    assert(planOf(j).contains("RangeJoin"), planOf(j))
    val got = j.select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == expected(strictHi = false).filter { case (id, w) => id != w })
  }

  test("oversized interval side: strategy declines, Spark's BNLJ takes over") {
    // stats say the right side is huge and larger than the left -> the
    // broadcast-safety guard must fall back rather than force a broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val bigIvs = ivs.crossJoin(spark.range(2000).select(col("id").as("rep")))
        .select(col("w"), col("lo"), col("hi"))
      val small = pts.limit(3)
      val j = small.join(bigIvs, col("p") >= col("lo") && col("p") <= col("hi"))
      val p = planOf(j)
      assert(!p.contains("RangeJoin"), p)
      // Spark's own choice (BNLJ or cartesian with broadcasts disabled)
      assert(p.contains("BroadcastNestedLoop") || p.contains("CartesianProduct"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("equi+range joins are left to Spark's native strategies") {
    val a = Seq((1L, 5L)).toDF("k", "p")
    val b = Seq((1L, 0L, 9L)).toDF("k2", "lo", "hi")
    val j = a.join(b, $"k" === $"k2" && $"p" >= $"lo" && $"p" <= $"hi")
    assert(!planOf(j).contains("RangeJoin"), planOf(j))
    assert(j.count() == 1)
  }

  test("null-safe equi (<=>) + range keeps the hash join, not RangeJoinExec") {
    val a = Seq((Some(1L), 5L), (None, 5L)).toDF("k", "p")
    val b = Seq((Some(1L), 0L, 9L), (Option.empty[Long], 0L, 9L)).toDF("k2", "lo", "hi")
    val j = a.join(b, $"k" <=> $"k2" && $"p" >= $"lo" && $"p" <= $"hi")
    val p = planOf(j)
    assert(!p.contains("RangeJoin"), p)
    assert(p.contains("HashJoin"), p) // the equi-key must stay a hash key
    // NULL <=> NULL matches, so both rows pair up
    assert(j.count() == 2)
  }

  test("primitive range join fuses into WholeStageCodegen (starred node)") {
    // codegen'd nodes print as `*(stage) RangeJoin`; a bare `RangeJoin`
    // means the probe loop fell back to the interpreted iterator and the
    // exec is a codegen boundary (rows materialize to cross it). Execute
    // first: AQE only collapses codegen stages in the FINAL plan.
    val j = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
    j.collect()
    val p = planOf(j)
    assert("""\*\(\d+\) RangeJoin""".r.findFirstIn(p).nonEmpty, p)
  }

  test("codegen and interpreted primitive paths agree (incl. residual + strict)") {
    val j = () => pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi" && $"id" =!= $"w")
      .select("id", "w")
    val on = j().collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val off = try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      j().collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert(on == off)
    assert(on == expected(strictHi = true).filter { case (id, w) => id != w })
  }

  test("boxed (double) bounds stay OUTSIDE WholeStageCodegen, by design") {
    val dpts = pts.select($"id", $"p".cast("double").as("p"))
    val divs = ivs.select($"w", $"lo".cast("double").as("lo"),
      $"hi".cast("double").as("hi"))
    val p = planOf(dpts.join(divs, $"p" >= $"lo" && $"p" <= $"hi"))
    assert(p.contains("RangeJoin"), p)
    assert("""\*\(\d+\) RangeJoin""".r.findFirstIn(p).isEmpty, p)
  }

  test("q_interval_join: windowed rollup matches an independent computation") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.TimeSeriesOps.intervalJoin(spark, dir).collect()
    // independent check: event micros collected once, windows folded in Scala
    val ev = graft.sources.Tables.read(spark, dir, "events")
      .select(expr("unix_micros(ts)")).collect().map(_.getLong(0))
    val t0 = ev.min
    val expectedRows = (0 until 10).flatMap { w =>
      val lo = t0 + w.toLong * 60 * 3600 * 1000000L
      val hi = t0 + (w.toLong * 60 + 84) * 3600 * 1000000L
      val n = ev.count(t => t >= lo && t < hi)
      if (n == 0) None else Some((w, n.toLong))
    }
    assert(out.length == expectedRows.length)
    out.zip(expectedRows).foreach { case (r, (w, n)) =>
      assert(r.getInt(0) == w && r.getLong(1) == n, s"window $w mismatch")
    }
    // the plan must be the custom operator
    val p = planOf(graft.ops.TimeSeriesOps.intervalJoin(spark, dir))
    assert(p.contains("RangeJoin") && !p.contains("BroadcastNestedLoop"), p)
  }
}
