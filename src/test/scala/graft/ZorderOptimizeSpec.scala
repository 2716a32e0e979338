package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{And, GreaterThanOrEqual, LessThanOrEqual}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MergeTable, StatsPruning}

/** OPTIMIZE ZORDER BY on the transactional table: the rewrite re-lays
  * ALL live files on the Morton interleave, the generalized per-file
  * stats pick up tight boxes on BOTH dimensions, and a second-dimension
  * predicate's files-read drops against the linear key clustering that
  * produced full-range stripes. Values and oracles are unchanged — it is
  * a layout, not a semantics.
  */
class ZorderOptimizeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-zorder-$tag")
    Files.delete(p)
    p.toString
  }

  test("zorder rewrite: second-dimension predicate prunes files that " +
    "linear clustering cannot; rows identical before and after") {
    val t = fresh("prune")
    // event_id = x-major grid order → linear clustering by event_id gives
    // every file a tight x stripe and the FULL y range
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L }
      yield (x * 32L + y, x, y, x * 1000.0 + y)).toSeq
      .toDF("event_id", "x", "y", "value")
    MergeTable.mergeUpsert(spark, t, grid, Seq("event_id"), Seq("event_id"),
      targetRowsPerFile = 64)
    val linear = MergeTable.latestManifest(t).get
    assert(linear.files.size >= 12)
    val yBand = Seq(And(GreaterThanOrEqual("y", 0L), LessThanOrEqual("y", 3L)))
    val linearRead = StatsPruning.prune(linear.files, yBand)
    assert(linearRead.size == linear.files.size,
      s"x-major layout must not prune on y (got ${linearRead.size}/${linear.files.size})")

    val before = MergeTable.read(spark, t).orderBy("event_id").collect().toSeq
    val rewritten = MergeTable.optimize(spark, t, targetRowsPerFile = 64,
      zorderBy = Seq("x", "y"))
    assert(rewritten == linear.files.size, "zorder rewrites every live file")
    val z = MergeTable.latestManifest(t).get
    assert(z.version == linear.version + 1)
    val zRead = StatsPruning.prune(z.files, yBand)
    assert(zRead.size < z.files.size / 2,
      s"z layout must prune the y band hard: ${zRead.size}/${z.files.size}")

    // semantics unchanged: same rows, and the y-band query agrees with
    // the pre-rewrite table through the DSv2 pruned path
    val after = MergeTable.read(spark, t).orderBy("event_id").collect().toSeq
    assert(after == before)
    graft.sources.GraftScanAudit.reset()
    val n = spark.read.format("graft").load(t)
      .where(col("y") <= 3L && col("y") >= 0L).count()
    assert(n == 32 * 4)
    val audit = graft.sources.GraftScanAudit.lastFor(t).get
    assert(audit.scannedFiles == zRead.size)
    // time travel still sees the pre-rewrite layout
    assert(MergeTable.readVersion(spark, t, linear.version)
      .orderBy("event_id").collect().toSeq == before)
  }

  test("zorder retires deletion vectors like any optimize rewrite") {
    val t = fresh("dv")
    val grid = (for { x <- 0L until 16L; y <- 0L until 16L }
      yield (x * 16L + y, x, y)).toSeq.toDF("event_id", "x", "y")
    MergeTable.mergeUpsert(spark, t, grid, Seq("event_id"), Seq("event_id"),
      targetRowsPerFile = 32)
    MergeTable.mergeDelete(spark, t,
      (0L until 256L by 7).toDF("event_id"), deletionVectors = true)
    assert(MergeTable.latestManifest(t).get.files.exists(_.dv.nonEmpty))
    MergeTable.optimize(spark, t, targetRowsPerFile = 64, zorderBy = Seq("x", "y"))
    val m = MergeTable.latestManifest(t).get
    assert(m.files.forall(_.dv.isEmpty), "rewrite must retire every DV")
    assert(MergeTable.read(spark, t).count() == 256L - 37L)
  }

  test("THREE-column zorder: each dimension's band predicate prunes") {
    val t = fresh("tri")
    val grid = (for { x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L }
      yield (x * 64L + y * 8L + z, x, y, z)).toSeq
      .toDF("event_id", "x", "y", "z")
    MergeTable.mergeUpsert(spark, t, grid, Seq("event_id"), Seq("event_id"),
      targetRowsPerFile = 64)
    val before = MergeTable.read(spark, t).orderBy("event_id").collect().toSeq
    MergeTable.optimize(spark, t, targetRowsPerFile = 64,
      zorderBy = Seq("x", "y", "z"))
    val m = MergeTable.latestManifest(t).get
    for (dim <- Seq("y", "z")) { // the non-leading dims linear misses
      val band = Seq(And(GreaterThanOrEqual(dim, 0L), LessThanOrEqual(dim, 1L)))
      val kept = StatsPruning.prune(m.files, band)
      assert(kept.size < m.files.size,
        s"3-D z layout must prune a $dim band: ${kept.size}/${m.files.size}")
    }
    assert(MergeTable.read(spark, t).orderBy("event_id").collect().toSeq == before)
  }

  test("TIMESTAMP + key zorder: the epoch-micros mapping and full-bit " +
    "scaling give tight boxes on BOTH the time axis and the key") {
    val t = fresh("ts")
    // time-major insertion (one day per x): linear event_id clustering
    // gives tight time stripes and FULL y range — the most common
    // lakehouse layout ask is exactly this (ts, key) re-cluster
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L }
      yield (x * 32L + y, x, y)).toSeq.toDF("event_id", "xi", "y")
      .withColumn("ts",
        timestamp_seconds(lit(1600000000L) + col("xi") * 86400L))
      .drop("xi")
    MergeTable.mergeUpsert(spark, t, grid, Seq("event_id"), Seq("event_id"),
      targetRowsPerFile = 64)
    val linear = MergeTable.latestManifest(t).get
    val yBand = Seq(And(GreaterThanOrEqual("y", 0L), LessThanOrEqual("y", 3L)))
    assert(StatsPruning.prune(linear.files, yBand).size == linear.files.size,
      "time-major layout must not prune on the key")

    val before = MergeTable.read(spark, t).orderBy("event_id").collect().toSeq
    MergeTable.optimize(spark, t, targetRowsPerFile = 64,
      zorderBy = Seq("ts", "y"))
    val z = MergeTable.latestManifest(t).get
    // the key band now prunes…
    val yKept = StatsPruning.prune(z.files, yBand)
    assert(yKept.size < z.files.size / 2,
      s"(ts, y) z layout must prune the y band: ${yKept.size}/${z.files.size}")
    // …and the time band still does (the z trade keeps time boxes tight;
    // epoch-micros domain ≫ 16 bits, so this breaks without the scaling)
    def tsAt(day: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1600000000L + day * 86400L))
    val tsBand = Seq(And(GreaterThanOrEqual("ts", tsAt(0)),
      LessThanOrEqual("ts", tsAt(3))))
    val tsKept = StatsPruning.prune(z.files, tsBand)
    assert(tsKept.size < z.files.size / 2,
      s"time band must keep pruning: ${tsKept.size}/${z.files.size}")
    assert(MergeTable.read(spark, t).orderBy("event_id").collect().toSeq
      == before)
  }

  test("STRING dimension zorder: the exact-rank dictionary gives " +
    "integer-grade boxes; string-range and key-band predicates both prune") {
    val t = fresh("str")
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L }
      yield (x * 32L + y, f"key$x%04d", y)).toSeq
      .toDF("event_id", "tag", "y")
    MergeTable.mergeUpsert(spark, t, grid, Seq("event_id"), Seq("event_id"),
      targetRowsPerFile = 64)
    val before = MergeTable.read(spark, t).orderBy("event_id").collect().toSeq
    MergeTable.optimize(spark, t, targetRowsPerFile = 64,
      zorderBy = Seq("tag", "y"))
    val z = MergeTable.latestManifest(t).get
    val tagBand = Seq(And(GreaterThanOrEqual("tag", "key0000"),
      LessThanOrEqual("tag", "key0003")))
    val kept = StatsPruning.prune(z.files, tagBand)
    // the exact-rank dictionary makes string codes UNIFORM by
    // construction (digit strings clump into decades under any value
    // code; ranks don't), so a 1/8 string band prunes at the integer
    // case's grade, not at half
    assert(kept.size < z.files.size / 2,
      s"string range must prune hard: ${kept.size}/${z.files.size}")
    val yKept = StatsPruning.prune(z.files,
      Seq(And(GreaterThanOrEqual("y", 0L), LessThanOrEqual("y", 3L))))
    assert(yKept.size < z.files.size / 2,
      s"key band must prune: ${yKept.size}/${z.files.size}")
    assert(MergeTable.read(spark, t).orderBy("event_id").collect().toSeq
      == before)
  }

  test("zvalueN at n=2 is bit-identical to the two-column interleave") {
    val df = (0L until 200L).map(i => (i, i * 7 % 64, i * 13 % 64))
      .toDF("id", "x", "y")
    val n = df.select((graft.ops.Layout.zvalue(col("x"), col("y")) ===
      graft.ops.Layout.zvalueN(Seq(col("x"), col("y")))).as("eq"))
      .where(!col("eq")).count()
    assert(n == 0L)
  }

  test("zorderBy validation: wrong arity, unknown or non-integral columns") {
    val t = fresh("reject")
    MergeTable.mergeUpsert(spark, t,
      Seq((1L, "a", 1.0)).toDF("event_id", "tag", "value"),
      Seq("event_id"), Seq("event_id"))
    intercept[IllegalArgumentException](
      MergeTable.optimize(spark, t, zorderBy = Seq("event_id")))
    intercept[IllegalArgumentException](
      MergeTable.optimize(spark, t,
        zorderBy = Seq("event_id", "event_id", "event_id", "event_id", "event_id")))
    intercept[IllegalArgumentException](
      MergeTable.optimize(spark, t, zorderBy = Seq("event_id", "nope")))
    intercept[IllegalArgumentException](
      MergeTable.optimize(spark, t, zorderBy = Seq("event_id", "value")))
  }
}
