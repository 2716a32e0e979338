package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Compaction, ShardOps, SketchOps}
import graft.sources.Tables

/** Round-8 maintenance/monitoring tier: small-file compaction, the
  * one-pass table profiler, deterministic shuffle-sharding, and mergeable
  * HLL sketch rollups. The oracled queries pin VALUES; these tests pin the
  * properties the oracle cannot see — file counts, plan shape, exact
  * merge algebra, determinism under re-execution.
  */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  // ---- compaction ---------------------------------------------------------

  test("compaction: fragmented days collapse; rows and content survive") {
    val in = Compaction.ensureFragmented(spark, dir)
    val before = Compaction.filesPerDay(in)
    assert(before.nonEmpty)
    // the synthetic pre-state really is fragmented: every day has many files
    assert(before.values.min >= Compaction.FragmentFactor / 2,
      s"pre-state not fragmented: $before")

    val out = java.nio.file.Files.createTempDirectory("graft_compactspec")
      .resolve("out").toString
    Compaction.compact(spark, in, out, targetBytes = 64L * 1024 * 1024)
    val after = Compaction.filesPerDay(out)
    assert(after.keySet == before.keySet) // no day lost or invented
    // at test scale every day fits one target file
    assert(after.values.max <= 2, s"still fragmented after compact: $after")

    val rowsIn = spark.read.parquet(in).count()
    val rowsOut = spark.read.parquet(out).count()
    assert(rowsIn == rowsOut)
    // content digest: order-free row hash must match exactly
    def digest(p: String): Long = spark.read.parquet(p)
      .agg(sum(pmod(graft.ops.TextOps.hash60(
        concat_ws(":", col("event_id"), col("user_id"), col("event_type"))),
        lit(1L << 40)))).collect()(0).getLong(0)
    assert(digest(in) == digest(out))
  }

  test("compaction: a hot day splits into multiple bounded files") {
    // one giant day (every row same date) + a tiny target ⇒ AQE's
    // skew-split must emit >1 file for that day, not one monolith
    val in = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"),
      "graft-compact", s"hotday_${spark.sparkContext.applicationId}").toString
    Tables.read(spark, dir, "events")
      .withColumn("event_date", lit("2024-06-01").cast("date"))
      .repartition(8)
      .write.partitionBy("event_date").mode("overwrite").parquet(in)
    val out = in + "_compacted"
    // events at sf0.001 shuffles ~50 KB total — an 8 KB target forces the
    // single hot day's reduce partition over the split threshold
    Compaction.compact(spark, in, out, targetBytes = 8L * 1024)
    val after = Compaction.filesPerDay(out)
    assert(after.size == 1)
    assert(after.values.head > 1,
      s"hot day not split by rebalance: $after")
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(in).count())
  }

  test("incremental compaction touches ONLY fragmented days") {
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"),
      "graft-compact", s"incr_${spark.sparkContext.applicationId}").toString
    val ev = Tables.read(spark, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
    val days = ev.select("event_date").distinct().orderBy("event_date")
      .collect().map(_.getDate(0).toString)
    val (healthyDay, hotDay) = (days.head, days.last)
    // healthy day: one file; hot day: 24 fragments
    ev.where(col("event_date") === lit(healthyDay).cast("date"))
      .repartition(1)
      .write.partitionBy("event_date").mode("overwrite").parquet(root)
    ev.where(col("event_date") === lit(hotDay).cast("date"))
      .repartition(24)
      .write.partitionBy("event_date").mode("append").parquet(root)

    def fileState(day: String): Set[(String, Long, Long)] = {
      val d = java.nio.file.Paths.get(root, s"event_date=$day")
      val s = java.nio.file.Files.list(d).iterator()
      val b = Set.newBuilder[(String, Long, Long)]
      while (s.hasNext) {
        val p = s.next()
        if (p.getFileName.toString.endsWith(".parquet"))
          b += ((p.getFileName.toString, java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis))
      }
      b.result()
    }
    val healthyBefore = fileState(healthyDay)
    val rowsBefore = spark.read.parquet(root).count()

    val touched = graft.ops.Compaction.compactIncremental(
      spark, root, targetBytes = 64L * 1024 * 1024, minFiles = 4)
    assert(touched == Seq(hotDay), s"touched $touched")
    // the healthy day's files are BYTE-IDENTICAL (same names/sizes/mtimes)
    assert(fileState(healthyDay) == healthyBefore)
    // the hot day collapsed
    val after = graft.ops.Compaction.filesPerDay(root)
    assert(after(s"event_date=$hotDay") <= 2, s"still fragmented: $after")
    assert(spark.read.parquet(root).count() == rowsBefore)
    // second run: nothing left to do
    assert(graft.ops.Compaction.compactIncremental(
      spark, root, minFiles = 4).isEmpty)
  }

  // ---- profiler -----------------------------------------------------------

  test("profile: exact form plans the Expand, approx form does not") {
    val exact = SketchOps.profileTable(spark, dir, exact = true)
    val approx = SketchOps.profileTable(spark, dir, exact = false)
    val exactPlan = exact.queryExecution.executedPlan.toString
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-distinct should plan via Expand")
    assert(!approxPlan.contains("Expand"),
      "approx profile must be a single pass with no row multiplier")
  }

  test("profile: approx distincts within 2% of exact everywhere") {
    val exact = SketchOps.profileTable(spark, dir, exact = true)
      .select("column_name", "n_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SketchOps.profileTable(spark, dir, exact = false)
      .select("column_name", "n_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(math.abs(a - e).toDouble / math.max(e, 1L) <= 0.02,
        s"$c: approx $a vs exact $e")
    }
  }

  // ---- shuffle-shard ------------------------------------------------------

  test("shard: every doc assigned exactly once; reruns are identical") {
    val a = ShardOps.shuffleShard(spark, dir)
      .select("doc_id", "shard_id", "position")
    val nDocs = Tables.read(spark, dir, "documents").count()
    assert(a.count() == nDocs)
    assert(a.select("doc_id").distinct().count() == nDocs)
    val b = ShardOps.shuffleShard(spark, dir)
      .select("doc_id", "shard_id", "position")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("shard: assignment survives input repartitioning (no rand())") {
    val base = ShardOps.shuffleShardStats(spark, dir).collect()
    // same op over a shuffled copy of the input must emit identical stats
    val shuffled = Tables.read(spark, dir, "documents").repartition(17)
    val key = graft.ops.TextOps.hash60(concat_ws(":", col("doc_id"), lit(42)))
    val alt = shuffled
      .select(col("doc_id"), col("text"), key.as("k"))
      .withColumn("shard_id", pmod(col("k"), lit(8L)))
      .withColumn("position",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard_id")).orderBy(col("k"), col("doc_id"))))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("n_tokens"),
        sum(pmod(pmod(col("k"), lit(1L << 30)) * col("position"), lit(1L << 40)))
          .as("order_digest"))
      .orderBy("shard_id").collect()
    assert(base.map(_.toString).toSeq == alt.map(_.toString).toSeq)
  }

  test("shard: sizes are balanced (hash permutation, no hot shard)") {
    val sizes = ShardOps.shuffleShardStats(spark, dir)
      .select("n_docs").collect().map(_.getLong(0))
    assert(sizes.length == 8)
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.max <= mean * 2 && sizes.min >= mean / 2,
      s"unbalanced shards: ${sizes.mkString(",")}")
  }

  // ---- sketch rollup ------------------------------------------------------

  test("sketch rollup: merged daily sketches EXACTLY equal the direct sketch") {
    // HLL union is register-max: sketch(A ∪ B) == union(sketch(A), sketch(B))
    // — not approximately, exactly. This is what makes the per-day sketch
    // table reaggregatable to ANY coarser grain without touching raw data.
    val ev = Tables.read(spark, dir, "events")
    val viaDaily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), allowDifferentLgConfigK = false))
        .as("est"))
    val direct = ev
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 14)).as("est"))
    val l = viaDaily.orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    val r = direct.orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(l.toSeq == r.toSeq)
  }

  test("sketch intersect: all type pairs covered, inclusion-exclusion in bound") {
    val rows = SketchOps.sketchIntersect(spark, dir).collect()
    val types = Tables.read(spark, dir, "events")
      .select("event_type").distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2) // every unordered pair
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), s"out of bound: $r")
      assert(r.getAs[Long]("exact_both") > 0)
    }
  }

  test("sketch rollup: bound holds and rollup really merges >1 day") {
    val rows = SketchOps.sketchRollup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), s"out of bound: $r")
      assert(r.getAs[Long]("days_merged") > 1, s"nothing merged: $r")
    }
  }
}
