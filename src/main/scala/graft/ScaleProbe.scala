package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Empirical scale validation (one-off, results recorded in ROADMAP.md):
  * the 100 TB design claims of the dedup and range-join families argue from
  * plan shape; this main MEASURES the quantities those claims rest on, at
  * 1× and 10× synthetic corpus size:
  *
  *  1. MinHash-LSH candidate-pair count — claim: ∝ collisions (near-linear
  *     for a fixed dup rate), never n². The band-key space is (2³¹)², so
  *     random collisions are negligible at any realistic corpus size.
  *  2. SimHash candidate-pair count at the shipped 32-bit/4×8-bit banding —
  *     expected to go SUPER-LINEAR at 10× (random collisions ≈
  *     4·n²/2·1/256 for uniform fingerprints) — and at the 60-bit/4×15-bit
  *     parameterization, the fix that restores near-linear growth while
  *     keeping the pigeonhole guarantee for Hamming ≤ 3.
  *  3. RangeJoinExec vs BroadcastNestedLoopJoin wall time on 10⁵ intervals
  *     (the BNLJ side is forced with a broadcast hint, which
  *     RangeJoinStrategy deliberately declines).
  *
  * Synthetic data mirrors the real corpus statistics (31-token vocab,
  * 10–99 tokens/doc, 20 sources, ~10% planted near-dups), deterministic
  * seed so reruns reproduce.
  */
object ScaleProbe {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
  private def s1(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", d)

  private def synthDocs(s: SparkSession, n: Int, vocabSize: Int): DataFrame = {
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = (0 until vocabSize).map(i => s"tok$i")
    val rows = new scala.collection.mutable.ArrayBuffer[(Long, String, String)](n)
    var i = 0
    while (i < n) {
      val text =
        if (i % 10 == 9 && rows.nonEmpty) {
          // planted near-dup of the previous doc: swap 2 tokens
          val prev = rows(i - 1)._3.split(' ')
          val mut = prev.clone()
          mut(rnd.nextInt(prev.length)) = vocab(rnd.nextInt(vocab.length))
          mut(rnd.nextInt(prev.length)) = vocab(rnd.nextInt(vocab.length))
          mut.mkString(" ")
        } else {
          val len = 10 + rnd.nextInt(90)
          Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
        }
      rows += ((i.toLong, s"src${i % 20}", text))
      i += 1
    }
    rows.toSeq.toDF("doc_id", "source", "text")
      .repartition(32).localCheckpoint()
  }

  /** Run `body` over a fresh synthetic corpus, then release the
    * localCheckpoint blocks it pinned. `DataFrame.unpersist` cannot do
    * this (the checkpoint lives in the RDD layer, not the relation
    * cache), so the helper diffs the persistent-RDD registry around the
    * build and unpersists exactly what synthDocs created.
    */
  private def withSynthDocs[A](s: SparkSession, n: Int, vocabSize: Int)(
      body: DataFrame => A): A = {
    val before = s.sparkContext.getPersistentRDDs.keySet
    val d = synthDocs(s, n, vocabSize)
    try body(d)
    finally s.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before(id) }
      .values.foreach(_.unpersist(blocking = false))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "graft-scale-probe")
    import spark.implicits._
    // optional: "rangejoin <nIntervals>" runs ONLY the range-join probe at
    // the given interval count (points scale 5×) — the 10⁶ measurement the
    // RangeJoinExec-codegen decision rests on; "sourceprune" runs only the
    // merge source-prune probe (dev iteration on one claim)
    val rangeOnly = args.headOption.contains("rangejoin")
    val srcPruneOnly = args.headOption.contains("sourceprune")
    val streamResetOnly = args.headOption.contains("streamreset")
    val replicatorFoldOnly = args.headOption.contains("replicatorfold")
    val bloomPruneOnly = args.headOption.contains("bloomprune")
    val casOnly = args.headOption.contains("cascontention")
    val nIntervals = if (args.length > 1) args(1).toInt else 100000

    if (casOnly) { probeCasContention(spark); spark.stop(); return }
    if (bloomPruneOnly) { probeBloomPrune(spark); spark.stop(); return }
    if (srcPruneOnly) { probeSourcePrune(spark); spark.stop(); return }
    if (streamResetOnly) { probeStreamReset(spark); spark.stop(); return }
    if (replicatorFoldOnly) {
      probeReplicatorFold(spark); spark.stop(); return }
    if (!rangeOnly) {
      probeDedupCandidates(spark); probeNativeKernels(spark)
      probeSelectionOps(spark); probeMaintenanceOps(spark)
      probeMergeTable(spark); probeSourcePrune(spark)
      probeStreamReset(spark)
      probeReplicatorFold(spark)
      probeChangeFeed(spark)
      probeStatsPruning(spark)
      probeBloomPrune(spark)
      probeCasContention(spark)
      probeSplitLayout(spark)
      probeManifestResolution(spark)
      probeDeletionVectors(spark)
      probeConnectedComponents(spark)
      probeQuantizerRetrain(spark)
    }
    probeRangeJoin(spark, nIntervals)
    spark.stop()
  }

  /** Wall-time growth of the round-7 selection/rewrite ops at 1× and 10×:
    * the token-budget global prefix sum (claim: TeraSort shape — range
    * shuffle of 24-byte stat rows + driver prefix over one row per
    * partition, so wall time ∝ n) and the duplicate-span scrub (claim:
    * one shuffle of the gram stream + linear map-side rewrite). Both
    * materialize via aggregates, nothing driver-collected beyond the
    * probe's own offsets row-per-partition.
    */
  private def probeSelectionOps(spark: SparkSession): Unit = {
    for (n <- Seq(5000, 50000)) withSynthDocs(spark, n, 31) { d =>
      // budget scales with n so the selected fraction stays comparable
      val (kept, tTb) = time(
        graft.ops.CorpusOps.tokenBudgetSelectOf(spark, d, 30L * n).count())
      val (removed, tScrub) = time(
        DedupOps.duplicateSpanScrubOf(d, 10)
          .agg(sum(col("n_removed"))).collect()(0).getLong(0))
      // DSIR (claim: map-side feature hash, B-row histograms, broadcast
      // back — wall ∝ the two scans)
      val dl = d.withColumn("lang",
        when(col("doc_id") % 5 === 0, "en").otherwise("xx"))
      val (nW, tDsir) = time(graft.ops.CorpusOps.dsirWeightsOf(dl).count())
      println(
        s"""{"probe":"selection_ops","n":$n,""" +
          s""""token_budget_kept":$kept,"token_budget_sec":${s1(tTb)},""" +
          s""""span_scrub_removed":$removed,"span_scrub_sec":${s1(tScrub)},""" +
          s""""dsir_docs":$nW,"dsir_sec":${s1(tDsir)}}""")
    }
  }

  /** Wall-time growth of the round-8 maintenance tier at 1× and 10×:
    * shuffle-shard (claim: ONE hash shuffle + per-shard local sort, so
    * ∝ n log(n/shards)), the one-pass profiler in its approx form (claim:
    * single scan, mergeable sketch partials, no Expand), and the exact
    * form (claim: same scan with the ×6 Expand multiplier — the measured
    * gap IS the documented cost of exactness).
    */
  /** The MERGE-cost claim measured: a same-size batch into a 1× and a 10×
    * table must touch the same FILE COUNT (key-range pruning) and cost
    * comparable wall time — O(touched files + batch), never O(table).
    * Files are 500 rows each, the batch hits a 20-key contiguous range,
    * so ≥96 % of the 10× table's files must prune away.
    */
  private def probeMergeTable(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.ops.MergeTable
    for (n <- Seq(20000, 200000)) {
      val t = java.nio.file.Files.createTempDirectory(s"graft-probe-merge$n")
      java.nio.file.Files.delete(t)
      try {
        val base = (0L until n).map(i => (i, i * 0.5)).toDF("event_id", "value")
        MergeTable.mergeUpsert(spark, t.toString, base,
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500)
        val before = MergeTable.latestManifest(t.toString).get.files.map(_.path).toSet
        val batch = (100L until 120L).map(i => (i, 9.9)).toDF("event_id", "value")
        val (_, tMerge) = time(MergeTable.mergeUpsert(spark, t.toString, batch,
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500))
        val after = MergeTable.latestManifest(t.toString).get.files.map(_.path).toSet
        // touched = files this commit replaced (present before, dropped now)
        val touched = before.diff(after).size
        println(
          s"""{"probe":"merge_table","rows":$n,"files_before":${before.size},""" +
            s""""files_touched":$touched,"merge_sec":${s1(tMerge)}}""")
      } finally MergeTable.dropTable(t.toString) // probe tables don't outlive the run
    }
  }

  /** The round-16 paged-reset claim measured: a lagging stream over a
    * vacuumed table at 1× and 10× file counts delivers its FIRST reset
    * slice in O(file budget) wall time — the epoch needs 10× the
    * BATCHES, but each batch stays flat, so a 100 TB reset never hands
    * the consumer (or the driver's planner) one O(table) batch. */
  private def probeStreamReset(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.ops.MergeTable
    import org.apache.spark.sql.streaming.Trigger
    for (n <- Seq(20000L, 200000L)) {
      val t = java.nio.file.Files.createTempDirectory(s"graft-probe-reset$n")
      java.nio.file.Files.delete(t)
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-probe-reset-ck$n")
      try {
        def wave(tag: String, v: Long): Unit = MergeTable.mergeUpsert(
          spark, t.toString,
          (0L until n).map(i => (i, tag, i * 0.5))
            .toDF("event_id", "event_type", "value"),
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500,
          txn = Some(("w", v)))
        wave("a", 0L) // v0: n/500 files
        // consume v0 (unpaced — setup, not the measurement)
        var rows = 0L
        def runOnce(maxFiles: String): Long = {
          var got = 0L
          val q = spark.readStream.format("graft")
            .option("maxFilesPerTrigger", maxFiles).load(t.toString)
            .writeStream.option("checkpointLocation", ckpt.toString)
            .trigger(Trigger.Once())
            .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
              { got = b.count(); () })
            .start()
          q.awaitTermination(); got
        }
        runOnce(maxFiles = (n / 500 + 1).toString)
        // the replica lags: a full rewrite, then vacuum → reset epoch
        wave("b", 1L)
        assert(MergeTable.vacuum(t.toString, graceMs = 0L,
          retainVersions = 1) > 0)
        // the measurement: ONE trigger of the paged reset at 8 files
        val (sliceRows, tSlice) = time(runOnce("8"))
        println(
          s"""{"probe":"stream_reset_page","rows":$n,""" +
            s""""table_files":${n / 500},"first_slice_rows":$sliceRows,""" +
            s""""first_slice_sec":${s1(tSlice)}}""")
      } finally {
        MergeTable.dropTable(t.toString)
        deleteRecursively(ckpt)
      }
    }
  }

  /** Replicator commit amplification (round 17): a replica draining an
    * N-version lag used to pay ~2 transactional commits per source
    * VERSION; the LWW fold makes it ~2 per MICRO-BATCH. Measured at a
    * 10× lag spread — the claim is the replica's commit count stays
    * FLAT (it tracks micro-batches, which the source's pacing budgets
    * bound) while the per-version form would grow 10×. */
  private def probeReplicatorFold(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.ops.MergeTable
    import graft.streaming.GraftReplicator
    for (lag <- Seq(10, 100)) {
      val src = java.nio.file.Files.createTempDirectory(s"graft-probe-rf$lag")
      val dst = java.nio.file.Files.createTempDirectory(s"graft-probe-rfd$lag")
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-probe-rfc$lag")
      java.nio.file.Files.delete(src); java.nio.file.Files.delete(dst)
      try {
        MergeTable.mergeUpsert(spark, src.toString,
          (0L until 5000L).map(i => (i, "seed", i * 1.0))
            .toDF("event_id", "event_type", "value"),
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 1000,
          txn = Some(("w", 0L)))
        def drain(): Unit = {
          val q = GraftReplicator.replicate(spark, src.toString,
            dst.toString, ckpt.toString,
            Map("maxVersionsPerTrigger" -> "1000"))
          try q.processAllAvailable() finally q.stop()
        }
        drain() // boot
        val booted = MergeTable.history(dst.toString).size
        (1 to lag).foreach { v =>
          MergeTable.mergeUpsert(spark, src.toString,
            Seq(((v % 5000).toLong, s"u$v", v * 1.0))
              .toDF("event_id", "event_type", "value"),
            Seq("event_id"), Seq("event_id"), txn = Some(("w", v.toLong)))
        }
        val (_, sec) = time(drain())
        val commits = MergeTable.history(dst.toString).size - booted
        println(
          s"""{"probe":"replicator_fold","lag_versions":$lag,""" +
            s""""replica_commits":$commits,"drain_sec":${s1(sec)}}""")
      } finally {
        MergeTable.dropTable(src.toString)
        MergeTable.dropTable(dst.toString)
        deleteRecursively(ckpt)
      }
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try {
        val it = s.iterator(); while (it.hasNext) deleteRecursively(it.next())
      } finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  /** MERGE source-side pushdown measured (round 15): a matched-only
    * merge over a source 1× and 10× the table size, where only a narrow
    * key band overlaps the table — the claim is that join work tracks
    * the TOUCHED KEY RANGE, not the source: the box prune keeps exactly
    * the overlapping rows (row-exact count printed), and the merge's
    * wall time stays near-flat across the 10× source growth because the
    * dropped rows never reach the full-outer join. */
  private def probeSourcePrune(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.ops.MergeTable
    // the probe measures the AT-SCALE posture: zero the small-source
    // gate (a real merge source at 100 TB is far above the broadcast
    // threshold; the 200k-row fixture is not, and would otherwise
    // legitimately skip the prune it is here to measure)
    spark.conf.set("spark.graft.merge.sourcePrune.minBytes", "0")
    try for (n <- Seq(20000, 200000)) {
      val t = java.nio.file.Files.createTempDirectory(s"graft-probe-srcprune$n")
      java.nio.file.Files.delete(t)
      try {
        val base = (0L until 20000L).map(i => (i, i * 0.5))
          .toDF("event_id", "value")
        MergeTable.mergeUpsert(spark, t.toString, base,
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500)
        // source of n rows, only 20 of which land inside the table's keys
        val src = ((100L until 120L) ++ (1000000L until (1000000L + n - 20)))
          .map(i => (i, 9.9)).toDF("event_id", "value")
        val m = MergeTable.latestManifest(t.toString).get
        val (kept, tPrune) = time(MergeTable.pruneSourceToBoxes(
          spark, src, m.files, Seq("event_id"), Map.empty).count())
        val (_, tMerge) = time(MergeTable.merge(spark, t.toString, src,
          Seq("event_id"), Seq("event_id"),
          matched = Seq(MergeTable.MergeClause(None,
            MergeTable.UpdateSet(Map.empty)))))
        println(
          s"""{"probe":"merge_source_prune","source_rows":$n,""" +
            s""""rows_after_prune":$kept,"prune_sec":${s1(tPrune)},""" +
            s""""matched_only_merge_sec":${s1(tMerge)}}""")
      } finally MergeTable.dropTable(t.toString)
    } finally spark.conf.unset("spark.graft.merge.sourcePrune.minBytes")
  }

  /** Generalized file-skipping measured (round 12): at 1× and 10× file
    * counts, a NON-cluster-column range predicate through the DSv2 scan
    * must read only the stats-overlapping file subset — the kept
    * FRACTION stays ~constant (the predicate's selectivity), so files
    * read grow with the data while files SKIPPED do too; and the
    * driver-side prune itself stays O(files) metadata arithmetic,
    * milliseconds at 10⁴ entries. */
  private def probeStatsPruning(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.ops.{MergeTable, StatsPruning}
    for (n <- Seq(20000, 200000)) {
      val t = java.nio.file.Files.createTempDirectory(s"graft-probe-stats$n")
      java.nio.file.Files.delete(t)
      try {
        // value correlates with the cluster key (the realistic shape:
        // time-ordered ingest → most columns correlate with ingest order)
        val base = (0L until n).map(i => (i, i * 0.5)).toDF("event_id", "value")
        MergeTable.mergeUpsert(spark, t.toString, base,
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500)
        val m = MergeTable.latestManifest(t.toString).get
        // ~10%-selective band predicate on the NON-cluster column
        val lo = n * 0.45 * 0.5; val hi = n * 0.55 * 0.5
        val band = Seq(org.apache.spark.sql.sources.And(
          org.apache.spark.sql.sources.GreaterThanOrEqual("value", lo),
          org.apache.spark.sql.sources.LessThan("value", hi)))
        val (kept, tPrune) = time(StatsPruning.prune(m.files, band))
        graft.sources.GraftScanAudit.reset()
        val cnt = spark.read.format("graft").load(t.toString)
          .where(col("value") >= lo && col("value") < hi).count()
        val audit = graft.sources.GraftScanAudit.last.get
        println(
          s"""{"probe":"stats_pruning","rows":$n,"files_total":${m.files.size},""" +
            s""""files_kept":${kept.size},"scan_files":${audit.scannedFiles},""" +
            s""""rows_matched":$cnt,"prune_sec":${s1(tPrune)}}""")
      } finally MergeTable.dropTable(t.toString)
    }
  }

  /** CONCURRENT-WRITER throughput under the hard-link CAS, measured at
    * N = 2 / 8 / 16 sustained writers against ONE table — the
    * transactional claim that was spec-proven (races are correct) but
    * never had a measured row. Each writer commits `commitsEach`
    * batches; EVEN writers hit disjoint key slabs (the fast-path
    * conflict-scoped re-commit shape: same files revalidate at the new
    * head, zero recompute), ODD writers straddle two slabs (real
    * overlap → full merge replay). Reported: wall, commits/sec, and the
    * outcome counters — retry amplification is
    * (slow+fast+losses)/commits, the number a pathological livelock
    * would blow up. */
  private def probeCasContention(spark: SparkSession): Unit = {
    import graft.ops.MergeTable
    for (writers <- Seq(2, 8, 16)) {
      val t = java.nio.file.Files.createTempDirectory(s"graft-probe-cas$writers")
      java.nio.file.Files.delete(t)
      try {
        import spark.implicits._
        val slab = 1000L
        val base = (0L until writers * slab)
          .map(i => (i, 0.0)).toDF("event_id", "value")
        MergeTable.mergeUpsert(spark, t.toString, base,
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500)
        MergeTable.casStats.reset()
        val commitsEach = 6
        val failures = new java.util.concurrent.atomic.AtomicInteger
        val t0 = System.nanoTime()
        val threads = (0 until writers).map { w =>
          new Thread(() => {
            try {
              var m = 0
              while (m < commitsEach) {
                // EVEN writers own their slab (disjoint from everyone);
                // ODD writers write the SAME 200-key window as their
                // even neighbor — guaranteed box overlap → full replay
                val lo = if (w % 2 == 0) w * slab else (w - 1) * slab
                val batch = spark.range(lo, lo + 200)
                  .select(col("id").as("event_id"),
                    (col("id") * 0.5 + lit(m)).as("value"))
                MergeTable.mergeUpsert(spark, t.toString, batch,
                  Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500,
                  txn = Some((s"w$w", m.toLong)), maxAttempts = 200)
                m += 1
              }
            } catch { case _: Throwable => failures.incrementAndGet(); () }
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        val wall = (System.nanoTime() - t0) / 1e9
        val st = MergeTable.casStats.snapshot()
        val commits = writers * commitsEach
        val attempts = st("slow_wins") + st("fast_wins") + st("cas_losses")
        println(
          s"""{"probe":"cas_contention","writers":$writers,""" +
            s""""commits":$commits,"failures":${failures.get},""" +
            s""""wall_sec":${s1(wall)},""" +
            s""""commits_per_sec":${s1(commits / wall)},""" +
            s""""fast_wins":${st("fast_wins")},""" +
            s""""cas_losses":${st("cas_losses")},""" +
            s""""full_replays":${st("full_replays")},""" +
            s""""retry_amplification":${s1(attempts.toDouble / commits)}}""")
      } finally MergeTable.dropTable(t.toString)
    }
  }

  /** The BLOOM POINT INDEX claim measured at 1× and 10× file counts: an
    * equality probe on a column UNCORRELATED with the clustering (the
    * shape min/max boxes cannot refute — every file's box spans the
    * probe value) must open a FLAT number of files as the table grows
    * 10×: the true-positive file plus an fpp-bounded handful of maybes,
    * not the O(files) the box prune degrades to. Also records the
    * driver consult cost (one memoized metadata-scale parquet read per
    * commit dataset). */
  private def probeBloomPrune(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.ops.MergeTable
    for (n <- Seq(20000, 200000)) {
      val t = java.nio.file.Files.createTempDirectory(s"graft-probe-bloom$n")
      java.nio.file.Files.delete(t)
      val prior = spark.conf.getOption("spark.graft.stats.bloomCols")
      spark.conf.set("spark.graft.stats.bloomCols", "event_id")
      try {
        // cluster on a coarse group; event_id then scatters across the
        // full range INSIDE every file (the box-ambiguous layout)
        val base = (0L until n).map(i => (i % 256, i, i * 0.5))
          .toDF("g", "event_id", "value")
        MergeTable.mergeUpsert(spark, t.toString, base,
          Seq("g", "event_id"), Seq("g"), targetRowsPerFile = 500)
        val m = MergeTable.latestManifest(t.toString).get
        graft.ops.BloomIndex.resetLoadedForTest()
        graft.sources.GraftScanAudit.reset()
        val probeKey = n / 2L
        val (cnt, tCold) = time(spark.read.format("graft").load(t.toString)
          .where(col("event_id") === probeKey).count())
        val cold = graft.sources.GraftScanAudit.last.get
        // second probe: the consult must be served from the memo
        graft.sources.GraftScanAudit.reset()
        val (_, tWarm) = time(spark.read.format("graft").load(t.toString)
          .where(col("event_id") === probeKey + 1L).count())
        val warm = graft.sources.GraftScanAudit.last.get
        println(
          s"""{"probe":"bloom_prune","rows":$n,"files_total":${m.files.size},""" +
            s""""files_opened_cold":${cold.scannedFiles},""" +
            s""""files_opened_warm":${warm.scannedFiles},""" +
            s""""rows_matched":$cnt,"lookup_cold_sec":${s1(tCold)},""" +
            s""""lookup_warm_sec":${s1(tWarm)}}""")
      } finally {
        prior match {
          case Some(p) => spark.conf.set("spark.graft.stats.bloomCols", p)
          case None => spark.conf.unset("spark.graft.stats.bloomCols")
        }
        MergeTable.dropTable(t.toString)
      }
    }
  }

  /** The identity-split claims measured at 1× and 10×: (a) after
    * `OPTIMIZE SPLIT BY g`, a `GROUP BY g` aggregate answers from the
    * manifest with ZERO files scanned and near-flat wall time (driver
    * metadata fold — it must not scale with rows); (b) INCREMENTAL
    * maintenance — an interleaved insert wave drifts the layout by one
    * file, and the re-optimize rewrites exactly that file, not the
    * table (O(drifted files), the point of the incremental candidate
    * filter). */
  private def probeSplitLayout(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.ops.MergeTable
    for (n <- Seq(20000, 200000)) {
      val t = java.nio.file.Files.createTempDirectory(s"graft-probe-split$n")
      java.nio.file.Files.delete(t)
      try {
        val base = (0L until n).map(i => (i, i % 8, i * 0.5))
          .toDF("event_id", "g", "value")
        MergeTable.mergeUpsert(spark, t.toString, base,
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500)
        val (rewrote, tSplit) = time(MergeTable.optimize(spark, t.toString,
          targetRowsPerFile = 500, splitBy = Seq("g")))
        val filesTotal = MergeTable.latestManifest(t.toString).get.files.size
        graft.sources.GraftScanAudit.reset()
        val (groups, tAgg) = time(spark.read.format("graft").load(t.toString)
          .groupBy(col("g")).count().collect().length)
        val scanned = graft.sources.GraftScanAudit.last.get.scannedFiles
        // drift by one interleaved insert wave, re-optimize incrementally
        MergeTable.mergeUpsert(spark, t.toString,
          (n.toLong until n + 64L).map(i => (i, i % 8, 1.0))
            .toDF("event_id", "g", "value"),
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500)
        val (incr, tIncr) = time(MergeTable.optimize(spark, t.toString,
          targetRowsPerFile = 500, splitBy = Seq("g")))
        println(
          s"""{"probe":"split_layout","rows":$n,"files_total":$filesTotal,""" +
            s""""rewrote":$rewrote,"split_sec":${s1(tSplit)},""" +
            s""""groups":$groups,"agg_scan_files":$scanned,""" +
            s""""agg_sec":${s1(tAgg)},""" +
            s""""incr_rewrote":$incr,"incr_sec":${s1(tIncr)}}""")
      } finally MergeTable.dropTable(t.toString)
    }
  }

  /** The file-scoped CDF claim measured: after a 20-key commit into a 1×
    * and a 10× table, `changesBetween(v, v+1)` must SCAN the same file
    * count and cost comparable wall time — O(changed files + changes),
    * never O(table). A full-snapshot diff would scan every file of both
    * versions and its cost would grow 10× here.
    */
  private def probeChangeFeed(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.ops.MergeTable
    for (n <- Seq(20000, 200000)) {
      val t = java.nio.file.Files.createTempDirectory(s"graft-probe-cdf$n")
      java.nio.file.Files.delete(t)
      try {
        val base = (0L until n).map(i => (i, i * 0.5)).toDF("event_id", "value")
        MergeTable.mergeUpsert(spark, t.toString, base,
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500)
        val batch = (100L until 120L).map(i => (i, 9.9)).toDF("event_id", "value")
        MergeTable.mergeUpsert(spark, t.toString, batch,
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500)
        val filesTotal = MergeTable.latestManifest(t.toString).get.files.size
        val (changes, tDiff) = time(
          MergeTable.changesBetween(spark, t.toString, 0L, 1L).count())
        val scanned = MergeTable.changesBetween(spark, t.toString, 0L, 1L)
          .inputFiles.length
        println(
          s"""{"probe":"change_feed","rows":$n,"files_total":$filesTotal,""" +
            s""""files_scanned":$scanned,"changes":$changes,""" +
            s""""diff_sec":${s1(tDiff)}}""")
      } finally MergeTable.dropTable(t.toString)
    }
  }

  /** The deletion-vector claim measured: a SCATTERED purge (one key per
    * region of the key space — the GDPR shape) committed merge-on-read
    * writes O(purge list) bytes (the position dataset), while the
    * copy-on-write form rewrites every touched data file in full. Table
    * size scales 10×; the DV commit's bytes stay flat near the list
    * size, the rewrite's bytes scale with the touched files' contents.
    */
  /** The retrain→serving CLOSED LOOP measured beyond the unit fixture:
    * an 8-cell IVF quantizer over a 16 k-vector base, a 4 k-vector
    * drifted window that a naive incremental ingest mis-buckets, and
    * nprobe=1 recall@1 through the ASSIGNMENTS TABLE (the serving path)
    * at three points — healthy-region queries pre-drift (the bound),
    * drift-region queries before retrain (the failure the monitor
    * flags), and the same queries after [[graft.ops.SimilarityOps
    * .quantizerRetrain]] re-fits the stale cells and transactionally
    * re-encodes. Claim: post-retrain recall recovers to ≥ the pre-drift
    * bound; enforced with a require fail-stop, not just reported. */
  private[graft] def probeQuantizerRetrain(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    import graft.ops.{MergeTable, SimilarityOps}
    val dim = 10
    val cellsK = 8
    def unit(j: Int, scale: Double = 1.0): Array[Double] = {
      val a = new Array[Double](dim); a(j) = scale; a
    }
    def vecs(rows: Seq[(Long, Array[Double])]): DataFrame =
      rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "vec")
        .select(col("vec_id"), col("vec").cast("array<double>").as("vec"))
    // base: 2k members per trained cell, tiny in-cell spread on dim 8
    val base = vecs((0L until 16000L).map { i =>
      val v = unit((i % 8).toInt); v(8) = 0.001 * (i % 13); i -> v
    })
    // drift: interleaved two-lump ridge on (e8, e9) — even arrivals tilt
    // to cell 0 at e9 = 0.2j, odd to cell 1 at the midpoints 0.2j + 0.1;
    // the tilt decides the OLD cell, e9 decides true nearness. The ridge
    // is kept COMPACT (e9 ≤ 2.3): cosine is an ANGULAR metric, and past
    // e9 ≈ 5 the along-ridge angular gap of a 0.1 offset (∝ 1/e9⁴ in
    // cos penalty) drops below the fixed-tilt mismatch (∝ 1/e9²), at
    // which point the same-tilt neighbor at ±0.1 becomes the true NN
    // and the planted drift stops mis-routing queries at all
    def lump(tilt: Int, e9: Double): Array[Double] = {
      val v = new Array[Double](dim); v(tilt) = 0.02; v(8) = 1.0; v(9) = e9; v
    }
    val arrivals = vecs((0L until 4000L).map { i =>
      val j = (i / 2) % 12
      (100000L + i) -> lump((i % 2).toInt, 0.2 * j + (if (i % 2 == 1) 0.1 else 0.0))
    })
    val cents = vecs((0L until cellsK.toLong).map(j => j -> unit(j.toInt)))
      .select(col("vec_id").as("cid"), col("vec").as("c_vec"))

    def assign(e: DataFrame, c: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("cos").desc, col("cid"))
      e.crossJoin(broadcast(c))
        .withColumn("cos", expr("cosine_sim(vec, c_vec)"))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("vec_id"), col("cid"), lit(0L).as("resid_bp"))
    }
    /** nprobe=1 recall@1 through the assignments table. */
    def recall(table: String, c: DataFrame, corpus: DataFrame,
        queries: DataFrame): Double = {
      val member = corpus.join(
        MergeTable.read(spark, table).select("vec_id", "cid"), "vec_id")
      val q = queries.select(col("vec_id").as("qid"), col("vec").as("q_vec"))
      def top1(cand: DataFrame, by: Seq[String]) = cand
        .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
          .Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .where(col("rn") === 1).select(by.map(col): _*)
      val bf = top1(q.crossJoin(corpus)
        .withColumn("cos", expr("cosine_sim(q_vec, vec)")),
        Seq("qid", "vec_id")).withColumnRenamed("vec_id", "true_nn")
      val probe = top1(q.crossJoin(broadcast(c))
        .withColumn("cos", expr("cosine_sim(q_vec, c_vec)"))
        .withColumn("vec_id", col("cid")), Seq("qid", "cid"))
        .withColumnRenamed("cid", "probe_cell")
      bf.join(probe, "qid")
        .join(member.select(col("vec_id").as("true_nn"), col("cid")), "true_nn")
        .agg(avg((col("cid") === col("probe_cell")).cast("double")))
        .as[Double].head()
    }

    val t = java.nio.file.Files.createTempDirectory("graft-probe-retrain")
    java.nio.file.Files.delete(t)
    try {
      MergeTable.mergeUpsert(spark, t.toString, assign(base, cents),
        Seq("vec_id"), Seq("vec_id"), txn = Some(("ingest", 0L)))
      // pre-drift bound: healthy-region queries against the healthy index
      val healthyQ = vecs((0L until 100L).map { i =>
        val v = unit((i % 8).toInt); v(8) = 0.0005 + 0.001 * (i % 7)
        (500000L + i) -> v
      })
      val bound = recall(t.toString, cents, base, healthyQ)
      // naive incremental ingest of the drifted window (old centroids)
      MergeTable.mergeUpsert(spark, t.toString, assign(arrivals, cents),
        Seq("vec_id"), Seq("vec_id"), txn = Some(("ingest", 1L)))
      val corpus = base.unionByName(arrivals)
      // drift-region queries: tilt-0 placed AT tilt-1 members' e9 coords
      // and vice versa — the probed cell and the true NN's cell diverge
      val driftQ = vecs((0L until 100L).map { i =>
        val j = 3 * i + 1
        (600000L + i) -> lump((i % 2).toInt,
          0.2 * (j % 12) + (if (i % 2 == 0) 0.1 else 0.0))
      })
      val recallBroken = recall(t.toString, cents, corpus, driftQ)
      val (r, tRetrain) = time(SimilarityOps.quantizerRetrain(
        spark, t.toString, base, arrivals, cents, txn = Some(("retrain", 2L))))
      require(r.committed && r.staleCells.nonEmpty,
        s"probe drift must trip the monitor (stale=${r.staleCells})")
      val recallHealed = recall(t.toString, r.centroids, corpus, driftQ)
      println(
        s"""{"probe":"quantizer_retrain","n_base":16000,"n_arrivals":4000,""" +
          s""""stale_cells":${r.staleCells.size},""" +
          s""""recall_pre_drift":$bound,"recall_drifted":$recallBroken,""" +
          s""""recall_post_retrain":$recallHealed,""" +
          s""""retrain_sec":${s1(tRetrain)}}""")
      require(recallHealed >= bound - 0.02,
        s"retrain must restore recall to the pre-drift bound: " +
          s"$recallHealed < $bound")
      require(recallBroken < bound - 0.3,
        s"the planted drift must actually break nprobe=1 recall, " +
          s"got $recallBroken vs bound $bound")
    } finally MergeTable.dropTable(t.toString)
  }

  private def probeDeletionVectors(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.ops.MergeTable
    def dirBytes(p: java.nio.file.Path): Long =
      if (!java.nio.file.Files.isDirectory(p)) 0L
      else {
        val st = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(f => try java.nio.file.Files.size(f) catch { case _: Exception => 0L })
            .sum
        } finally st.close()
      }
    for (n <- Seq(20000, 200000)) {
      def build(tag: String): String = {
        val t = java.nio.file.Files.createTempDirectory(s"graft-probe-dv$tag$n")
        java.nio.file.Files.delete(t)
        MergeTable.mergeUpsert(spark, t.toString,
          (0L until n).map(i => (i, i * 0.5)).toDF("event_id", "value"),
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 500)
        t.toString
      }
      val purge = (0 until 20).map(i => i.toLong * (n / 20) + 7).toDF("event_id")
      val tDvTable = build("mor"); val tRwTable = build("cow")
      try {
        val files = MergeTable.latestManifest(tDvTable).get.files.size
        val rwBytesBefore = dirBytes(java.nio.file.Paths.get(tRwTable, "data"))
        val (nDv, tDv) = time(MergeTable.mergeDelete(spark, tDvTable, purge,
          deletionVectors = true))
        val (nRw, tRw) = time(MergeTable.mergeDelete(spark, tRwTable, purge))
        val dvBytes = dirBytes(java.nio.file.Paths.get(tDvTable, "dv"))
        val rwBytes =
          dirBytes(java.nio.file.Paths.get(tRwTable, "data")) - rwBytesBefore
        println(
          s"""{"probe":"deletion_vectors","rows":$n,"files":$files,""" +
            s""""deleted":$nDv,"dv_commit_bytes":$dvBytes,""" +
            s""""rewrite_commit_bytes":$rwBytes,"dv_sec":${s1(tDv)},""" +
            s""""rewrite_sec":${s1(tRw)},"rewrite_deleted":$nRw}""")
      } finally {
        MergeTable.dropTable(tDvTable); MergeTable.dropTable(tRwTable)
      }
    }
  }

  /** The manifest-resolution claim measured: STEADY-STATE snapshot
    * resolution of a moving head is a forward fold of just the new delta
    * records over the in-process cached listing — wall time flat in table
    * FILE COUNT (file count scales 10× here; only the cold walk, paid
    * once per process, scales with it via the streamed checkpoint read).
    * Commits land after the cold resolve so the measured resolution has
    * real work (one new delta) and cannot be a pure cache hit.
    */
  private def probeManifestResolution(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.ops.MergeTable
    for (n <- Seq(20000, 200000)) {
      val t = java.nio.file.Files.createTempDirectory(s"graft-probe-mres$n")
      java.nio.file.Files.delete(t)
      try {
        val base = (0L until n).map(i => (i, i * 0.5)).toDF("event_id", "value")
        MergeTable.mergeUpsert(spark, t.toString, base,
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 200)
        val files = MergeTable.latestManifest(t.toString).get.files.size
        // cold: fresh-process behavior (cache evicted) — scales with files
        MergeTable.evictCachedManifest(t.toString)
        val (_, tCold) = time(MergeTable.latestManifest(t.toString).get)
        // steady: a reader whose cache lags one commit behind the head —
        // resolution is a forward fold of exactly ONE delta record over
        // the cached listing (the committer seeds its own cache, so the
        // lag is staged by re-seeding at v0 after the commit)
        val batch = (10L until 30L).map(i => (i, 9.9)).toDF("event_id", "value")
        MergeTable.mergeUpsert(spark, t.toString, batch,
          Seq("event_id"), Seq("event_id"), targetRowsPerFile = 200)
        MergeTable.evictCachedManifest(t.toString)
        MergeTable.manifestAt(t.toString, 0L) // seed the lagging base
        val (m2, tSteady) = time(MergeTable.latestManifest(t.toString).get)
        println(
          s"""{"probe":"manifest_resolution","rows":$n,"files":$files,""" +
            s""""cold_sec":${s1(tCold)},"steady_sec":${s1(tSteady)},""" +
            s""""head":${m2.version}}""")
      } finally MergeTable.dropTable(t.toString)
    }
  }

  /** The fixpoint connected-components convergence claim measured: with
    * path halving the round count tracks log₂(diameter), independent of
    * edge count. Edges scale 10× AND the planted path's diameter scales
    * 10× (63 → 639); rounds must grow by ~log₂(10) ≈ 3, not 10×, and
    * wall time ∝ edges × rounds. A plain propagation would need
    * diameter-many rounds and hit the 48-round fail-stop at 10×.
    */
  private def probeConnectedComponents(spark: SparkSession): Unit = {
    import spark.implicits._
    for ((nEdges, chainLen) <- Seq((20000, 64), (200000, 640))) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      // filler: disjoint 2-cliques far from the chain's id range, so the
      // edge set scales 10× while the path alone sets convergence depth
      val filler = (0L until nEdges.toLong)
        .map(i => (1000000L + 2 * i, 1000001L + 2 * i))
      val chain = (1L until chainLen.toLong).map(i => (i, i + 1))
      val pairs = (filler ++ chain).toDF("doc_a", "doc_b")
        .repartition(32).localCheckpoint()
      try {
        val ((labels, rounds), tCc) =
          time(DedupOps.connectedComponentsWithRounds(pairs))
        val chainClusters = labels.where(col("doc") <= chainLen)
          .select(col("cluster")).distinct().count()
        require(chainClusters == 1L,
          s"planted $chainLen-node chain split into $chainClusters clusters")
        println(
          s"""{"probe":"connected_components","edges":${nEdges + chainLen - 1},""" +
            s""""chain_diameter":${chainLen - 1},"rounds":$rounds,""" +
            s""""cc_sec":${s1(tCc)}}""")
      } finally spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
  }

  private def probeMaintenanceOps(spark: SparkSession): Unit = {
    for (n <- Seq(5000, 50000)) withSynthDocs(spark, n, 31) { d0 =>
      val d = d0.withColumn("lang", lit("en"))
      val (_, tShard) = time(
        graft.ops.ShardOps.shuffleShardStatsOf(d, 8, 42).collect())
      val (_, tProfA) = time(
        graft.ops.SketchOps.profileTableOf(d, exact = false).collect())
      val (_, tProfE) = time(
        graft.ops.SketchOps.profileTableOf(d, exact = true).collect())
      println(
        s"""{"probe":"maintenance_ops","n":$n,""" +
          s""""shard_sec":${s1(tShard)},"profile_approx_sec":${s1(tProfA)},""" +
          s""""profile_exact_sec":${s1(tProfE)}}""")
    }
  }

  /** Wall time of the compiled per-row text kernels at 1× and 10× corpus —
    * the claim is map-side linearity (zero exchanges, so throughput is the
    * only scale question). Each timing materializes via a count over the
    * kernel output so nothing is driver-collected.
    */
  private def probeNativeKernels(spark: SparkSession): Unit = {
    import graft.functions.SimhashExpressions._
    for (n <- Seq(5000, 50000)) withSynthDocs(spark, n, 31) { docs =>
      val d = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      // bit_count keeps the ANSI sum far from Long overflow while still
      // consuming every row's kernel output
      val (_, tSim) = time(
        d.select(simhash_row(col("toks"), 60).as("fp"))
          .agg(sum(expr("bit_count(fp)"))).collect())
      val (_, tFpr) = time(
        d.select(fingerprint_row(col("toks"), 5).as("fp"))
          .agg(sum(expr("bit_count(fp.fingerprint)"))).collect())
      val (_, tGrm) = time(
        d.select(explode(gram_hash60s(col("toks"), 5)).as("h"))
          .agg(count(lit(1))).collect())
      println(
        s"""{"probe":"native_kernels","n":$n,""" +
          s""""simhash_row_sec":${s1(tSim)},"fingerprint_row_sec":${s1(tFpr)},""" +
          s""""gram_hash60s_sec":${s1(tGrm)}}""")
    }
  }

  private def probeDedupCandidates(spark: SparkSession): Unit = {
    // ---- candidate growth: 1× vs 10× corpus, corpus-like vs realistic
    // vocabulary (the 31-token vocab gives RANDOM doc pairs a background
    // bigram-Jaccard ≈0.03, which band-collides; a realistic vocabulary
    // drives background Jaccard → 0 and candidates → ∝ planted dups)
    for ((n, vocab) <- Seq((5000, 31), (50000, 31), (5000, 10000), (50000, 10000)))
        withSynthDocs(spark, n, vocab) { d =>
      val (mh, tMh) = time(DedupOps.minhashCandidatePairs(d).count())
      val (sh8, tSh8) = time(DedupOps.simhashCandidatePairs(d, 32, 8).count())
      val (sh15, tSh15) = time(DedupOps.simhashCandidatePairs(d, 60, 15).count())
      // bandBits 30 (2 bands of the 60-bit lane — the per-lane banding the
      // 128-bit two-lane op uses): does n²/2^bandBits hold past 15?
      val (sh30, tSh30) = time(DedupOps.simhashCandidatePairs(d, 60, 30).count())
      println(
        s"""{"probe":"dedup_candidates","n":$n,"vocab":$vocab,""" +
          s""""minhash_pairs":$mh,"minhash_sec":${s1(tMh)},""" +
          s""""simhash32_8_pairs":$sh8,"simhash32_8_sec":${s1(tSh8)},""" +
          s""""simhash60_15_pairs":$sh15,"simhash60_15_sec":${s1(tSh15)},""" +
          s""""simhash60_30_pairs":$sh30,"simhash60_30_sec":${s1(tSh30)}}""")
    }
  }

  /** RangeJoinExec vs BNLJ at `n` intervals × 5n points. The key domain
    * scales with n so interval density (matches/point) stays constant —
    * a fixed domain would make the BNLJ comparison quadratic in n for
    * the wrong reason.
    */
  private def probeRangeJoin(spark: SparkSession, n: Int): Unit = {
    val domain = n * 10L
    val ivs = spark.range(n).select(
      col("id").as("w"),
      (col("id") * 37 % domain).as("lo"),
      (col("id") * 37 % domain + col("id") % 97 + 1).as("hi"))
      .localCheckpoint()
    val pts = spark.range(5L * n).select(
      col("id").as("p_id"), (col("id") * 7919 % domain).as("p"))
      .localCheckpoint()
    val cond = col("p") >= col("lo") && col("p") <= col("hi")
    val (nRj, tRj) = time(pts.join(ivs, cond).count())
    // broadcast hint → RangeJoinStrategy declines → BroadcastNestedLoopJoin.
    // Past 10⁶ intervals the BNLJ side is ~5·10¹² comparisons — skip it and
    // report the range-join time alone (the comparison is settled at 10⁵).
    val runBnlj = n <= 200000
    val tBn =
      if (runBnlj) {
        val bnlj = pts.join(ivs.hint("broadcast"), cond)
        val bnljPlan = bnlj.queryExecution.executedPlan.toString
        require(bnljPlan.contains("BroadcastNestedLoop"), bnljPlan.take(400))
        val (nBn, t) = time(bnlj.count())
        require(nRj == nBn, s"result mismatch: $nRj vs $nBn")
        t
      } else -1.0
    val rjPlan = pts.join(ivs, cond).queryExecution.executedPlan.toString
    require(rjPlan.contains("RangeJoin"), rjPlan.take(400))
    println(
      s"""{"probe":"range_join","intervals":$n,"points":${5L * n},"matches":$nRj,""" +
        s""""range_join_sec":${s1(tRj)},"bnlj_sec":${s1(tBn)}}""")
  }
}
