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
  * runs 3 times and reports the MEDIAN: the first execution of a heavy
  * codegen plan can pay a one-off JIT stall, and the host shows
  * multi-second single-core throughput dips (measured with a fixed md5
  * loop — see ROADMAP.md); the median discards one outlier in either
  * direction without the optimism of best-of-N.
  *
  * The full result — total, per-query medians AND every raw sample — is
  * also written to target/bench.json so the run is self-evidencing even
  * when stdout is truncated by the harness.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
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

    // warmup: the flagship query end-to-end, result discarded
    try runOnce("q_classifier") catch { case _: Throwable => () }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    val results = SparkEntry.queries.keys.toSeq.sorted.map { n =>
      val samples = Seq.fill(3)(runOnce(n))
      val ok = samples.filter(_ >= 0)
      (n, median(ok), samples)
    }
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.4f", d)
    val qs = results.map { case (k, med, _) => "\"" + k + "\":" + fmt(med) }
      .mkString("{", ",", "}")
    val samplesJson = results.map { case (k, _, ss) =>
      "\"" + k + "\":[" + ss.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // durable copy first (stdout can be truncated by the harness); the file
    // additionally carries every raw sample so noise is diagnosable.
    val durable =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"samples":$samplesJson,"n_samples":3,"stat":"median","sf":"$sfDir"}"""
    val out = Paths.get("target", "bench.json")
    Files.createDirectories(out.getParent)
    Files.write(out, (durable + "\n").getBytes(StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
