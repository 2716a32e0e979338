package graft

/** Dev tool: time a subset of registered queries (args = substring filters;
  * no args = everything) on SPARK_GRAFT_SF_DIR. Same noop-write
  * materialization as [[Bench]], prints per-sample times so warm-up and
  * memo effects stay visible. Not part of the driver contract.
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.local(32, "graft-quickbench")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.exists(n.contains))
    names.foreach { n =>
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s ${samples.map(t => f"$t%7.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
