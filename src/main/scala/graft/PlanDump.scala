package graft

import java.nio.file.{Files, Paths}

/** Dev tool (optimization rounds): write `.explain("formatted")` of named
  * queries to plans/<tag>/<query>_<suffix>.txt — the before/after plan
  * evidence the optimization round commits. Also prints a one-line summary
  * (exchange count, join strategies, pushdown) per query.
  *
  * Run: sbt "runMain graft.PlanDump r18 before q_cdf_tvf q_cdf_net ..."
  * (no query names = every registered query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <suffix> [query ...]")
    val tag = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    val spark = GraftSession.local(32, "graft-plan-dump")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // run it so the AQE-final plan (the one the bench pays for) exists
        df.write.mode("overwrite").format("noop").save()
        val explainText = {
          val sw = new java.io.StringWriter()
          // capture explain("formatted") of the df's own execution
          Console.withOut(new java.io.PrintStream(new java.io.OutputStream {
            override def write(b: Int): Unit = sw.write(b)
          })) { df.explain("formatted") }
          sw.toString
        }
        val finalPlan = df.queryExecution.executedPlan.toString
        val body = explainText + "\n\n== AQE-final executed plan ==\n" + finalPlan
        Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), body)
        val ex = "Exchange".r.findAllIn(finalPlan).size
        val bc = "BroadcastExchange".r.findAllIn(finalPlan).size
        println(f"[plandump] $n%-30s exchanges=${ex - bc} broadcasts=$bc")
      } catch {
        case e: Throwable =>
          println(s"[plandump] $n ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
