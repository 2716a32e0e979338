package graft

/** Mirrors the driver's t1 smoke: SparkEntry.entry on sf0.001 must return
  * rows > 0. Run: sbt "runMain graft.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 8, appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"[smoke] entry rows=$n schema=${df.schema.map(_.name).mkString(",")}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
