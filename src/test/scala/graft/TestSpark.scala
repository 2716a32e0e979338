package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (JVM-wide — Spark's
  * getOrCreate returns the same session across suites in the forked test
  * JVM, which keeps the suite wall-clock dominated by queries, not session
  * startup).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
}
