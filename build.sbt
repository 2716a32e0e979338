ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "trailconditionetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local mode = driver-only single JVM. Heap is a measured CLIFF in both
  // directions: 8g thrashes GC once a few dozen shuffles+broadcasts
  // accumulate, while 48g makes G1 pathological on this allocation
  // pattern — after one heavy memo build, an identical 1.2 s query
  // settles at ~8 s STEADY-STATE (measured: q_dedup_simhash_wide128
  // 1.38/1.18/1.07 s at 16g vs 1.82/8.57/8.20 s at 48g in the same
  // query sequence; whole-bench total 128 s at 48g vs ~60 s at 16g).
  // 16g keeps G1's young gen small enough that the 32-thread allocation
  // storm evacuates cheaply.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // dozens of whole-stage-codegen classes exhaust the default ~240 MB code
  // cache mid-run, stalling C2 and leaving hot loops interpreted (observed:
  // 5x slowdown on the first post-pressure query)
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JVM").toSeq.flatMap(_.split("\\s+"))
