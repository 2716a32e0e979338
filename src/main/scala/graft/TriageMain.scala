package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch triage main for the optimization round: time labeled fragments
  * of hot queries in one warm JVM (3 reps each, noop sink) to attribute
  * where a query's seconds actually go. Not part of the driver contract.
  *
  * Run: sbt "runMain graft.TriageMain <case>"
  */
object TriageMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(32, "graft-triage")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt

    def time(label: String)(df: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[triage] $label%-40s ${ts.map(t => f"$t%6.2f").mkString(" ")}")
    }

    args.headOption.getOrElse("ann_incr") match {
      case "ann_incr" =>
        // full query once to build+memoize the fixture
        time("q_ann_incremental full")(
          SparkEntry.queries("q_ann_incremental")(s, dir))
        time("q_ann_pq_adc full")(
          SparkEntry.queries("q_ann_pq_adc")(s, dir))
        // raw scan of the incremental codes table through the graft door
        val root = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir", "/tmp"), "graft-merge")
        val codesT = java.nio.file.Files.list(root).iterator()
        val it = new scala.collection.Iterator[java.nio.file.Path] {
          def hasNext = codesT.hasNext; def next() = codesT.next()
        }
        it.filter(_.getFileName.toString.startsWith("pqcodes"))
          .toSeq.sortBy(_.toString).lastOption.foreach { p =>
            time(s"graft read codes table")(s.read.format("graft")
              .load(p.toString))
            time(s"graft read codes noagg")(s.read.format("graft")
              .load(p.toString).select(col("vec_id")))
          }
      case "wav" =>
        time("wavTable (encode only)")(
          graft.ops.MultimodalOps.wavTable(s, dir))
        time("decodeWav full")(
          SparkEntry.queries("q_multimodal_audio")(s, dir))
      case "p1" =>
        val ev = graft.sources.Tables.read(s, dir, "events")
        time("scan only")(ev)
        time("scan+project ids")(ev.select(col("event_id")))
        time("get_json_object")(ev.select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_raw")))
        time("gjo+filter")(ev.select(col("event_id"), col("ts"),
          get_json_object(col("props"), "$.k").as("k_raw"))
          .where(col("k_raw").isNotNull))
        time("gjo+filter+fmt")(ev.select(col("event_id"), col("ts"),
          get_json_object(col("props"), "$.k").as("k_raw"))
          .where(col("k_raw").isNotNull)
          .select(col("event_id"), col("k_raw").cast("int").as("k_value"),
            date_format(col("ts"), "yyyy-MM-dd").as("day")))
        time("full no orderBy")(graft.ops.EventOps
          .p1StrictProjection(s, dir).queryExecution.logical match {
            case _ => graft.ops.EventOps.p1StrictProjection(s, dir)
          })
        time("orderBy only")(ev.select(col("event_id"), col("ts"))
          .orderBy("event_id"))
      case other =>
        time(other)(SparkEntry.queries(other)(s, dir))
    }
    s.stop()
  }
}
