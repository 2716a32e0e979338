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
      case "textstats" =>
        val d = graft.sources.Tables.read(s, dir, "documents")
        time("tokenize only")(d.select(col("doc_id"),
          split(col("text"), " ").as("toks")))
        time("native one-pass")(graft.ops.TextOps.textStatsOf(d))
        time("composed (retired)")(graft.ops.TextOps.textStatsComposedOf(d))
      case "ann_incr2" =>
        // decompose the incremental-vs-adc gap: same shared tail, codes
        // from the cached wide fold vs the graft DSv2 read
        time("incremental full (fixture+q)")(
          SparkEntry.queries("q_ann_incremental")(s, dir))
        time("pq_adc full")(
          SparkEntry.queries("q_ann_pq_adc")(s, dir))
        val root = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir", "/tmp"), "graft-merge")
        val appTag = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "")
        val codesT = java.nio.file.Files.list(root).iterator()
        val it = new scala.collection.Iterator[java.nio.file.Path] {
          def hasNext = codesT.hasNext; def next() = codesT.next()
        }
        it.filter(p => p.getFileName.toString.startsWith("pqcodes") &&
            p.getFileName.toString.endsWith(appTag))
          .toSeq.headOption.foreach { p =>
            val graftCodes = graft.ops.MergeTable.read(s, p.toString)
            time("graft codes scan only")(graftCodes)
            time("incr via override (q only)")(
              graft.ops.SimilarityOps.annPqAdcIncremental(s, dir))
          }
      case "k6" =>
        val ev = graft.sources.Tables.read(s, dir, "events")
        def route(pin: Boolean) = {
          val c = when(col("value") > 190.0, "VALUE_OUT_OF_RANGE")
            .when(get_json_object(col("props"), "$.k").isNull, "MALFORMED_PAYLOAD")
          ev.withColumn("exception_type",
            if (pin) graft.functions.PinnedEval.pinned(c) else c)
            .where(col("exception_type").isNotNull)
            .select(col("event_id"), col("user_id"), col("exception_type"),
              (col("value") <= 500.0).as("safe_to_retry"))
            .orderBy("event_id")
        }
        time("k6 pinned (current)")(route(pin = true))
        time("k6 unpinned (pre-r18)")(route(pin = false))
        time("k6 pinned again")(route(pin = true))
      case other =>
        time(other)(SparkEntry.queries(other)(s, dir))
    }
    s.stop()
  }
}
