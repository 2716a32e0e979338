package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSketch

/** Incremental HLL sketch maintenance: the streamed store must equal the
  * batch-built sketch EXACTLY (register-max union is order-independent),
  * and a replayed batch must be a no-op (union is idempotent) — the two
  * algebraic facts that make sketch stores safe under at-least-once
  * streaming delivery.
  */
class StreamingSketchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(d: Int, h: Int): java.sql.Timestamp = java.sql.Timestamp.valueOf(
    java.time.LocalDateTime.parse("2025-06-01T00:00:00").plusDays(d).plusHours(h))

  private def tmpDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-sksp-$tag")
    p.toFile.deleteOnExit(); p.toString
  }

  // (event_id, ts, user_id, event_type)
  private def mkEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type")

  private val allRows: Seq[(Long, java.sql.Timestamp, Long, String)] =
    (0 until 300).map { i =>
      (i.toLong, ts(i % 4, i % 24), (i % 57).toLong,
        if (i % 3 == 0) "click" else if (i % 3 == 1) "view" else "purchase")
    }

  test("streamed sketch store == batch sketch, exactly, across 3 micro-batches") {
    val store = tmpDir("store") + "/sk"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamingSketch.startSketchMaintenanceSink(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      store, tmpDir("ckpt"))
    try {
      allRows.grouped(100).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = StreamingSketch.sketchEstimates(spark, store)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = mkEvents(allRows)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(to_date(col("ts"))).as("days_merged"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), 14)).as("approx_users"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(streamed.map(_._2).forall(_ > 1)) // really merged multiple days
  }

  test("replaying a batch into the store is a no-op (idempotent union)") {
    val store = tmpDir("replay") + "/sk"
    val first = mkEvents(allRows.take(150))
    StreamingSketch.mergeBatchIntoStore(first, store)
    val before = StreamingSketch.sketchEstimates(spark, store)
      .collect().map(_.toString).toSeq
    StreamingSketch.mergeBatchIntoStore(first, store) // replay, bit-for-bit
    val after = StreamingSketch.sketchEstimates(spark, store)
      .collect().map(_.toString).toSeq
    assert(before == after)
  }
}
