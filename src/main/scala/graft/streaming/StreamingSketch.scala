package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming twin of [[graft.ops.SketchOps.sketchRollup]]: incremental
  * maintenance of a per-(event_type, day) HLL sketch table as events
  * stream in — the metrics-store pattern at 100 TB: raw events are
  * touched exactly once, on arrival; every later distinct-count question
  * at any grain is answered from the kilobyte-scale sketch table.
  *
  * Why this sink needs NO versioned state (unlike the span-scrub Bloom in
  * [[StreamingDedup.startSpanScrubSink]]): HLL register-max union is
  * idempotent as well as associative-commutative — merging the same batch
  * sketch twice leaves every register unchanged. A replayed micro-batch
  * (at-least-once file sink semantics) therefore converges to the
  * identical store, and StreamingSketchSpec pins exactly that, plus exact
  * register equality with the batch-built sketch over the same rows.
  */
object StreamingSketch {

  private val LgK = 14

  /** Merge one micro-batch's events into the sketch store. Batch side:
    * one partial+final aggregate over the batch; store side: a bounded
    * scan of |types|×|days| sketch rows; the merge is a union + one more
    * sketch aggregate. Published as a [[GenStore]] generation (auto-
    * incremented id — re-merging the same batch converges by HLL union
    * idempotence, so no replay guard is needed) so a crash mid-write
    * never loses the accumulated store. */
  def mergeBatchIntoStore(batch: DataFrame, storePath: String): Unit = {
    val spark = batch.sparkSession
    val batchSk = batch
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), LgK).as("sk"))
    val merged = GenStore.read(spark, storePath) match {
      case Some(store) =>
        store
          .unionByName(batchSk)
          .groupBy(col("event_type"), col("day"))
          .agg(hll_union_agg(col("sk"), allowDifferentLgConfigK = false).as("sk"))
      case None => batchSk
    }
    GenStore.publish(merged, storePath,
      GenStore.mergedThrough(spark, storePath).getOrElse(-1L) + 1)
  }

  /** The maintenance sink: every micro-batch folds into the store. */
  def startSketchMaintenanceSink(
      events: DataFrame,
      storePath: String,
      checkpoint: String): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatchIntoStore(batch, storePath)
      }
      .start()

  /** Rollup read over the maintained store: per event_type distinct-user
    * estimate from the merged daily sketches — never touches raw events. */
  def sketchEstimates(s: SparkSession, storePath: String): DataFrame =
    GenStore.read(s, storePath)
      .getOrElse(sys.error(s"no complete sketch generation under $storePath"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("days_merged"),
        hll_sketch_estimate(hll_union_agg(col("sk"), allowDifferentLgConfigK = false))
          .as("approx_users"))
      .orderBy("event_type")
}
