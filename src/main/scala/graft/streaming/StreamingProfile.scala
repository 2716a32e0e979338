package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming twin of [[graft.ops.SketchOps.profileTable]]: a per-column
  * data-quality profile of an arriving document stream, maintained
  * incrementally — the monitor a 100 TB ingest runs so a bad upstream
  * batch (nulls spike, length collapse, vocabulary shrink) is visible at
  * arrival time, not at the next full-table scan.
  *
  * Every statistic in the store is chosen to be MERGEABLE:
  * count/null-count/sum add, min/max fold, distinct rides an HLL sketch
  * (register-max union). So each micro-batch costs one aggregate over the
  * batch plus a union with the bounded store (one row per column), and
  * the profile at any moment is exact for count/nulls/min/max/mean and
  * sketch-accurate for distincts — no raw row is ever revisited.
  *
  * Replay safety differs from [[StreamingSketch]]: counts and sums are
  * NOT idempotent under re-merge, so [[mergeBatchIntoStore]] skips a
  * batch the store has already folded in ([[GenStore]] generation guard).
  * The generation publish makes a crash mid-write harmless: an
  * incomplete generation is never read, and the prior generation is
  * pruned only after the new one is complete.
  */
object StreamingProfile {

  private val LgK = 14

  /** One long-form stats row per profiled column, typed min/max lanes
    * (numeric vs string) so merges never compare numbers lexically. */
  private def batchStats(batch: DataFrame, batchId: Long): DataFrame = {
    def num(name: String, c: Column, distinctOf: Column): Column = struct(
      lit(name).as("column_name"),
      count(lit(1)).as("n_rows"),
      sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
      hll_sketch_agg(distinctOf, LgK).as("sk"),
      min(c).cast("double").as("min_num"),
      max(c).cast("double").as("max_num"),
      sum(c.cast("double")).as("sum_num"),
      lit(null).cast("string").as("min_str"),
      lit(null).cast("string").as("max_str"))
    def str(name: String, c: Column): Column = struct(
      lit(name).as("column_name"),
      count(lit(1)).as("n_rows"),
      sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
      hll_sketch_agg(c, LgK).as("sk"),
      lit(null).cast("double").as("min_num"),
      lit(null).cast("double").as("max_num"),
      lit(null).cast("double").as("sum_num"),
      min(c).as("min_str"),
      max(c).as("max_str"))
    batch
      .agg(
        num("doc_id", col("doc_id"), col("doc_id")).as("p1"),
        num("text_len", length(col("text")).cast("long"), md5(col("text"))).as("p2"),
        str("lang", col("lang")).as("p3"))
      .select(explode(array(col("p1"), col("p2"), col("p3"))).as("p"))
      .select(col("p.*"))
      .withColumn("merged_through", lit(batchId))
  }

  /** Fold one micro-batch into the profile store; no-op if `batchId` is
    * already merged (replay — [[GenStore]] generation guard; the
    * generation publish is also what makes a crash mid-write harmless). */
  def mergeBatchIntoStore(batch: DataFrame, storePath: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (!GenStore.mergedThrough(spark, storePath).exists(_ >= batchId)) {
      val merged = GenStore.read(spark, storePath) match {
        case Some(store) =>
          store.unionByName(batchStats(batch, batchId))
            .groupBy(col("column_name"))
            .agg(
              sum(col("n_rows")).as("n_rows"),
              sum(col("n_nulls")).as("n_nulls"),
              hll_union_agg(col("sk"), allowDifferentLgConfigK = false).as("sk"),
              min(col("min_num")).as("min_num"),
              max(col("max_num")).as("max_num"),
              sum(col("sum_num")).as("sum_num"),
              min(col("min_str")).as("min_str"),
              max(col("max_str")).as("max_str"),
              max(col("merged_through")).as("merged_through"))
        case None => batchStats(batch, batchId)
      }
      GenStore.publish(merged, storePath, batchId)
    }
  }

  /** The maintenance sink over a documents-shaped stream. */
  def startProfileSink(
      docs: DataFrame,
      storePath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatchIntoStore(batch, storePath, batchId)
      }
      .start()

  /** Read the live profile: exact count/nulls/min/max/mean + sketch
    * distinct estimate, one row per column. */
  def profileFromStore(s: SparkSession, storePath: String): DataFrame =
    GenStore.read(s, storePath)
      .getOrElse(sys.error(s"no complete profile generation under $storePath"))
      .select(
        col("column_name"), col("n_rows"), col("n_nulls"),
        hll_sketch_estimate(col("sk")).as("n_distinct_est"),
        col("min_num"), col("max_num"),
        round(col("sum_num") / (col("n_rows") - col("n_nulls")), 4)
          .as("mean_numeric"),
        col("min_str"), col("max_str"))
      .orderBy("column_name")
}
