package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ops.{CorpusOps, TextOps}

/** Streaming twin of [[CorpusOps.sourceDrift]]: the per-source
  * distribution-drift monitor maintained incrementally over a live
  * document stream. The store holds the (source, bucket) token counts —
  * PURELY ADDITIVE, so each micro-batch costs one bounded aggregate over
  * the batch plus a sum-merge with the |sources|·B-row store, and the
  * report at any moment is exactly the batch op's KL over the documents
  * seen so far (the math is the shared
  * [[CorpusOps.klFromSourceBucketCounts]] — streamed == batch pinned in
  * StreamingProfileSpec).
  *
  * Replay safety mirrors [[StreamingProfile]]: counts are not idempotent
  * under re-merge, so the store carries the highest merged batch id and a
  * replayed batch is skipped; the tmp-write + atomic-rename publish makes
  * the check all-or-nothing.
  */
object StreamingDrift {

  /** (source, b, c) counts of one micro-batch. */
  private def batchCounts(batch: DataFrame, batchId: Long): DataFrame =
    batch
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .select(col("source"),
        pmod(TextOps.hash60(col("tok")),
          lit(CorpusOps.DsirBuckets.toLong)).as("b"))
      .groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
      .withColumn("merged_through", lit(batchId))

  /** Fold one micro-batch into the drift store; no-op on replay. */
  def mergeBatchIntoStore(batch: DataFrame, storePath: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val target = new Path(storePath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(target)) Some(spark.read.parquet(storePath)) else None
    val already = existing.exists(
      _.agg(max(col("merged_through"))).collect()(0).getLong(0) >= batchId)
    if (!already) {
      val merged = existing match {
        case Some(store) =>
          store.unionByName(batchCounts(batch, batchId))
            .groupBy(col("source"), col("b"))
            .agg(sum(col("c")).as("c"),
              max(col("merged_through")).as("merged_through"))
        case None => batchCounts(batch, batchId)
      }
      val tmp = new Path(storePath + "__tmp")
      merged.write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(target)) fs.delete(target, true)
      fs.rename(tmp, target)
    }
    ()
  }

  /** The maintenance sink over a documents-shaped stream. */
  def startDriftSink(
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

  /** The live drift report — identical arithmetic to the batch op. */
  def driftFromStore(s: SparkSession, storePath: String): DataFrame =
    CorpusOps.klFromSourceBucketCounts(
      s.read.parquet(storePath).select(col("source"), col("b"), col("c")))
}
