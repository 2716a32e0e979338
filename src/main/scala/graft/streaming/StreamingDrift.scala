package graft.streaming

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
  * under re-merge, so a replayed batch id is skipped via the [[GenStore]]
  * generation guard, and the generation publish is crash-safe (an
  * incomplete write is never read; older generations are pruned only
  * after the new one is complete).
  */
object StreamingDrift {

  /** (source, b, c) counts of one micro-batch — the batch op's own
    * counting half ([[CorpusOps.sourceBucketCountsOf]]), so parity holds
    * by construction. */
  private def batchCounts(batch: DataFrame): DataFrame =
    CorpusOps.sourceBucketCountsOf(batch)

  /** Store cardinality guard: the store holds |sources|·B rows, which is
    * fine for any sane source vocabulary but unbounded against a
    * pathological one (a mis-tagged feed minting a source per request
    * would grow the store without limit). Sources beyond the top
    * `MaxSources − 1` by total token mass roll up into [[OtherSource]] —
    * standard heavy-hitter truncation: per-source drift stays exact for
    * every source that matters, the tail is monitored in aggregate, and
    * the store is bounded at MaxSources·B rows forever. A demoted source
    * that later grows re-enters with its counts from that point on (its
    * earlier mass stays in the rollup — the usual top-N tradeoff).
    */
  val MaxSources = 1000
  val OtherSource = "__other"

  private def capSources(counts: DataFrame, maxSources: Int): DataFrame = {
    val rank = rank_over_mass(counts)
    counts.join(rank, Seq("source"))
      .select(
        when(col("source_rank") <= maxSources - 1, col("source"))
          .otherwise(lit(OtherSource)).as("source"),
        col("b"), col("c"))
      .groupBy(col("source"), col("b"))
      .agg(sum(col("c")).as("c"))
  }

  /** (source, source_rank) by total token mass — a ≤|sources|-row frame
    * (dense_rank over the per-source totals, deterministic tie-break on
    * the name). */
  private def rank_over_mass(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts.groupBy(col("source")).agg(sum(col("c")).as("mass"))
      .select(col("source"), row_number().over(
        Window.orderBy(col("mass").desc, col("source"))).as("source_rank"))
  }

  /** Fold one micro-batch into the drift store; no-op on replay
    * (generation guard — see [[GenStore]]). `maxSources` bounds the store
    * ([[capSources]]); the default is far above any sane vocabulary, so
    * streamed == batch parity is unaffected for real corpora.
    */
  def mergeBatchIntoStore(batch: DataFrame, storePath: String, batchId: Long,
      maxSources: Int = MaxSources): Unit = {
    val spark = batch.sparkSession
    if (!GenStore.mergedThrough(spark, storePath).exists(_ >= batchId)) {
      val counts = batchCounts(batch)
      val merged = GenStore.read(spark, storePath) match {
        case Some(store) =>
          store.unionByName(counts)
            .groupBy(col("source"), col("b"))
            .agg(sum(col("c")).as("c"))
        case None => counts
      }
      GenStore.publish(capSources(merged, maxSources), storePath, batchId)
    }
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
      GenStore.read(s, storePath)
        .getOrElse(sys.error(s"no complete drift generation under $storePath"))
        .select(col("source"), col("b"), col("c")))
}
