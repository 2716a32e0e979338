package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink shapes (SURVEY §2.2). The reference's sinks are HTTP upserts into a
  * weather store (`fetch-weather/src/weather.py:25-39`) made safe by
  * idempotency (`DESIGN.md:41`); the Spark-native equivalents are keyed
  * MERGE writes and side-output splits.
  */
object Sinks {

  /** K1/K2 + R2: idempotent keyed upsert. New rows win on key collision, so
    * replaying a batch (at-least-once delivery) converges — the property the
    * reference gets from HTTP upserts.
    *
    * On a lakehouse table format this is `MERGE INTO` inside `foreachBatch`
    * (transactional, no rewrite). Plain parquet has no transactional merge,
    * so locally: read-union-dedup → write tmp → atomic-ish swap. The
    * SEMANTICS (idempotence under replay) are what the tests pin down.
    */
  def upsertParquet(df: DataFrame, path: String, keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new Path(path)
    val fs = target.getFileSystem(hconf)

    val merged =
      if (fs.exists(target)) {
        val existing = spark.read.parquet(path).withColumn("__pri", lit(0))
        val incoming = df.withColumn("__pri", lit(1))
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__pri").desc)
        existing.unionByName(incoming)
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .drop("__pri", "__rn")
      } else df

    val tmp = new Path(path + "__tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(tmp, target)
    ()
  }

  /** K1/K2 at scale: PARTITION-SCOPED idempotent upsert. [[upsertParquet]]
    * rewrites the whole store — correct but O(store) per batch; at 100 TB
    * the store is partitioned (here by day) and a batch only touches a few
    * partitions, so the merge reads+rewrites ONLY those. Implemented with
    * dynamic partition overwrite (`partitionOverwriteMode=dynamic`), the
    * parquet-level equivalent of a lakehouse MERGE's file pruning.
    *
    * `partitionCol` must be derivable from each row (it becomes the
    * physical layout); `keys` dedupe within the touched partitions,
    * new rows winning.
    */
  def upsertPartitioned(
      df: DataFrame, path: String, keys: Seq[String], partitionCol: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new Path(path)
    val fs = target.getFileSystem(hconf)

    val merged =
      if (fs.exists(target)) {
        // collect the touched PARTITION VALUES (bounded metadata — days,
        // not data) so the existing-side scan partition-prunes
        val touched = df.select(col(partitionCol)).distinct()
          .collect().map(_.get(0))
        val existing = spark.read.parquet(path)
          .where(col(partitionCol).isin(touched: _*))
          .withColumn("__pri", lit(0))
        val incoming = df.withColumn("__pri", lit(1))
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__pri").desc)
        existing.unionByName(incoming)
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .drop("__pri", "__rn")
          // materialize before overwriting the path we just read (Spark
          // rejects a write whose plan still scans the target)
          .localCheckpoint()
      } else df

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // the write consumed the checkpoint — release its pinned blocks so a
      // long-running streaming sink doesn't accumulate one per batch
      // (no-op on the fresh-store branch, which has no checkpoint leaf)
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(merged)
    }
  }

  /** R5: bounded-retry ceiling. A failed row is retried until its
    * queue-redelivery count reaches the ceiling, then diverted to the
    * dead-letter side — `delivery_count >= max_delivery_count = 6`
    * (`categorize-trail-conditions/src/tasks.py:105-120`,
    * `fetch-weather/src/config.py:37`). `delivery_count` is queue metadata
    * carried on the row (a Kafka redelivery header / SQS receive count);
    * the split itself is one map-side predicate, no shuffle.
    */
  /** Single source of truth shared with the batch R5 query
    * ([[EventOps.MaxDeliveryCount]] aliases this) so the streaming sink
    * and the oracle-checked query can never disagree on the ceiling.
    */
  val MaxDeliveryCount = 6

  def deliveryCeilingSplit(df: DataFrame, maxDeliveryCount: Int = MaxDeliveryCount)
      : (DataFrame, DataFrame) =
    (df.where(col("delivery_count") < maxDeliveryCount),
      df.where(col("delivery_count") >= maxDeliveryCount)
        .withColumn("exception_type", lit("MAX_DELIVERY_EXCEEDED")))

  /** K6: split a transformed batch into (success, dead-letter) halves in
    * one pass — the `when()` route of `TaskTransformationResult.is_success`
    * (`fetch-weather/worker_ingestion.py:169-181`).
    */
  def successDlqSplit(df: DataFrame, isValid: org.apache.spark.sql.Column)
      : (DataFrame, DataFrame) = {
    val flagged = df.withColumn("__ok", isValid)
    (flagged.where(col("__ok")).drop("__ok"),
      flagged.where(!col("__ok")).drop("__ok")
        .withColumn("exception_type", lit("VALIDATION_FAILED"))
        .withColumn("safe_to_retry", lit(true)))
  }
}
