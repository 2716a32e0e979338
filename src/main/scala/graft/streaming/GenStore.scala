package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe generation store shared by the streaming maintenance sinks
  * (sketch / profile / drift). The store root holds `gen-<batchId>`
  * parquet directories; a generation is COMPLETE iff its `_SUCCESS`
  * marker exists, and readers always take the newest complete one. That
  * makes the publish all-or-nothing without any rename of the live store:
  * a crash mid-write leaves an incomplete `gen-` dir that no reader ever
  * selects, the replayed batch rewrites it (mode=overwrite), and older
  * generations are pruned only AFTER the new one is complete — the
  * delete-then-rename publish this replaces had a window where a crash
  * lost the whole store.
  *
  * Replay guard: streaming batch ids are monotonic and only the last
  * uncommitted batch ever replays, so "already merged" ⟺
  * `batchId ≤ newest complete generation id`.
  */
private[graft] object GenStore {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Newest complete generation as (batchId, path). */
  def latest(spark: SparkSession, root: String): Option[(Long, String)] = {
    val f = fs(spark, root)
    val rootP = new Path(root)
    if (!f.exists(rootP)) None
    else f.listStatus(rootP).toSeq
      .map(_.getPath)
      // digit guard: foreign entries under a store root (a checkpoint
      // dir, a gen-named file from another writer) must be ignored, not
      // throw in toLong
      .filter(p => isGen(p.getName) && f.exists(new Path(p, "_SUCCESS")))
      .map(p => p.getName.stripPrefix("gen-").toLong -> p.toString)
      .sortBy(_._1)
      .lastOption
  }

  private def isGen(name: String): Boolean = {
    val id = name.stripPrefix("gen-")
    name.startsWith("gen-") && id.nonEmpty && id.forall(_.isDigit)
  }

  def mergedThrough(spark: SparkSession, root: String): Option[Long] =
    latest(spark, root).map(_._1)

  /** Write `merged` as generation `batchId`, then prune older complete
    * generations (best-effort — a crash between write and prune only
    * leaves an extra readable generation).
    *
    * Retention is TWO complete generations, not one: [[read]] and the
    * report functions hand back a LAZY frame pinned to the then-latest
    * generation path, so a monitoring read whose action executes after a
    * concurrent micro-batch publishes would hit FileNotFound if the prune
    * were immediate. Keeping latest-1 gives every in-flight reader a full
    * publish cycle to finish — the same one-extra-snapshot grace a
    * lakehouse VACUUM applies before collecting unreferenced files. */
  def publish(merged: DataFrame, root: String, batchId: Long): Unit = {
    val spark = merged.sparkSession
    merged.write.mode("overwrite").parquet(s"$root/gen-$batchId")
    val f = fs(spark, root)
    val complete = f.listStatus(new Path(root)).toSeq.map(_.getPath)
      .filter(p => isGen(p.getName) && f.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("gen-").toLong)
      .sorted(Ordering[Long].reverse)
    val floor = complete.take(2).lastOption.getOrElse(batchId)
    f.listStatus(new Path(root)).toSeq.map(_.getPath)
      .filter(p => isGen(p.getName) &&
        p.getName.stripPrefix("gen-").toLong < floor)
      .foreach(p => f.delete(p, true))
    ()
  }

  /** Read the newest complete generation; None if the store is empty. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    latest(spark, root).map { case (_, p) => spark.read.parquet(p) }
}
