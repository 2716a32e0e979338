package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.BaseRelation
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.ops.MergeTable

/** The WRITE doors behind `format("graft")` — every write lands on the
  * engine's transactional commit protocol (CAS log, clustered files,
  * per-file stats, txn watermarks); there is no append path that could
  * bypass it.
  *
  * Batch — `df.write.format("graft").option("keys", "id").save(path)`:
  *
  *  - first write CREATES the table; `keys` is required (`clusterBy`
  *    defaults to the keys; both pin for the table's lifetime).
  *  - `SaveMode.Append` is the engine's UPSERT: graft tables are
  *    key-unique, so "append" of an existing key means new-row-wins —
  *    stated here because two readings exist and silence would be the
  *    wrong kind of surprise.
  *  - `SaveMode.Overwrite` is a FULL SYNC in ONE transactional commit:
  *    matched rows update, new rows insert, and table rows ABSENT from
  *    the batch delete (a not-matched-by-source clause — O(table) by
  *    semantics, exactly what overwrite means). Time travel still serves
  *    every pre-overwrite version.
  *  - `ErrorIfExists` / `Ignore` follow their contracts against table
  *    existence (a committed version under the path).
  *
  * Streaming — `df.writeStream.format("graft").option("keys", "id")
  * .start(path)`:
  *
  *  - EXACTLY-ONCE by construction: each micro-batch merges under
  *    `txn = (writerId, batchId)`, the same per-writer watermark every
  *    engine ingest uses, so a crash-replayed batch is a no-op commit.
  *    `writerId` defaults to the query's checkpoint location (stable
  *    across restarts); two concurrent queries into one table need
  *    distinct checkpoints (they have them — Spark enforces it) or an
  *    explicit `writerId` option. A checkpoint visible only through
  *    `spark.sql.streaming.checkpointLocation` (or an implicit temp
  *    checkpoint) never reaches the sink's options, so the sink REQUIRES
  *    one of the two options explicitly — a table-path-derived default
  *    would let distinct queries share a watermark and silently drop
  *    each other's batches as replays.
  *  - `OutputMode.Append`/`Update` both mean upsert (the key-unique
  *    model collapses them); `Complete` means the full-sync merge (the
  *    batch is the whole result — absent keys delete).
  */
object GraftWriteDoor {

  private[sources] def ci(parameters: Map[String, String]): Map[String, String] =
    parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }

  private[sources] def pathOf(p: Map[String, String]): String =
    p.getOrElse("path", sys.error(
      "graft writes need a path: .format(\"graft\").save(path) / .start(path)"))

  /** Table keys: the manifest's when the table exists (an explicit
    * `keys` option must AGREE — silently writing under different keys
    * would be a corruption, not a convenience); the `keys` option on a
    * first write. */
  private[sources] def keysOf(p: Map[String, String], path: String)
      : (Seq[String], Seq[String]) = {
    def split(s: String) = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val opt = p.get("keys").map(split)
    val optCluster = p.get("clusterby").map(split)
    MergeTable.latestManifest(path) match {
      case Some(m) =>
        opt.foreach(k => require(
          k.map(_.toLowerCase(java.util.Locale.ROOT)) ==
            m.keys.map(_.toLowerCase(java.util.Locale.ROOT)),
          s"table $path is keyed ${m.keys.mkString(",")}; the write's keys " +
            s"option says ${k.mkString(",")} — a re-key needs a migration"))
        optCluster.foreach(c => require(
          c.map(_.toLowerCase(java.util.Locale.ROOT)) ==
            m.clusterBy.map(_.toLowerCase(java.util.Locale.ROOT)),
          s"table $path clusters by ${m.clusterBy.mkString(",")}"))
        (m.keys, m.clusterBy)
      case None =>
        val k = opt.getOrElse(sys.error(
          s"first write to $path needs .option(\"keys\", \"col[,col]\") — " +
            "graft tables are key-unique merge tables"))
        (k, optCluster.getOrElse(k))
    }
  }

  private[sources] def rowsPerFile(p: Map[String, String]): Long =
    p.get("targetrowsperfile").map(_.trim.toLong).getOrElse(4096L)

  /** Full sync = the batch IS the table's new state. Physically a
    * [[MergeTable.replaceAll]] FULL-REPLACE commit (write the batch,
    * retire the old file set wholesale — O(batch), no join), which is
    * row-for-row what the unconditional update-all / insert-all /
    * NMBS-delete merge produced while also reading the whole table to
    * produce it. */
  private[sources] def fullSync(s: SparkSession, path: String,
      data: DataFrame, keys: Seq[String], clusterBy: Seq[String],
      rpf: Long, txn: Option[(String, Long)]): Boolean =
    MergeTable.replaceAll(s, path, data, keys, clusterBy,
      targetRowsPerFile = rpf, txn = txn)

  private[sources] def writeBatch(s: SparkSession, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): Unit = {
    val p = ci(parameters)
    val path = pathOf(p)
    val exists = MergeTable.latestManifest(path).nonEmpty
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(
          s"graft table $path already exists (SaveMode.ErrorIfExists); " +
            "use Append (upsert) or Overwrite (full sync)")
      case SaveMode.Ignore if exists => ()
      case m =>
        val (keys, clusterBy) = keysOf(p, path)
        if (m == SaveMode.Overwrite && exists)
          fullSync(s, path, data, keys, clusterBy, rowsPerFile(p), None)
        else
          MergeTable.mergeUpsert(s, path, data, keys, clusterBy,
            targetRowsPerFile = rowsPerFile(p))
    }
  }
}

/** The V1 streaming sink: one transactional merge per micro-batch,
  * replay-exact via the engine's txn watermark. */
class GraftStreamSink(
    spark: SparkSession,
    path: String,
    writerId: String,
    complete: Boolean,
    parameters: Map[String, String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the micro-batch frame is streaming-tagged; the merge runs several
    // actions over it (key-dup precondition, stats pass, clustered
    // write) — re-tag as batch and PIN, so those actions see one
    // materialization instead of re-running the source
    val pinned = org.apache.spark.sql.graftbridge.Bridge
      .asBatch(data).localCheckpoint()
    try {
      val (keys, clusterBy) = GraftWriteDoor.keysOf(parameters, path)
      val rpf = GraftWriteDoor.rowsPerFile(parameters)
      val txn = Some((writerId, batchId))
      if (complete)
        GraftWriteDoor.fullSync(spark, path, pinned, keys, clusterBy, rpf, txn)
      else
        MergeTable.mergeUpsert(spark, path, pinned, keys, clusterBy,
          targetRowsPerFile = rpf, txn = txn)
      ()
    } finally org.apache.spark.sql.graftbridge.Bridge
      .unpersistLocalCheckpoint(pinned)
  }

  override def toString: String = s"GraftStreamSink[$path as $writerId]"
}
