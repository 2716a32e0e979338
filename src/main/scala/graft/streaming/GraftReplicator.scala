package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.MergeTable

/** Reset-safe CDC REPLICATION: stream one graft table's change feed into
  * a replica graft table, converging across plain diffs, snapshot boots
  * AND the paged beyond-retention RESET epochs of
  * [[graft.sources.GraftStreamSource]] — the reference implementation of
  * the feed's consumer contract, usable as-is or composed via
  * [[applyBatch]] inside any `foreachBatch`.
  *
  * Semantics per delivered row:
  *
  *  - `feed_type` "diff": applied per `_commit_version` ascending —
  *    INSERT/UPDATE rows upsert, DELETE rows delete. Every commit this
  *    consumer makes is watermarked under ONE writer (`graft-repl`) at
  *    `(batchId << 20 | seq)` — BATCH-scoped, not version-scoped,
  *    because the paged feed delivers several micro-batches of one
  *    version and several versions in one micro-batch; a replayed
  *    micro-batch re-issues identical values and no-ops (exactly-once).
  *  - `feed_type` "snapshot": a FRESH stream's (possibly paged) boot —
  *    rows upsert. With an empty replica (the normal fresh-checkpoint
  *    shape) the slices converge to the boot snapshot; a NON-empty
  *    replica under a fresh checkpoint may keep stale rows until the
  *    next reset epoch — start fresh replicas empty (or drop first).
  *  - `feed_type` "reset": a mid-stream beyond-retention reset epoch
  *    (`_commit_version` = the epoch). Slice rows STAGE into a
  *    per-epoch staging graft table (`<dst>_resetstage_v<epoch>`,
  *    batch-watermarked); nothing touches the replica until the
  *    `RESET_END` marker's batch, which REPLACES the replica's state from
  *    the staging in one transactional full-replace commit
  *    ([[MergeTable.replaceAll]] — O(staging write), no join; the stale
  *    file set retires wholesale) and drops the staging. A crash anywhere replays idempotently: the
  *    stage merges
  *    and the swap all carry watermarks, and a post-swap replay of the
  *    marker batch no-ops. A NEWER epoch's first slice drops any stale
  *    staging (the superseded-epoch contract).
  *
  * Scale shape: diffs cost O(changed rows) per version; a reset costs
  * the staging writes plus ONE O(snapshot-write) replace commit — never
  * a join against the stale replica — paid once per epoch and paged on
  * the READ side by the source's file budget.
  */
object GraftReplicator {

  private def stagePath(dstTable: String, epoch: Long): String =
    s"${dstTable}_resetstage_v$epoch"

  /** Drop staging tables of epochs other than `keep` (stale epochs were
    * superseded mid-reset; their swap never happened and never will). */
  private def dropStaleStages(dstTable: String, keep: Long): Unit = {
    val dir = java.nio.file.Paths.get(dstTable).toAbsolutePath.getParent
    val base = java.nio.file.Paths.get(dstTable).getFileName.toString
    if (dir == null || !java.nio.file.Files.isDirectory(dir)) return
    val stream = java.nio.file.Files.list(dir)
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith(s"${base}_resetstage_v") &&
            n != s"${base}_resetstage_v$keep")
          MergeTable.dropTable(p.toString)
      }
    } finally stream.close()
  }

  /** Apply ONE micro-batch of a graft change feed to the replica.
    * `keys` are the SOURCE table's merge keys (the feed's identity) and
    * `dataCols` its table columns — passed EXPLICITLY (never derived by
    * a `_pre` suffix heuristic: a table is free to carry payload columns
    * named like preimages; the pinned source schema is the truth);
    * `batchId` is `foreachBatch`'s — it watermarks the staging writes so
    * a replayed batch re-stages as a no-op. */
  def applyBatch(s: SparkSession, dstTable: String, keys: Seq[String],
      dataCols: Seq[String], batch: DataFrame, batchId: Long): Unit = {
    val cols = dataCols.map(col)
    // ONE writer, BATCH-scoped watermarks: the feed delivers several
    // micro-batches of one _commit_version (paged snapshot/reset
    // slices) AND several versions in one micro-batch, so per-version
    // watermarks are the wrong replay unit — the engine's exactly-once
    // unit is the micro-batch. Commits inside a batch run in
    // deterministic order (epoch stages ascending, swaps, then per
    // version: upsert, delete); each takes (batchId << 20 | seq),
    // monotone across and within batches, so a replayed batch re-issues
    // IDENTICAL values and every already-applied commit no-ops off the
    // replica's one bounded watermark entry.
    var seq = -1L
    def tick(): Long = {
      seq += 1
      require(seq < (1L << 20), "more than 2^20 commits in one batch")
      (batchId << 20) | seq
    }

    val resetRows = batch.where(col("feed_type") === "reset")
    val markers = resetRows
      .where(col("change_type") === "RESET_END")
      .select(col("_commit_version")).distinct()
      .collect().map(_.getLong(0)) // ≤1 by construction
    val resetData = resetRows.where(col("change_type") =!= "RESET_END")
    val epochs = resetData.select(col("_commit_version")).distinct()
      .collect().map(_.getLong(0)).sorted

    // 1. stage reset slices (per epoch; a new epoch supersedes any
    //    stale staging from an abandoned one)
    epochs.foreach { epoch =>
      dropStaleStages(dstTable, epoch)
      MergeTable.mergeUpsert(s, stagePath(dstTable, epoch),
        resetData.where(col("_commit_version") === epoch).select(cols: _*),
        keys, keys, txn = Some(("graft-repl", tick())))
    }

    // 2. a marker completes its epoch: full-sync the replica from the
    //    staging (one transactional merge — stale replica rows DELETE
    //    via not-matched-by-source), then drop the staging
    markers.foreach { epoch =>
      val stage = stagePath(dstTable, epoch)
      val staged = MergeTable.latestManifest(stage) match {
        case Some(_) => MergeTable.read(s, stage).select(cols: _*)
        case None => // post-swap crash replay: swap below no-ops anyway
          resetData.where(col("_commit_version") === epoch).select(cols: _*)
      }
      // the swap is a FULL-REPLACE commit: the staged snapshot IS the
      // replica's new state — O(staging write), no join against the
      // stale replica (whose entire file set retires wholesale)
      MergeTable.replaceAll(s, dstTable, staged, keys, keys,
        txn = Some(("graft-repl", tick())))
      MergeTable.dropTable(stage)
    }

    // 3. diffs and (fresh-boot) snapshot slices, per version ascending
    val applyRows = batch.where(col("feed_type") =!= "reset")
    val versions = applyRows.select(col("_commit_version")).distinct()
      .collect().map(_.getLong(0)).sorted // bounded: versions per batch
    versions.foreach { v =>
      val rows = applyRows.where(col("_commit_version") === v)
      val ups = rows.where(col("change_type").isin("INSERT", "UPDATE"))
        .select(cols: _*)
      val dels = rows.where(col("change_type") === "DELETE")
        .select(keys.map(col): _*)
      MergeTable.mergeUpsert(s, dstTable, ups, keys, keys,
        txn = Some(("graft-repl", tick())))
      if (MergeTable.latestManifest(dstTable).nonEmpty)
        MergeTable.mergeDelete(s, dstTable, dels,
          txn = Some(("graft-repl", tick())))
    }
  }

  /** Start the replication stream. The source's merge keys pin the
    * replica's; `options` pass through to the source reader
    * (`maxFilesPerTrigger`, `maxBytesPerTrigger`,
    * `maxVersionsPerTrigger`, `startingVersion`). */
  def replicate(s: SparkSession, srcTable: String, dstTable: String,
      checkpoint: String,
      options: Map[String, String] = Map.empty): StreamingQuery = {
    val head = MergeTable.latestManifest(srcTable).getOrElse(
      sys.error(s"no committed version under $srcTable"))
    val keys = head.keys
    val dataCols = org.apache.spark.sql.types.DataType
      .fromJson(head.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    options.foldLeft(s.readStream.format("graft")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(srcTable)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b.sparkSession, dstTable, keys, dataCols, b, id)
      }
      .start()
  }
}
