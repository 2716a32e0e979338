package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.MergeTable

/** `spark.readStream.format("graft").load(path)` — the streaming CHANGE
  * DATA FEED as a first-class source, with COMMIT VERSIONS as offsets.
  *
  * Integration point: the V1 [[Source]] API behind
  * [[org.apache.spark.sql.sources.StreamSourceProvider]], the same
  * choice the batch scan made with `V1Scan` and for the same reason —
  * `getBatch` returns the ENGINE'S OWN DataFrame plan (the file-scoped
  * version diff with deletion-vector masking, column mapping and
  * whole-stage codegen intact), where a V2 `MicroBatchStream` would
  * demand a hand-rolled row-level `PartitionReader` and lose the inner
  * plan. This is also the shape production lakehouse sources take: the
  * stream's unit of progress is the commit log, not a row split.
  *
  * Semantics (each micro-batch may span several commits; every row
  * carries its `_commit_version`):
  *
  *  - offset `v` = "all changes up to and including version v emitted".
  *  - first batch: the full snapshot of the CURRENT version as INSERTs
  *    (`feed_type = "snapshot"`), or — with `startingVersion = N` —
  *    the per-version diffs from N forward (N = 0 boots from its own
  *    initial delta, `feed_type = "diff"`).
  *  - later batches: one file-scoped diff PER VERSION
  *    ([[MergeTable.changesBetweenManifests]], preimages on), unioned —
  *    cost O(files touched by those commits + their changes), never
  *    O(table).
  *  - beyond-retention boot: a version whose predecessor was vacuumed
  *    under a lagging stream re-delivers the full snapshot
  *    (`feed_type = "snapshot"`) — a consumer must treat it as a RESET,
  *    exactly the sink-side feed's contract
  *    ([[graft.streaming.StreamingChangeFeed]]); a version whose OWN log
  *    record is gone is skipped (subsumed by the next readable
  *    version's boot).
  *  - `maxVersionsPerTrigger` caps how many commits one micro-batch
  *    folds (the recovery-after-lag throttle; the restart batch is
  *    uncapped because its range was already checkpointed).
  *  - `maxBytesPerTrigger` caps the DATA VOLUME a micro-batch folds:
  *    versions join the batch until their summed diff cost (bytes of
  *    files added + files removed by each commit — both sides are read
  *    for preimages) would exceed the budget, so one huge compaction
  *    commit can no longer ride in with dozens of follower commits. At
  *    least one version always delivers (a commit larger than the budget
  *    still flows — pacing, never starvation). Entries written before
  *    the `bytes` manifest field parse as 0 and don't throttle.
  *
  * The column set is PINNED at stream start (table columns + `<c>_pre`
  * preimages + `change_type`, `feed_type`, `_commit_version`). A
  * mid-stream rename/drop/widen changes the diff's column set and fails
  * the batch loudly with a restart instruction — silently nulling a
  * renamed column into the old name would corrupt every incremental
  * consumer downstream.
  */
class GraftStreamSource(
    ctx: SQLContext,
    val tablePath: String,
    startingVersion: Option[Long],
    maxVersionsPerTrigger: Long,
    maxBytesPerTrigger: Option[Long] = None) extends Source {

  require(maxVersionsPerTrigger >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")
  maxBytesPerTrigger.foreach(b => require(b >= 1,
    s"maxBytesPerTrigger must be >= 1, got $b"))
  private val spark = ctx.sparkSession
  private val boot = MergeTable.latestManifest(tablePath).getOrElse(
    sys.error(s"no committed version under $tablePath — the stream needs " +
      "an existing table (its schema pins the feed's columns)"))
  // the ONE change-feed framing, shared with the batch CDF read
  private val shape = GraftChangeFeed.shapeFor(tablePath, boot, "stream")
  startingVersion.foreach(v => require(v >= 0, s"startingVersion $v < 0"))

  override val schema: StructType = shape.schema

  /** Highest offset this source has handed to the engine — the anchor
    * for the per-trigger version cap. None right after (re)start: the
    * first trigger is uncapped (its range is either the initial batch or
    * already checkpointed). */
  @volatile private var lastSeen: Option[Long] = None

  /** One version's read volume: bytes of the files its commit added plus
    * the files it removed (the diff reads BOTH sides for preimages); a
    * beyond-retention boot costs its full snapshot; a vacuumed (skipped)
    * version costs nothing. */
  private def diffCost(po: Option[MergeTable.TableManifest],
      co: Option[MergeTable.TableManifest]): Long = (po, co) match {
    case (Some(p), Some(c)) =>
      val pPaths = p.files.map(_.path).toSet
      val cPaths = c.files.map(_.path).toSet
      c.files.filterNot(f => pPaths.contains(f.path)).map(_.bytes).sum +
        p.files.filterNot(f => cPaths.contains(f.path)).map(_.bytes).sum
    case (None, Some(c)) => c.files.map(_.bytes).sum // snapshot (re)boot
    case _ => 0L // version gone: skipped, delivers nothing
  }

  override def getOffset: Option[V1Offset] = {
    val latest = MergeTable.latestManifest(tablePath).map(_.version)
    val capped = (latest, lastSeen) match {
      case (Some(l), Some(seen)) =>
        val hard = math.min(l, seen + maxVersionsPerTrigger)
        val end = maxBytesPerTrigger match {
          case Some(budget) if hard > seen =>
            // spend the byte budget version by version; the FIRST version
            // always joins (an over-budget single commit must still flow)
            var v = seen + 1
            var cur = tryManifest(v)
            var spent = diffCost(tryManifest(seen), cur)
            var stop = false
            while (!stop && v < hard) {
              val next = tryManifest(v + 1)
              val c = diffCost(cur, next)
              if (spent + c > budget) stop = true
              else { spent += c; v += 1; cur = next }
            }
            v
          case _ => hard
        }
        Some(end)
      case (l, None) => l
    }
    capped.map(v => LongOffset(v))
  }

  private def vOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset from the checkpoint
  }

  private def tryManifest(v: Long): Option[MergeTable.TableManifest] =
    try MergeTable.manifestAt(tablePath, v)
    catch { case _: MergeTable.MissingVersionException => None }

  private def versionChanges(v: Long): Option[DataFrame] =
    GraftChangeFeed.versionChanges(spark, shape, v)

  private def snapshotFrame(m: MergeTable.TableManifest,
      feedType: String): DataFrame =
    GraftChangeFeed.snapshotFrame(spark, shape, m, feedType)

  private def emptyFrame: DataFrame = GraftChangeFeed.emptyFrame(spark, shape)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = vOf(end)
    lastSeen = Some(math.max(endV, lastSeen.getOrElse(Long.MinValue)))
    val frames: Seq[DataFrame] = start.map(vOf) match {
      case Some(s) =>
        // an end BELOW the checkpointed start means the table was
        // dropped and recreated under the live checkpoint — its version
        // counter restarted, and treating the new incarnation's commits
        // as diffs of the old one would deliver garbage
        require(endV >= s,
          s"graft stream over $tablePath: available version v$endV is " +
            s"below the checkpointed offset v$s — the table was recreated " +
            "under this checkpoint; start a fresh checkpoint")
        // a startingVersion AHEAD of the head at stream start still
        // gates later batches: versions below it are never delivered
        val lo = math.max(s + 1, startingVersion.getOrElse(Long.MinValue))
        (lo to endV).flatMap(versionChanges)
      case None => startingVersion match {
        case Some(from) => (from to endV).flatMap(versionChanges)
        case None =>
          // initial batch: the current snapshot as INSERTs
          tryManifest(endV).map(m =>
            snapshotFrame(m, if (endV == 0L) "diff" else "snapshot")).toSeq
      }
    }
    val out = if (frames.isEmpty) emptyFrame else frames.reduce(_ unionByName _)
    // the V1 contract: a Source's batch frame must carry the streaming
    // tag; the plan underneath stays the engine's own (lazy) diff read
    org.apache.spark.sql.graftbridge.Bridge.asStreaming(out)
  }

  override def stop(): Unit = ()
  override def toString: String =
    s"GraftStreamSource[$tablePath from v${boot.version}]"
}
