package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.ops.MergeTable

/** Mid-snapshot offset: the initial snapshot of `version` has delivered
  * its first `files` manifest files (0 < files < total). The steady
  * state keeps writing plain [[LongOffset]]s — a checkpoint from any
  * prior build parses unchanged, and a stream that never configures
  * `maxBytesPerTrigger` never writes this form at all. */
private[sources] case class GraftSnapshotOffset(version: Long, files: Long)
    extends V1Offset {
  override val json: String = s"""{"version":$version,"file":$files}"""
}

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
  *  - offset `v` = "all changes up to and including version v emitted";
  *    the composite `{"version":v,"file":f}` form additionally means
  *    "…and the first f files of v's initial snapshot".
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
  *    folds. With a `startingVersion` it applies from the FIRST batch
  *    (the boot range pages like any lag); the restart batch after a
  *    checkpoint stays uncapped because its range was already
  *    checkpointed.
  *  - `maxBytesPerTrigger` caps the DATA VOLUME a micro-batch folds:
  *    versions join the batch until their summed diff cost (bytes of
  *    files added + files removed by each commit — both sides are read
  *    for preimages) would exceed the budget, so one huge compaction
  *    commit can no longer ride in with dozens of follower commits. At
  *    least one version always delivers (a commit larger than the budget
  *    still flows — pacing, never starvation). Entries written before
  *    the `bytes` manifest field parse as 0 and don't throttle.
  *  - **paced initial snapshot**: under `maxBytesPerTrigger`, the
  *    default-start snapshot itself pages FILE BY FILE through
  *    [[GraftSnapshotOffset]]s — batch 0 of a 100 TB table delivers a
  *    budget's worth of its manifest files, not the whole table, and a
  *    mid-snapshot restart resumes at the checkpointed file index
  *    exactly-once (the manifest's file list is immutable per version,
  *    so the slice boundaries are stable across restarts). Every slice
  *    carries the same feed_type as the unpaced snapshot would. The
  *    BEYOND-RETENTION reset snapshot is intentionally NOT paced: the
  *    reset contract is "this batch replaces prior state", which only
  *    holds single-batch. If the snapshot's own manifest is vacuumed
  *    mid-paging (a stream lagging past retention), delivery resets to
  *    the head's full snapshot, the standard reset semantics.
  *
  * Offset-safety note: a getOffset with NO seen state means a genuinely
  * FRESH stream — on every restart Spark's MicroBatchExecution first
  * replays `getBatch` with the checkpointed offsets (the documented V1
  * source-initialization call in `populateStartOffsets`), which seeds
  * [[lastSeen]] before any new offset is requested. The paced
  * first-batch offsets therefore can never regress below a checkpoint.
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

  /** Highest offset this source has handed to the engine, as
    * (version, filesDeliveredIfMidSnapshot). None ONLY on a genuinely
    * fresh stream: every restart replays the checkpointed range through
    * [[getBatch]] (which seeds this) before the next [[getOffset]]. */
  @volatile private var lastSeen: Option[(Long, Option[Long])] = None

  /** Total order over offsets: a completed version sorts above every
    * mid-snapshot prefix of it. */
  private def ord(o: (Long, Option[Long])): (Long, Long) =
    (o._1, o._2.getOrElse(Long.MaxValue))

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

  /** The end version of the next diff batch: `seen`+1 onward under the
    * version cap, then the byte budget version by version; the FIRST
    * version always joins (an over-budget single commit must still
    * flow). */
  private def pacedDiffEnd(seen: Long, head: Long): Long = {
    val hard = math.min(head, seen + maxVersionsPerTrigger)
    maxBytesPerTrigger match {
      case Some(budget) if hard > seen =>
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
  }

  /** Walk a snapshot's file list from index `from`, spending the byte
    * budget; the first file always joins. Returns the exclusive end
    * index of the slice. */
  private def paceFiles(files: Seq[MergeTable.DataFileEntry], from: Int,
      budget: Long): Int = {
    var i = from
    var spent = 0L
    var stop = false
    while (i < files.size && !stop) {
      val c = files(i).bytes
      if (i > from && spent + c > budget) stop = true
      else { spent += c; i += 1 }
    }
    i
  }

  /** The next offset for (a slice of) version `v`'s initial snapshot:
    * a [[GraftSnapshotOffset]] while files remain beyond the budget, the
    * plain completed offset once the slice reaches the end. */
  private def snapshotEnd(m: MergeTable.TableManifest,
      from: Int): V1Offset = maxBytesPerTrigger match {
    case Some(budget) =>
      val f = paceFiles(m.files, from, budget)
      if (f >= m.files.size) LongOffset(m.version)
      else GraftSnapshotOffset(m.version, f)
    case None => LongOffset(m.version)
  }

  override def getOffset: Option[V1Offset] = {
    val latest = MergeTable.latestManifest(tablePath)
    (latest, lastSeen) match {
      case (None, _) => None
      case (Some(l), None) => startingVersion match {
        // fresh explicit-version start: the boot range pages under the
        // SAME caps as steady state, anchored one below the start
        case Some(from) => Some(LongOffset(pacedDiffEnd(from - 1, l.version)))
        // fresh default start: page the INITIAL SNAPSHOT by bytes
        case None => Some(snapshotEnd(l, 0))
      }
      case (Some(l), Some((seenV, Some(seenF)))) =>
        // mid-snapshot: finish paging version seenV's snapshot before
        // any diff (newer commits queue behind it)
        tryManifest(seenV) match {
          case Some(m) => Some(snapshotEnd(m, seenF.toInt))
          case None =>
            // the snapshot's own manifest was vacuumed mid-paging: the
            // head snapshot RESETS the consumer (single-batch by the
            // reset contract, so deliberately unpaced)
            Some(LongOffset(l.version))
        }
      case (Some(l), Some((seenV, None))) =>
        Some(LongOffset(pacedDiffEnd(seenV, l.version)))
    }
  }

  private val SnapJson =
    """\s*\{\s*"version"\s*:\s*(-?\d+)\s*,\s*"file"\s*:\s*(\d+)\s*\}\s*""".r

  /** Decode any offset form: plain long (this build's steady state AND
    * every pre-pacing checkpoint — an old checkpoint resumes untouched)
    * or the composite mid-snapshot JSON. */
  private def decode(o: V1Offset): (Long, Option[Long]) = o match {
    case l: LongOffset => (l.offset, None)
    case s: GraftSnapshotOffset => (s.version, Some(s.files))
    case other => other.json.trim match {
      case SnapJson(v, f) => (v.toLong, Some(f.toLong))
      case plain => (plain.toLong, None)
    }
  }

  private def tryManifest(v: Long): Option[MergeTable.TableManifest] =
    if (v < 0) None
    else try MergeTable.manifestAt(tablePath, v)
    catch { case _: MergeTable.MissingVersionException => None }

  private def versionChanges(v: Long): Option[DataFrame] =
    GraftChangeFeed.versionChanges(spark, shape, v)

  /** `feed_type` of version v's initial snapshot — v0 is its own first
    * delta ("diff"), anything later is a true snapshot boot. */
  private def bootFeed(v: Long): String = if (v == 0L) "diff" else "snapshot"

  private def snapshotFrame(m: MergeTable.TableManifest,
      feedType: String): DataFrame =
    GraftChangeFeed.snapshotFrame(spark, shape, m, feedType)

  /** Files [from, until) of `m`'s snapshot as INSERTs — the slice IS the
    * snapshot read over a file subset (deletion vectors and column
    * mapping apply per file), and the manifest's file order is immutable
    * for a committed version, so slice boundaries are restart-stable. */
  private def snapshotSlice(m: MergeTable.TableManifest, from: Long,
      until: Long, feedType: String): Option[DataFrame] =
    if (until <= from) None
    else Some(snapshotFrame(
      m.copy(files = m.files.slice(from.toInt, until.toInt)), feedType))

  private def emptyFrame: DataFrame = GraftChangeFeed.emptyFrame(spark, shape)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val (endV, endF) = decode(end)
    val startDec = start.map(decode)
    lastSeen = Some(Seq(Some((endV, endF)), startDec, lastSeen)
      .flatten.maxBy(ord))
    val frames: Seq[DataFrame] = startDec match {
      case Some((sv, sfOpt)) =>
        // an end BELOW the checkpointed start means the table was
        // dropped and recreated under the live checkpoint — its version
        // counter restarted, and treating the new incarnation's commits
        // as diffs of the old one would deliver garbage
        require(endV >= sv,
          s"graft stream over $tablePath: available version v$endV is " +
            s"below the checkpointed offset v$sv — the table was recreated " +
            "under this checkpoint; start a fresh checkpoint")
        sfOpt match {
          case Some(sf) => tryManifest(sv) match {
            case Some(m) =>
              // mid-snapshot continuation: the next file slice of sv's
              // snapshot, then (restart only) any diffs through endV
              val until =
                if (endV == sv) endF.getOrElse(m.files.size.toLong)
                else m.files.size.toLong
              val slice = snapshotSlice(m, sf, until, bootFeed(sv))
              val diffs =
                if (endV > sv) (sv + 1 to endV).flatMap(versionChanges)
                else Seq.empty
              slice.toSeq ++ diffs
            case None =>
              // sv's manifest vacuumed mid-paging: RESET at the end
              // version (full snapshot; the reset contract is
              // single-batch)
              tryManifest(endV).map(m2 =>
                snapshotFrame(m2, "snapshot")).toSeq
          }
          case None =>
            require(endF.isEmpty,
              s"graft stream over $tablePath: offset regression — end " +
                s"$endV@${endF.get} is mid-snapshot below the completed v$sv")
            // a startingVersion AHEAD of the head at stream start still
            // gates later batches: versions below it are never delivered
            val lo = math.max(sv + 1, startingVersion.getOrElse(Long.MinValue))
            (lo to endV).flatMap(versionChanges)
        }
      case None => startingVersion match {
        case Some(from) => (from to endV).flatMap(versionChanges)
        case None =>
          // initial batch: the current snapshot as INSERTs — all of it,
          // or the first paced slice under maxBytesPerTrigger
          tryManifest(endV).flatMap(m =>
            snapshotSlice(m, 0L, endF.getOrElse(m.files.size.toLong),
              bootFeed(endV))).toSeq
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
