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
    maxVersionsPerTrigger: Long) extends Source {

  require(maxVersionsPerTrigger >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")
  private val spark = ctx.sparkSession
  private val boot = MergeTable.latestManifest(tablePath).getOrElse(
    sys.error(s"no committed version under $tablePath — the stream needs " +
      "an existing table (its schema pins the feed's columns)"))
  private val tableSchema =
    DataType.fromJson(boot.schemaJson).asInstanceOf[StructType]
  private val keys = boot.keys
  private val payload =
    tableSchema.fieldNames.filterNot(keys.contains).toSeq
  startingVersion.foreach(v => require(v >= 0, s"startingVersion $v < 0"))

  override val schema: StructType = StructType(
    tableSchema.fields.map(f => f.copy(nullable = true)) ++
      payload.map(c =>
        StructField(s"${c}_pre", tableSchema(c).dataType, nullable = true)) ++
      Seq(StructField("change_type", StringType, nullable = false),
        StructField("feed_type", StringType, nullable = false),
        StructField("_commit_version", LongType, nullable = false)))

  /** Highest offset this source has handed to the engine — the anchor
    * for the per-trigger version cap. None right after (re)start: the
    * first trigger is uncapped (its range is either the initial batch or
    * already checkpointed). */
  @volatile private var lastSeen: Option[Long] = None

  override def getOffset: Option[V1Offset] = {
    val latest = MergeTable.latestManifest(tablePath).map(_.version)
    val capped = (latest, lastSeen) match {
      case (Some(l), Some(seen)) =>
        Some(math.min(l, seen + maxVersionsPerTrigger))
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

  /** Project one per-version frame onto the pinned feed schema; fail
    * LOUDLY on a column-set drift (rename/drop/widen mid-stream). */
  private def aligned(df: DataFrame, feedType: String, v: Long): DataFrame = {
    val have = df.columns.toSet
    val dataCols = df.columns.filterNot(c =>
      c == "change_type" || c.endsWith("_pre")).toSet
    val pinned = tableSchema.fieldNames.toSet
    require(dataCols == pinned,
      s"graft stream over $tablePath: version $v's column set " +
        s"${dataCols.toSeq.sorted.mkString(",")} differs from the pinned " +
        s"stream schema ${pinned.toSeq.sorted.mkString(",")} — the table's " +
        "schema changed mid-stream; restart the stream to adopt it")
    df.select(schema.fields.map { f =>
      f.name match {
        case "feed_type" => lit(feedType).as("feed_type")
        case "_commit_version" => lit(v).as("_commit_version")
        case n if have.contains(n) => col(n).cast(f.dataType).as(n)
        case n => lit(null).cast(f.dataType).as(n) // snapshot rows: _pre
      }
    }.toSeq: _*)
  }

  /** The full snapshot of `m` as INSERT rows. */
  private def snapshotFrame(m: MergeTable.TableManifest,
      feedType: String): DataFrame =
    aligned(MergeTable.readManifest(spark, tablePath, m)
      .withColumn("change_type", lit("INSERT")), feedType, m.version)

  /** One version's changes: the file-scoped diff against v−1, the
    * snapshot boot when v−1 is beyond retention (manifest OR the data
    * files underneath it — a retained log record is no proof the files
    * it references survived), None when v itself is gone (subsumed by
    * the next readable version's boot). Only PROVABLY-missing-data
    * conditions downgrade ([[graft.streaming.StreamingChangeFeed
    * .isMissingData]], typed) — anything else fails the stream loudly. */
  private def versionChanges(v: Long): Option[DataFrame] = {
    import graft.streaming.StreamingChangeFeed.isMissingData
    // resolve v−1 FIRST (a cache hit from the previous version's
    // delivery), then v as a one-delta forward fold — the same
    // resolution-order discipline as the sink-side feed
    val prevOpt = if (v == 0L) None else tryManifest(v - 1)
    try tryManifest(v).map { mv =>
      def boot(feed: String) = snapshotFrame(mv, feed)
      prevOpt match {
        case None => boot(if (v == 0L) "diff" else "snapshot")
        case Some(mp) =>
          try aligned(MergeTable.changesBetweenManifests(
            spark, tablePath, mp, mv, preimages = true), "diff", v)
          catch {
            case e: Throwable if isMissingData(e) => boot("snapshot")
          }
      }
    } catch {
      // v's own data is gone too: skip — the next readable version's
      // snapshot boot subsumes it (the sink marks these _SKIPPED; the
      // source has no marker channel, the version gap is the signal)
      case e: Throwable if isMissingData(e) => None
    }
  }

  private def emptyFrame: DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      schema)

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
