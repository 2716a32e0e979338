package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ops.MergeTable

/** Streaming CHANGE DATA FEED over a [[MergeTable]] — the readChangeFeed
  * consumer, built Spark-first on the file-stream source instead of a
  * custom DSv2 source: every commit publishes exactly one immutable
  * log record (`_graft_log/v<N>.json`, hard-linked atomically), so
  * `readStream` over the log directory IS a checkpointed, exactly-once
  * stream of new table versions. Each discovered version v resolves to
  * its row-level changes via [[MergeTable.changesBetween]](v−1, v)
  * (v0 = the full initial snapshot as INSERTs) and lands under
  * `out/version=v`.
  *
  * Delivery contract: the file source's checkpoint guarantees each
  * log record is DISCOVERED once; the per-version output directory is
  * written with overwrite, so a crash-replay of a half-processed batch
  * converges (same version → same rows → same directory). Downstream
  * consumers read the feed as a version-partitioned table.
  *
  * Scale shape: discovery moves one tiny JSON file per commit, and the
  * per-version diff is FILE-SCOPED ([[MergeTable.changesBetween]] reads
  * only the two manifests' file-set delta) — the feed's cost per commit
  * is O(files touched by that commit + its changes), never O(table), so
  * a high commit cadence over a 100 TB table streams at the cost of the
  * changes themselves.
  *
  * Retention resilience: a LAGGING feed can meet versions whose manifests
  * or data files vacuum already retired. Log-gone versions skip (their
  * changes are subsumed by the next readable version's snapshot boot);
  * data-gone versions are caught at READ time — `manifestAt(v).nonEmpty`
  * proves only the log record survives, not the files it references
  * (written hours earlier, droppable by v+1's commit + vacuum) — and
  * fall back the same way instead of crash-looping the query.
  */
object StreamingChangeFeed {

  /** The raw stream of newly committed version numbers. A log record is
    * single-line JSON, so the text source yields exactly ONE row per
    * newly discovered file — no aggregation, no state; the version comes
    * from the file name. `.tmp-` staging files are excluded by glob.
    */
  def versionStream(s: SparkSession, table: String): DataFrame =
    s.readStream
      .option("pathGlobFilter", "v*.json")
      .text(s"$table/_graft_log")
      .select(input_file_name().as("f"))
      // try_cast + null filter: a foreign v*.json whose name doesn't
      // parse (no digits, or digits past Long range) must be IGNORED,
      // not NPE/throw the stream permanently — the batch reader's
      // foreign-file invariant, upheld here too
      .select(regexp_extract(col("f"), "v(\\d+)\\.json$", 1)
        .try_cast("long").as("version"))
      .where(col("version").isNotNull)

  /** Start the feed sink: new versions → row-level changes under
    * `out/version=<v>/`. */
  def startChangeFeedSink(
      s: SparkSession, table: String, out: String,
      checkpoint: String): StreamingQuery =
    versionStream(s, table).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeNewVersions(s, table, out, batch)
      }
      .start()

  /** True when `e`'s cause chain is a missing-file/version condition —
    * the vacuumed-under-a-lagging-reader signature. Matched by TYPE, not
    * message text: executor-side `FileNotFoundException` (wrapped in
    * SparkException — the chain walk reaches it), planner-side
    * `SparkThrowable` with the PATH_NOT_FOUND / FILE_NOT_EXIST error
    * conditions, and the manifest resolver's own typed
    * [[MergeTable.MissingVersionException]]. A transient error whose
    * MESSAGE merely pattern-matches ("does not exist" during a snapshot
    * boot, say) no longer classifies — anything not provably
    * missing-data (OOM, cancellation, corrupt data) fails the query
    * loudly instead of silently dropping a version. */
  private[graft] def isMissingData(e: Throwable): Boolean = {
    var c: Throwable = e
    var hops = 0
    while (c != null && hops < 16) {
      c match {
        case _: java.io.FileNotFoundException => return true
        case _: MergeTable.MissingVersionException => return true
        case st: org.apache.spark.SparkThrowable =>
          val cond = Option(st.getCondition).getOrElse("")
          if (cond == "PATH_NOT_FOUND" ||
            cond.startsWith("FAILED_READ_FILE.FILE_NOT_EXIST")) return true
        case _ => ()
      }
      hops += 1
      c = if (c.getCause eq c) null else c.getCause
    }
    false
  }

  private def writeNewVersions(
      s: SparkSession, table: String, out: String, batch: DataFrame): Unit = {
    val versions = batch.select(col("version")).collect()
      .map(_.getLong(0)).sorted // bounded: one value per commit
    versions.foreach { v =>
      val dir = java.nio.file.Paths.get(out, s"version=$v")
      // overwrite-by-version makes replay idempotent; an existing COMPLETE
      // dir (its _SUCCESS marker) is this version already delivered
      if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS"))) {
        // a version whose PREDECESSOR is unreadable (manifest vacuumed,
        // OR files it carries by reference already collected) boots from
        // the full snapshot — the startingVersion-beyond-retention
        // behavior; diffs resume from the next version. feed_type marks
        // it: a consumer applying the feed incrementally must treat a
        // snapshot as a RESET, not as incremental inserts (without the
        // marker, a mid-stream boot would silently double-apply every
        // pre-existing row)
        // a version RETIRED BY VACUUM before the (lagging/replayed) feed
        // reached it delivers nothing: its changes are subsumed by the
        // next surviving version's snapshot boot — erroring here would
        // wedge the stream on every restart. Every read below is tried
        // the same way: manifest existence is NOT proof the referenced
        // data files survived (see scaladoc), so a mid-diff missing file
        // downgrades to the snapshot boot, and a missing file in v's OWN
        // snapshot SKIPS v with an observable `_SKIPPED` marker — the
        // NEXT version then fails its diff against v the same way and
        // snapshot-boots itself, healing the feed one surviving version
        // later. Only PROVABLY-missing-data conditions ([[isMissingData]],
        // typed) downgrade; any other error fails the batch loudly.
        // never stamp _SKIPPED over a COMPLETE delivery: between this
        // batch's _SUCCESS probe above and a vacuumed-data failure below,
        // another replay of the same offsets may have finished delivering
        // v (parquet + _SUCCESS). A dir carrying both markers would tell
        // reconciling consumers two contradictory things — readFeed
        // serves it as complete while skippedVersions reports it skipped
        // — so the earlier delivery wins and the marker is dropped.
        def markSkipped(reason: String): Unit = {
          java.nio.file.Files.createDirectories(dir)
          val m = dir.resolve("_SKIPPED")
          if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS")) &&
              !java.nio.file.Files.exists(m))
            java.nio.file.Files.write(m,
              s"version $v skipped: $reason\n".getBytes("UTF-8"))
        }
        // each version pair resolves ONCE and the manifests pass down
        // (readManifest / changesBetweenManifests): the single-slot
        // manifest cache holds only the newest version, so re-resolving
        // v−1 inside changesBetween would cold-walk the full checkpoint
        // listing twice per delivered version — on the feed hot path.
        // ORDER matters for the same reason: v−1 resolves FIRST (a pure
        // cache hit — the previous delivery put it there), THEN v (a
        // forward fold of one delta); v-first would bump the cache past
        // v−1 and force the cold walk every iteration anyway.
        def tryManifest(ver: Long): Option[MergeTable.TableManifest] =
          try MergeTable.manifestAt(table, ver)
          catch { case _: MergeTable.MissingVersionException => None }
        try {
          // cheap existence probe first: when v's record is already gone
          // (the skip path), resolving v−1 would be a wasted cold walk
          val prevOpt =
            if (v == 0L || !MergeTable.hasVersion(table, v)) None
            else tryManifest(v - 1)
          tryManifest(v) match {
            case None =>
              markSkipped("log record vacuumed before the feed reached it")
            case Some(mv) =>
              // boots carry null `<col>_pre` columns so every feed
              // version dir shares one schema with the preimage-bearing
              // diffs — a reader sampling a boot dir's footer must still
              // see the preimage columns the diff dirs carry
              def snapshotBoot(feedType: String): Unit = {
                val snap = MergeTable.readManifest(s, table, mv)
                val payload = snap.columns.filterNot(mv.keys.contains)
                payload.foldLeft(snap) { (d, c) =>
                  d.withColumn(s"${c}_pre", lit(null).cast(d.schema(c).dataType))
                }
                  .withColumn("change_type", lit("INSERT"))
                  .withColumn("feed_type", lit(feedType))
                  .write.mode("overwrite").parquet(dir.toString)
              }
              prevOpt match {
                case None => snapshotBoot(if (v == 0L) "diff" else "snapshot")
                case Some(mPrev) =>
                  try
                    // preimages: UPDATEs/DELETEs carry their old payload
                    // as <col>_pre, so an incremental consumer can
                    // RETRACT the previous contribution without
                    // re-reading version v−1
                    MergeTable.changesBetweenManifests(s, table, mPrev, mv,
                      preimages = true)
                      .withColumn("feed_type", lit("diff"))
                      .write.mode("overwrite").parquet(dir.toString)
                  catch {
                    case e: Throwable if isMissingData(e) =>
                      snapshotBoot("snapshot")
                  }
              }
          }
        } catch {
          // v's own data files gone (vacuumed under the lagging reader)
          case e: Throwable if isMissingData(e) =>
            markSkipped(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      }
    }
  }

  /** Read the accumulated feed (version-partitioned). Only COMPLETE
    * version dirs (their `_SUCCESS` marker) are read: a crash between a
    * replayed overwrite's data files and its commit marker leaves a
    * half-written dir that the next replay will redo — a reader in
    * between must not see its partial or torn rows (the same
    * complete-generation discipline the GenStore reader applies).
    */
  def readFeed(s: SparkSession, out: String): DataFrame = {
    val root = java.nio.file.Paths.get(out)
    val complete: Seq[String] =
      if (!java.nio.file.Files.isDirectory(root)) Seq.empty
      else {
        val st = java.nio.file.Files.list(root)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala
            .filter(p => p.getFileName.toString.startsWith("version=") &&
              java.nio.file.Files.exists(p.resolve("_SUCCESS")))
            .map(_.toString).toSeq.sorted
        } finally st.close()
      }
    require(complete.nonEmpty, s"no complete feed versions under $out")
    // mergeSchema: a mid-stream column RENAME (metadata-only on the
    // table) means version dirs before and after it carry different
    // column names — a sampled-schema read would silently drop one
    // generation; the merged read exposes both (each null outside its
    // generation), so a reconciling consumer sees everything and can
    // stitch via the rename it knows about
    s.read.option("basePath", out).option("mergeSchema", "true")
      .parquet(complete: _*)
  }

  /** Versions the feed had to SKIP (their data was vacuumed before the
    * lagging reader arrived) — each left an observable `_SKIPPED` marker
    * instead of a silent gap. A consumer reconciling the feed reads this
    * to know which ranges were subsumed by a later snapshot boot. */
  def skippedVersions(out: String): Seq[Long] = {
    val root = java.nio.file.Paths.get(out)
    if (!java.nio.file.Files.isDirectory(root)) Seq.empty
    else {
      val st = java.nio.file.Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("version=") &&
            java.nio.file.Files.exists(p.resolve("_SKIPPED")) &&
            // a dir that ALSO carries _SUCCESS was completely delivered
            // (a racing replay finished after the marker landed, or a
            // legacy marker predates this guard) — readFeed serves it,
            // so reporting it skipped would contradict the feed itself
            !java.nio.file.Files.exists(p.resolve("_SUCCESS")))
          .map(_.getFileName.toString.stripPrefix("version=").toLong)
          .toSeq.sorted
      } finally st.close()
    }
  }
}
