package graft.ops

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.Tables

/** Transactional keyed MERGE on plain parquet — the at-scale form of the
  * K1/K2 idempotent-upsert contract (reference `DESIGN.md:41`; the plain
  * rewrite forms live in [[Sinks.upsertParquet]] / [[Sinks.upsertPartitioned]]).
  * No lakehouse jars ship in this environment, so the table format is a
  * minimal own implementation of the same public design (the Delta/Iceberg
  * commit-log pattern):
  *
  *  - `_graft_log/v<N>.json` — one manifest per committed version listing
  *    the table's live data files with per-file cluster-key min/max stats
  *    and per-writer transaction watermarks;
  *  - `data/<commit-uuid>/part-*.parquet` — immutable data files, written
  *    once, never modified; a commit only ADDS files and drops references;
  *  - commit = write manifest to a temp name, then a single ATOMIC_MOVE to
  *    `v<N+1>.json`. The move fails if the version exists — optimistic
  *    concurrency: the losing writer re-reads the new snapshot and replays
  *    its merge (serializable by version CAS), exactly the protocol Delta
  *    runs against an object store.
  *
  * MERGE cost is O(touched files + batch), never O(table):
  *
  *  1. incoming keys → file pruning: a data file is TOUCHED iff some
  *     incoming cluster key falls inside its [min,max]. Because the writer
  *     range-clusters every commit's output by the cluster key, file
  *     intervals are tight and most files prune away — the same
  *     clustering-enables-MERGE discipline as OPTIMIZE/Z-order. The
  *     overlap test is a point-in-interval join of the (distinct) batch
  *     keys against the broadcast ≤|files|-row interval table (planned by
  *     [[graft.plans.RangeJoinStrategy]] when eligible), collecting only
  *     the bounded touched-file id list;
  *  2. survivors = touched-file rows whose key is NOT in the batch
  *     (left_anti on the merge keys);
  *  3. new files = batch ∪ survivors, range-clustered on the cluster key,
  *     one parquet file per range partition, per-file min/max recorded
  *     from the SAME pinned partitioning that wrote the files;
  *  4. new manifest = untouched files + new files.
  *
  * Untouched files are carried by reference — byte-identical, never read.
  *
  * Streaming exactly-once: a commit can carry a (writerId, version)
  * transaction; a merge whose version is ≤ the manifest's recorded
  * watermark for that writer is a no-op. With writerId = the sink's
  * checkpoint location and version = the micro-batch id, `foreachBatch`
  * replay after a crash converges without re-applying — the documented
  * Delta `txnAppId`/`txnVersion` idiom ([[graft.streaming.StreamingPipeline]]
  * wires it).
  *
  * Scale notes: the manifest is a full file listing per commit — right up
  * to ~10⁵ files; past that a real implementation splits the log into
  * incremental actions + periodic checkpoints (the Delta log layout), an
  * additive change to this commit protocol. Cluster-key stats are kept as
  * longs (ids / epoch keys — the common case); a typed-stats extension
  * widens the manifest, not the protocol.
  */
object MergeTable {

  /** One live data file: path relative to the table root, cluster-key
    * bounds, and row count (bounds are inclusive). */
  case class DataFileEntry(path: String, minKey: Long, maxKey: Long, numRows: Long)

  /** One committed table version. `txns` maps writerId → highest applied
    * transaction version (the replay watermark). */
  case class TableManifest(
      version: Long,
      schemaJson: String,
      keys: Seq[String],
      clusterBy: String,
      files: Seq[DataFileEntry],
      txns: Map[String, Long])

  private implicit val jsonFormats: org.json4s.Formats =
    org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints)

  private def logDir(table: String) = Paths.get(table, "_graft_log")

  private def versionOf(name: String): Option[Long] = {
    // digit guard: foreign files under the log dir are ignored, not thrown
    // on — including all-digit junk past Long range (legit names are
    // %020d, so 20 digits alone can't distinguish; Try absorbs overflow)
    val core = name.stripPrefix("v").stripSuffix(".json")
    if (name.startsWith("v") && name.endsWith(".json") &&
      core.nonEmpty && core.forall(_.isDigit))
      scala.util.Try(core.toLong).toOption
    else None
  }

  /** Latest committed manifest, or None for a not-yet-created table. */
  def latestManifest(table: String): Option[TableManifest] = {
    val ld = logDir(table)
    if (!Files.isDirectory(ld)) None
    else {
      val latest = {
        val stream = Files.list(ld)
        try stream.iterator().asScala
          .flatMap(p => versionOf(p.getFileName.toString))
          .foldLeft(Option.empty[Long])((a, v) => Some(a.fold(v)(math.max(_, v))))
        finally stream.close()
      }
      latest.flatMap(v => manifestAt(table, v))
    }
  }

  /** The manifest of one SPECIFIC committed version — the time-travel
    * primitive. Available until [[vacuum]] retires the version. */
  def manifestAt(table: String, v: Long): Option[TableManifest] = {
    val f = logDir(table).resolve(f"v$v%020d.json")
    if (!Files.exists(f)) None
    else {
      val txt = new String(Files.readAllBytes(f), "UTF-8")
      // the FILENAME is the CAS slot and therefore the authoritative
      // version; trusting a divergent embedded version would re-commit
      // into an occupied slot forever
      Some(org.json4s.jackson.Serialization.read[TableManifest](txt).copy(version = v))
    }
  }

  /** Snapshot read of the latest committed version. Empty-table reads
    * reproduce the schema from the manifest. */
  def read(s: SparkSession, table: String): DataFrame =
    readManifest(s, table, latestManifest(table)
      .getOrElse(sys.error(s"no committed version under $table")))

  /** TIME TRAVEL: snapshot read AS OF a specific committed version —
    * data files are immutable and a commit only drops references, so any
    * un-vacuumed version reads back exactly as committed (audit "what did
    * the table say when the model trained", reproducible re-runs,
    * incident rollback reads).
    */
  def readVersion(s: SparkSession, table: String, version: Long): DataFrame =
    readManifest(s, table, manifestAt(table, version)
      .getOrElse(sys.error(s"version $version not found under $table " +
        "(never committed, or retired by vacuum)")))

  private def readManifest(s: SparkSession, table: String, m: TableManifest): DataFrame =
    if (m.files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
    else
      s.read.schema(DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
        .parquet(m.files.map(f => s"$table/${f.path}"): _*)

  /** Attempt to publish `m` as version `m.version`; false = lost the CAS.
    *
    * The publish primitive is a HARD LINK, not a rename: POSIX rename(2)
    * (what ATOMIC_MOVE maps to) silently REPLACES an existing target, so a
    * rename-based commit would clobber a concurrent writer's version
    * instead of failing — link(2) is atomic AND errors with EEXIST, the
    * put-if-absent a version CAS needs. (On an object store the same slot
    * is a conditional PUT.)
    */
  private def tryCommit(table: String, m: TableManifest): Boolean = {
    val ld = logDir(table)
    Files.createDirectories(ld)
    val tmp = ld.resolve(s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, org.json4s.jackson.Serialization.write(m).getBytes("UTF-8"))
    val target = ld.resolve(f"v${m.version}%020d.json")
    try { Files.createLink(target, tmp); Files.deleteIfExists(tmp); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
      case _: java.nio.file.FileSystemException if Files.exists(target) =>
        Files.deleteIfExists(tmp); false
    }
  }

  /** MERGE INTO `table` USING `batch` ON `keys` — incoming rows win on key
    * collision (WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED INSERT ALL).
    * The batch must be key-unique (the standard MERGE precondition; a
    * multi-match is rejected, as `MERGE INTO` proper does). Returns true
    * if a new version committed, false if `txn` was already applied.
    *
    * `clusterBy` must be a long-castable column (it becomes the file
    * clustering key and the pruning statistic); merge MATCHING uses the
    * full `keys`.
    */
  def mergeUpsert(
      s: SparkSession,
      table: String,
      batch: DataFrame,
      keys: Seq[String],
      clusterBy: String,
      targetRowsPerFile: Long = 4096,
      txn: Option[(String, Long)] = None,
      maxAttempts: Int = 20): Boolean = {
    require(keys.nonEmpty, "merge keys must be non-empty")
    // pruning soundness: a file is skipped when no batch CLUSTER value
    // falls in its range — valid only if a matched old row's cluster
    // value EQUALS the batch row's, i.e. the cluster key is part of the
    // match key. And the stats/pruning arithmetic needs real longs: a
    // null or uncastable cluster value would silently prune wrong
    // (missed matches → duplicate keys) and NPE the stats pass.
    require(keys.contains(clusterBy),
      s"clusterBy '$clusterBy' must be one of the merge keys " +
        s"${keys.mkString("(", ",", ")")} — file pruning assumes a matched " +
        "row's cluster value equals the batch row's")
    // the two SCAN-shaped preconditions run once, AFTER the first replay
    // check below — a replayed (already-applied) streaming batch must
    // no-op without paying two full batch-plan executions first
    var preconditionsChecked = false

    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val snapshot = latestManifest(table)
      // replay guard FIRST, against the freshest manifest
      val replayed = (snapshot, txn) match {
        case (Some(m), Some((writer, v))) => m.txns.get(writer).exists(_ >= v)
        case _ => false
      }
      if (replayed) return false
      if (!preconditionsChecked) {
        requireClusterable(batch, clusterBy, "MERGE source")
        val dupKeys = batch.groupBy(keys.map(col): _*).count()
          .where(col("count") > 1).limit(1).count()
        require(dupKeys == 0,
          s"MERGE source is not key-unique on ${keys.mkString(",")} — " +
            "a key with multiple source rows has no deterministic winner")
        preconditionsChecked = true
      }

      val existingFiles = snapshot.map(_.files).getOrElse(Seq.empty)
      val touched: Set[String] =
        if (existingFiles.isEmpty) Set.empty
        else {
          import s.implicits._
          val intervals = existingFiles
            .map(f => (f.path, f.minKey, f.maxKey)).toDF("path", "mn", "mx")
          batch.select(col(clusterBy).cast("long").as("k")).distinct()
            .join(broadcast(intervals),
              col("k") >= col("mn") && col("k") <= col("mx"))
            .select(col("path")).distinct()
            .as[String].collect().toSet // bounded: ≤ |files| rows
        }

      // ADDITIVE schema evolution: a batch may carry columns the table has
      // never seen — they join the schema, and rows from files written
      // before the widening read back with nulls (parquet name-based
      // reads fill declared-but-absent columns with null, so OLD files
      // are never rewritten for a schema change). Dropping or retyping a
      // column is rejected — those need an explicit migration.
      val tableSchema = snapshot
        .map(m => DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
      tableSchema.foreach { ts =>
        batch.schema.fields.foreach { f =>
          ts.find(_.name == f.name).foreach { existing =>
            require(existing.dataType == f.dataType,
              s"column ${f.name}: batch type ${f.dataType} != table type " +
                s"${existing.dataType} — retyping needs an explicit migration")
          }
        }
      }
      val schema = tableSchema match {
        case None => batch.schema
        case Some(ts) => StructType(ts.fields ++
          batch.schema.fields.filterNot(f => ts.exists(_.name == f.name)))
      }
      val merged =
        if (touched.isEmpty) withAllColumns(batch, schema)
        else {
          val old = s.read.schema(schema)
            .parquet(touched.toSeq.sorted.map(p => s"$table/$p"): _*)
          val incomingKeys = batch.select(keys.map(col): _*).distinct()
          withAllColumns(batch, schema)
            .unionByName(old.join(incomingKeys, keys, "left_anti"))
        }

      val (commitId, newFiles) =
        writeClusteredFiles(table, merged, clusterBy, targetRowsPerFile)
      val untouched = existingFiles.filterNot(f => touched.contains(f.path))
      val newTxns = snapshot.map(_.txns).getOrElse(Map.empty) ++
        txn.map { case (w, v) => w -> v }
      val next = TableManifest(
        version = snapshot.map(_.version + 1).getOrElse(0L),
        schemaJson = schema.json,
        keys = keys,
        clusterBy = clusterBy,
        files = untouched ++ newFiles,
        txns = newTxns)
      if (tryCommit(table, next)) return true
      // lost the version CAS: drop this attempt's files and replay the
      // merge against the winner's snapshot
      deleteDir(Paths.get(table, "data", commitId))
    }
    sys.error(s"merge into $table lost the commit race $maxAttempts times")
  }

  /** The cluster column must be non-null and long-castable in every row —
    * `try_cast` (not `cast`: ANSI mode throws mid-job on garbage, this
    * names the offending contract instead). */
  private def requireClusterable(df: DataFrame, clusterBy: String, what: String): Unit = {
    val bad = df.where(col(clusterBy).isNull ||
      col(clusterBy).try_cast("long").isNull).limit(1).count()
    require(bad == 0,
      s"$what: cluster key '$clusterBy' must be non-null and long-castable " +
        "in every row (it is the file-pruning statistic)")
  }

  /** `df` widened to `schema`'s full column set (missing columns as typed
    * nulls, order normalized) — the incoming half of additive schema
    * evolution: a batch written BEFORE a later batch added a column, or a
    * batch missing an existing optional column, lands with nulls. */
  private def withAllColumns(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)

  /** Write `df` as one range-clustered file set under `data/<commitId>`
    * and return (commitId, manifest entries with per-file cluster-key
    * stats). localCheckpoint pins the sampled range boundaries so the
    * stats pass and the file write see the SAME partitioning (the
    * token-budget discipline). Shared by MERGE, DELETE and OPTIMIZE — one
    * writer, one stats discipline.
    */
  private def writeClusteredFiles(
      table: String, df: DataFrame, clusterBy: String,
      targetRowsPerFile: Long): (String, Seq[DataFileEntry]) = {
    // checkpoint the MERGED frame before counting: count() would
    // otherwise execute the full plan (touched-file reads + anti join)
    // once, and the range-repartition below a second time — doubling
    // every commit's I/O on the streaming hot path
    val pinned = df.localCheckpoint()
    try {
      val n = pinned.count()
      val nFiles = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      writeStaged(table,
        pinned.repartitionByRange(nFiles, col(clusterBy).cast("long").asc),
        clusterBy)
    } finally org.apache.spark.sql.graftbridge.Bridge
      .unpersistLocalCheckpoint(pinned)
  }

  /** Write the staged frame (one file per range partition) and derive the
    * per-file stats from the SAME pinned partitioning. */
  private def writeStaged(
      table: String, toStage: DataFrame, clusterBy: String): (String, Seq[DataFileEntry]) = {
    val staged = toStage.localCheckpoint()
    try {
      val commitId = java.util.UUID.randomUUID().toString.take(12)
      val rel = s"data/$commitId"
      staged.write.mode("overwrite").parquet(s"$table/$rel")
      // per-partition stats keyed by partition id; partition i wrote the
      // file whose name parses to part index i (empty partitions write
      // no file and emit no stats group — both sides skip them)
      val stats = staged
        .select(spark_partition_id().as("pid"),
          col(clusterBy).cast("long").as("k"))
        .groupBy(col("pid"))
        .agg(min(col("k")).as("mn"), max(col("k")).as("mx"),
          count(lit(1)).as("cnt"))
        .collect().map(r =>
          r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val newFiles = {
        val stream = Files.list(Paths.get(table, "data", commitId))
        try stream.iterator().asScala
          .map(_.getFileName.toString)
          .filter(f => f.startsWith("part-") && f.endsWith(".parquet"))
          .toSeq.sorted
        finally stream.close()
      }.flatMap { f =>
        val idx = f.stripPrefix("part-").takeWhile(_.isDigit).toInt
        stats.get(idx).map { case (mn, mx, cnt) =>
          DataFileEntry(s"$rel/$f", mn, mx, cnt)
        }
      }
      (commitId, newFiles)
    } finally org.apache.spark.sql.graftbridge.Bridge
      .unpersistLocalCheckpoint(staged)
  }

  /** Keyed DELETE — the right-to-be-forgotten sweep: remove every row
    * whose merge key appears in `delKeys`, touching ONLY the files whose
    * cluster-key range overlaps the delete set (same pruning as MERGE).
    * At 100 TB a GDPR purge list is a tiny frame against a huge clustered
    * table: cost is O(touched files + list), never O(table). Returns the
    * number of rows deleted; replay-safe via the same txn watermark.
    */
  def mergeDelete(
      s: SparkSession,
      table: String,
      delKeys: DataFrame,
      targetRowsPerFile: Long = 4096,
      txn: Option[(String, Long)] = None,
      maxAttempts: Int = 20): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val snapshot = latestManifest(table)
        .getOrElse(sys.error(s"no committed version under $table"))
      val replayed = txn.exists { case (w, v) => snapshot.txns.get(w).exists(_ >= v) }
      if (replayed) return 0L

      val keys = snapshot.keys
      val clusterBy = snapshot.clusterBy
      if (attempt == 1) requireClusterable(delKeys, clusterBy, "DELETE key set")
      val touched: Set[String] = {
        import s.implicits._
        val intervals = snapshot.files
          .map(f => (f.path, f.minKey, f.maxKey)).toDF("path", "mn", "mx")
        delKeys.select(col(clusterBy).cast("long").as("k")).distinct()
          .join(broadcast(intervals),
            col("k") >= col("mn") && col("k") <= col("mx"))
          .select(col("path")).distinct()
          .as[String].collect().toSet
      }
      if (touched.isEmpty) {
        // nothing overlaps — but the txn watermark must STILL be recorded,
        // or a crash-replay of this batch after a concurrent writer lands
        // the keys would re-run the delete against data the original run
        // never saw (the exactly-once contract). Metadata-only commit:
        // same files, bumped version, watermark advanced.
        txn match {
          case None => return 0L // untracked caller: a true zero-cost no-op
          case Some((w, v)) =>
            val next = snapshot.copy(
              version = snapshot.version + 1,
              txns = snapshot.txns + (w -> v))
            if (tryCommit(table, next)) return 0L
        }
      } else {
        val schema = DataType.fromJson(snapshot.schemaJson).asInstanceOf[StructType]
        val old = s.read.schema(schema)
          .parquet(touched.toSeq.sorted.map(p => s"$table/$p"): _*)
        val survivors = old.join(
          delKeys.select(keys.map(col): _*).distinct(), keys, "left_anti")
        val oldCount = snapshot.files
          .filter(f => touched.contains(f.path)).map(_.numRows).sum

        val (commitId, newFiles) =
          writeClusteredFiles(table, survivors, clusterBy, targetRowsPerFile)
        val untouched = snapshot.files.filterNot(f => touched.contains(f.path))
        val next = snapshot.copy(
          version = snapshot.version + 1,
          files = untouched ++ newFiles,
          txns = snapshot.txns ++ txn.map { case (w, v) => w -> v })
        if (tryCommit(table, next)) return oldCount - newFiles.map(_.numRows).sum
        deleteDir(Paths.get(table, "data", commitId))
      }
    }
    sys.error(s"delete from $table lost the commit race $maxAttempts times")
  }

  /** OPTIMIZE: rewrite under-sized data files (fragmentation from many
    * small merges) into full clustered files — same semantics as a
    * lakehouse `OPTIMIZE`, committed as a normal version so readers
    * never block and time travel still sees the pre-compaction layout.
    * Only files below half the target participate; well-sized files are
    * carried by reference untouched. Returns the number of files
    * compacted (0 = nothing to do, no commit).
    */
  def optimize(
      s: SparkSession,
      table: String,
      targetRowsPerFile: Long = 4096,
      maxAttempts: Int = 20): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val snapshot = latestManifest(table)
        .getOrElse(sys.error(s"no committed version under $table"))
      val small = snapshot.files.filter(_.numRows < targetRowsPerFile / 2)
      if (small.size < 2) return 0 // nothing worth merging

      val schema = DataType.fromJson(snapshot.schemaJson).asInstanceOf[StructType]
      val frag = s.read.schema(schema)
        .parquet(small.map(f => s"$table/${f.path}"): _*)
      val (commitId, newFiles) =
        writeClusteredFiles(table, frag, snapshot.clusterBy, targetRowsPerFile)
      val smallPaths = small.map(_.path).toSet
      val next = snapshot.copy(
        version = snapshot.version + 1,
        files = snapshot.files.filterNot(f => smallPaths.contains(f.path)) ++ newFiles)
      if (tryCommit(table, next)) return small.size
      deleteDir(Paths.get(table, "data", commitId))
    }
    sys.error(s"optimize of $table lost the commit race $maxAttempts times")
  }

  /** VACUUM: delete data files referenced by no RETAINED version, and the
    * retired manifests themselves. Retention is by VERSION COUNT first,
    * then age: the newest `retainVersions` manifests are always kept, and
    * the live set is the union of THEIR file lists — so a reader pinned
    * to latest−1 survives collection no matter how old the underlying
    * files' write times are (an age-only gate measures from WRITE time,
    * not from when a file became unreferenced: a 2-hour-old file dropped
    * by a commit one minute ago would collect instantly — the GenStore
    * retain-2 lesson applied here). The age gate then still applies to
    * everything outside the retained set, covering in-flight writers of
    * abandoned commits. Returns the deleted file count.
    */
  def vacuum(table: String, graceMs: Long = 30L * 60 * 1000,
      retainVersions: Int = 2): Int = {
    val m = latestManifest(table).getOrElse(return 0)
    val keepFloor = m.version - math.max(1, retainVersions) + 1
    // union of the retained manifests' file lists — gaps (already-vacuumed
    // versions) just contribute nothing
    val live = (keepFloor to m.version)
      .flatMap(v => manifestAt(table, v)).flatMap(_.files.map(_.path)).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0
    val dataRoot = Paths.get(table, "data")
    if (Files.isDirectory(dataRoot)) {
      val commits = { val s0 = Files.list(dataRoot)
        try s0.iterator().asScala.toSeq finally s0.close() }
      commits.foreach { c =>
        val fs0 = { val s1 = Files.list(c)
          try s1.iterator().asScala.toSeq finally s1.close() }
        val anyLive = fs0.exists(f =>
          live.contains(s"data/${c.getFileName}/${f.getFileName}"))
        fs0.foreach { f =>
          val rel = s"data/${c.getFileName}/${f.getFileName}"
          val old = try Files.getLastModifiedTime(f).toMillis < cutoff
            catch { case _: Exception => false }
          if (!live.contains(rel) && old &&
            f.getFileName.toString.endsWith(".parquet")) {
            Files.deleteIfExists(f); deleted += 1
          }
        }
        // a commit dir with no live reference left also sheds its
        // _SUCCESS/.crc markers — otherwise retired-commit husks
        // accumulate forever (the markers alone keep the dir non-empty).
        // The shed is age-gated like every other deletion and NEVER
        // touches a dir holding `_temporary` (a concurrent writer's
        // in-flight Spark job staging — nothing references it in any
        // manifest YET, which is exactly why anyLive can't protect it)
        val remaining = { val s2 = Files.list(c)
          try s2.iterator().asScala.toSeq finally s2.close() }
        // `_temporary` (an in-flight Spark job's staging) gets a DAY of
        // grace, not the sweep's: a live writer is protected, while a
        // crashed writer's staging still reclaims eventually (deleting
        // it under a still-live >24h job would fail that job's COMMIT
        // loudly — fail-stop, never a silent corrupt publish)
        val tempCutoff = System.currentTimeMillis() - 24L * 3600 * 1000
        def shedSafe = remaining.forall { f =>
          val limit =
            if (f.getFileName.toString == "_temporary") tempCutoff else cutoff
          try Files.getLastModifiedTime(f).toMillis < limit
          catch { case _: Exception => false }
        }
        if (!anyLive && remaining.nonEmpty &&
          !remaining.exists(_.getFileName.toString.endsWith(".parquet")) &&
          shedSafe) {
          remaining.foreach(f => deleteDir(f)); Files.deleteIfExists(c)
        } else if (remaining.isEmpty) Files.deleteIfExists(c)
      }
    }
    val ld = logDir(table)
    if (Files.isDirectory(ld)) {
      val logs = { val s3 = Files.list(ld)
        try s3.iterator().asScala.toSeq finally s3.close() }
      logs.foreach { p =>
        def old = try Files.getLastModifiedTime(p).toMillis < cutoff
          catch { case _: Exception => false }
        versionOf(p.getFileName.toString) match {
          case Some(v) =>
            if (v < keepFloor && old) { Files.deleteIfExists(p); deleted += 1 }
          case None =>
            // crash-orphaned staging manifests (writer died between the
            // tmp write and the link) age out here too
            if (p.getFileName.toString.startsWith(".tmp-") && old) {
              Files.deleteIfExists(p); deleted += 1
            }
        }
      }
    }
    deleted
  }

  /** Remove a table tree entirely (fixture builders start clean). */
  private[graft] def dropTable(table: String): Unit =
    deleteDir(Paths.get(table))

  /** Age-gated sweep of the per-process scratch-table root: every bench
    * JVM builds its own appId-tagged fixture tables, and without a
    * reaper they accumulate across processes. Only entries older than
    * the grace collect — a concurrently-running app's table is younger
    * by construction (its build touched it this session).
    */
  private[ops] def sweepScratch(root: java.nio.file.Path,
      graceMs: Long = 6L * 3600 * 1000): Unit =
    if (Files.isDirectory(root)) {
      val cutoff = System.currentTimeMillis() - graceMs
      val entries = { val s0 = Files.list(root)
        try s0.iterator().asScala.toSeq finally s0.close() }
      entries.foreach { p =>
        val old = try Files.getLastModifiedTime(p).toMillis < cutoff
          catch { case _: Exception => false }
        if (old) deleteDir(p)
      }
    }

  private def deleteDir(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val stream = Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      try {
        val it = stream.iterator()
        while (it.hasNext) {
          try Files.delete(it.next()) catch { case _: Exception => () }
        }
      } finally stream.close()
    }

  // ---- oracled round-trip over the merged table ---------------------------

  private val mergedCache = IndexMemo.cache[(SparkSession, String), String]()

  /** Five deterministic commits over `events` — the shared fixture behind
    * BOTH merge queries: full load (v0), two overlapping update waves
    * (v1, v2), a keyed DELETE (v3), and an insert-only wave (v4). Built
    * once per (session, input); both queries read committed versions of
    * the same table.
    */
  private def buildMergedEvents(s: SparkSession, sfDir: String): String =
    IndexMemo(mergedCache, (s, sfDir)) {
      IndexStore.recordFixtureBuild("merge-table")
      val appTag = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "")
      // path carries the INPUT DIR (scopedName: basename + path hash), not
      // just the appId — two sf dirs in one JVM/app (the standard two-dir
      // spec pattern) must be two tables, or the second build deletes and
      // rebuilds over the first memo key's live table
      val root = Paths.get(System.getProperty("java.io.tmpdir", "/tmp"),
        "graft-merge")
      sweepScratch(root) // dead prior-app tables age out
      val t = root.resolve(
        s"${IndexStore.scopedName("events", sfDir)}-$appTag").toString
      deleteDir(Paths.get(t))
      val ev = Tables.read(s, sfDir, "events")
      val keys = Seq("event_id")
      // wave 0: initial full load
      mergeUpsert(s, t, ev, keys, "event_id", txn = Some(("seed", 0L)))
      // wave 1: ~40% of keys re-delivered with updated payloads
      mergeUpsert(s, t,
        ev.where(pmod(col("event_id"), lit(5)) < 2)
          .withColumn("value", col("value") + 100.0)
          .withColumn("event_type", lit("updated")),
        keys, "event_id", txn = Some(("seed", 1L)))
      // wave 2: a second overlapping wave (wins over wave 1 where both hit)
      mergeUpsert(s, t,
        ev.where(pmod(col("event_id"), lit(7)) === 0)
          .withColumn("value", col("value") + 200.0),
        keys, "event_id", txn = Some(("seed", 2L)))
      // wave 3: keyed delete (the GDPR sweep) — every %11==3 key purged
      mergeDelete(s, t,
        ev.where(pmod(col("event_id"), lit(11)) === 3).select(col("event_id")),
        txn = Some(("seed", 3L)))
      // wave 4: insert-only wave — clones offset past max(event_id), so
      // the no-collision guarantee holds at ANY scale factor (a fixed
      // offset has zero headroom the moment ids outgrow it); the oracle
      // derives the same offset from the same data
      val offset = ev.agg(max(col("event_id"))).collect()(0).getLong(0) + 1L
      mergeUpsert(s, t,
        ev.where(pmod(col("event_id"), lit(13)) === 0)
          .withColumn("event_id", col("event_id") + offset)
          .withColumn("event_type", lit("cloned"))
          .withColumn("value", col("value") + 500.0),
        keys, "event_id", txn = Some(("seed", 4L)))
      t
    }

  /** `q_merge_upsert`: TIME-TRAVEL read of version 2 (after the two
    * update waves, before the delete/insert waves that later commits
    * added on top), digested per event_type. Data files are immutable and
    * commits only drop references, so v2 must read back exactly as it was
    * committed no matter what happened after — any row lost, duplicated,
    * or left at a stale version by the merge protocol breaks the hash.
    * The oracle computes the same last-writer-wins outcome as a CASE over
    * the raw table — protocol-independent by construction. File-level
    * behavior (untouched files by reference, pruning, replay, commit
    * races) is MergeTableSpec territory.
    */
  def mergeUpsertDigest(s: SparkSession, sfDir: String): DataFrame =
    readVersion(s, buildMergedEvents(s, sfDir), 2L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("value_sum"))
      .orderBy("event_type")

  val mergeUpsertDigestSql: String =
    s"""WITH final AS (
       |  SELECT event_id, user_id,
       |    CASE WHEN event_id % 7 = 0 THEN event_type
       |         WHEN event_id % 5 < 2 THEN 'updated'
       |         ELSE event_type END AS event_type,
       |    CASE WHEN event_id % 7 = 0 THEN value + 200.0
       |         WHEN event_id % 5 < 2 THEN value + 100.0
       |         ELSE value END AS value
       |  FROM events)
       |SELECT event_type, count(*) AS n_events,
       |  count(DISTINCT user_id) AS n_users,
       |  round(sum(value), 2) AS value_sum
       |FROM final GROUP BY event_type ORDER BY event_type""".stripMargin

  /** `q_merge_cdf`: the table's CHANGE DATA FEED between version 0 and the
    * latest snapshot, derived entirely from time travel + the engine's own
    * CDC diff ([[ChangeCapture.snapshotDiff]]) — INSERTs from the clone
    * wave, DELETEs from the purge wave, UPDATEs from the two payload
    * waves. A lakehouse CDF without a log of row-level changes: immutable
    * versions make any (v_a, v_b) diff computable after the fact, at
    * keyed-full-outer-join cost over the two snapshots. The oracle
    * rebuilds both versions from the raw table with the same wave CASEs.
    */
  /** Row-level changes between two committed versions of any merge
    * table: keyed full-outer diff over the two immutable snapshots. The
    * general CDF primitive behind [[mergeChanges]]; `cols` defaults to
    * every non-key column of the newer version.
    */
  def changesBetween(
      s: SparkSession, table: String, fromVersion: Long, toVersion: Long,
      cols: Seq[String] = Seq.empty): DataFrame = {
    val m = manifestAt(table, toVersion)
      .getOrElse(sys.error(s"version $toVersion not found under $table"))
    require(m.keys.size == 1,
      "changesBetween supports single-column keys (snapshotDiff contract)")
    val key = m.keys.head
    val newer = readVersion(s, table, toVersion)
    val payload =
      if (cols.nonEmpty) cols else newer.columns.filterNot(_ == key).toSeq
    // schema evolution: the OLDER snapshot may predate columns the newer
    // one carries — widen it with typed nulls so a widening boundary
    // reports UPDATEs (null → value) instead of failing to resolve
    val target = StructType((key +: payload).map(c => newer.schema(c)))
    def slim(df: DataFrame) =
      withAllColumns(df, target).select((key +: payload).map(col): _*)
    ChangeCapture.snapshotDiff(
      slim(readVersion(s, table, fromVersion)), slim(newer), key, payload)
  }

  def mergeChanges(s: SparkSession, sfDir: String): DataFrame = {
    val t = buildMergedEvents(s, sfDir)
    changesBetween(s, t, 0L, latestManifest(t).get.version,
      Seq("event_type", "value"))
      .orderBy("event_id")
  }

  val mergeChangesSql: String =
    s"""WITH v0 AS (SELECT event_id, event_type, value FROM events),
       |final AS (
       |  SELECT event_id,
       |    CASE WHEN event_id % 7 = 0 THEN event_type
       |         WHEN event_id % 5 < 2 THEN 'updated'
       |         ELSE event_type END AS event_type,
       |    CASE WHEN event_id % 7 = 0 THEN value + 200.0
       |         WHEN event_id % 5 < 2 THEN value + 100.0
       |         ELSE value END AS value
       |  FROM events WHERE event_id % 11 <> 3
       |  UNION ALL
       |  SELECT event_id + (SELECT max(event_id) + 1 FROM events),
       |    'cloned', value + 500.0
       |  FROM events WHERE event_id % 13 = 0),
       |diff AS (
       |  SELECT coalesce(f.event_id, o.event_id) AS event_id,
       |    CASE WHEN o.event_id IS NULL THEN 'INSERT'
       |         WHEN f.event_id IS NULL THEN 'DELETE'
       |         WHEN f.event_type <> o.event_type OR f.value <> o.value
       |           THEN 'UPDATE' END AS change_type,
       |    f.event_type AS event_type, f.value AS value
       |  FROM v0 o FULL OUTER JOIN final f ON o.event_id = f.event_id)
       |SELECT event_id, change_type, event_type, value FROM diff
       |WHERE change_type IS NOT NULL ORDER BY event_id""".stripMargin
}
