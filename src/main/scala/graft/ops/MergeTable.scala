package graft.ops

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Transactional keyed MERGE on plain parquet — the at-scale form of the
  * K1/K2 idempotent-upsert contract (reference `DESIGN.md:41`; the plain
  * rewrite forms live in [[Sinks.upsertParquet]] / [[Sinks.upsertPartitioned]]).
  * No lakehouse jars ship in this environment, so the table format is a
  * minimal own implementation of the same public design (the Delta/Iceberg
  * commit-log pattern):
  *
  *  - `_graft_log/v<N>.json` — one log record per committed version. A
  *    record is either a CHECKPOINT (the table's full live file listing)
  *    or a DELTA (the files this commit added + the paths it dropped).
  *    Every `CheckpointInterval`-th version is a checkpoint, so resolving
  *    any snapshot reads ONE checkpoint + a bounded delta suffix — the
  *    log scales with commit rate, never with table file count (the
  *    Delta-log checkpointing layout; a full-listing-per-commit log caps
  *    out around 10⁵ files, which this lifts);
  *  - `data/<commit-uuid>/part-*.parquet` — immutable data files, written
  *    once, never modified; a commit only ADDS files and drops references;
  *  - commit = write the record to a temp name, then a single hard link to
  *    `v<N+1>.json`. The link fails if the version exists — optimistic
  *    concurrency: the losing writer first attempts a CONFLICT-SCOPED
  *    retry (if the winner touched a disjoint file set, the loser's delta
  *    is still valid against the new head and re-commits without any data
  *    rewrite), and only on a real overlap replays its merge against the
  *    winner's snapshot (serializable by version CAS), exactly the
  *    protocol Delta runs against an object store.
  *
  * MERGE cost is O(touched files + batch), never O(table):
  *
  *  1. incoming keys → file pruning: a data file is TOUCHED iff some
  *     incoming cluster-key tuple falls inside its per-column [min,max]
  *     box. Because the writer range-clusters every commit's output by the
  *     cluster columns, file boxes are tight and most files prune away —
  *     the same clustering-enables-MERGE discipline as OPTIMIZE/Z-order.
  *     The overlap test is a point-in-box join of the (distinct) batch
  *     keys against the broadcast ≤|files|-row box table (planned by
  *     [[graft.plans.RangeJoinStrategy]] when single-column-eligible),
  *     collecting only the bounded touched-file id list;
  *  2. survivors = touched-file rows whose key is NOT in the batch
  *     (left_anti on the merge keys);
  *  3. new files = batch ∪ survivors, range-clustered on the cluster
  *     columns, one parquet file per range partition, per-file typed
  *     min/max recorded from the SAME pinned partitioning that wrote the
  *     files. Stats are TYPED per clustering column (long-integral,
  *     double, string in UTF-8 byte order, timestamp as epoch micros,
  *     date as epoch days) — string/timestamp/date keys and multi-column
  *     clustering prune exactly like long keys;
  *  4. new log record = delta(adds = new files, removes = touched paths).
  *
  * Untouched files are carried by reference — byte-identical, never read.
  *
  * Streaming exactly-once: a commit can carry a (writerId, version)
  * transaction; a merge whose version is ≤ the log's recorded watermark
  * for that writer is a no-op. With writerId = the sink's checkpoint
  * location and version = the micro-batch id, `foreachBatch` replay after
  * a crash converges without re-applying — the documented Delta
  * `txnAppId`/`txnVersion` idiom ([[graft.streaming.StreamingPipeline]]
  * wires it).
  */
object MergeTable {

  /** Typed missing-version signal: the requested version's log record is
    * absent (never committed, or retired by vacuum), or a record inside
    * the resolution walk is gone. A TYPED class — not a message substring
    * — is what retention-resilient consumers ([[graft.streaming.StreamingChangeFeed]])
    * key their skip/snapshot-boot decisions on; free-text matching would
    * misclassify unrelated errors that happen to share words. */
  final class MissingVersionException(msg: String) extends RuntimeException(msg)

  private def missingVersion(msg: String): Nothing =
    throw new MissingVersionException(msg)

  /** Every `CheckpointInterval`-th version embeds the full file listing;
    * versions in between are add/remove deltas. Snapshot resolution reads
    * at most `CheckpointInterval` log records. */
  val CheckpointInterval = 10

  /** Typed per-column file statistic. `t` picks the comparison domain and
    * the rendering: "long" (all integral types, decimal string),
    * "double" (float/double, `Double.toString`), "string" (raw value;
    * ordering is UTF-8 byte order — what Spark's UTF8String comparison
    * uses, so driver-side box tests and the executor-side pruning join
    * can never disagree), "timestamp" (epoch MICROseconds), "date"
    * (epoch days). Bounds are inclusive. */
  case class ColStat(t: String, min: String, max: String)

  /** One live data file: path relative to the table root, row count, and
    * per-clustering-column typed bounds. */
  case class DataFileEntry(path: String, numRows: Long, stats: Map[String, ColStat]) {
    /** Convenience for specs / long-keyed callers. */
    def minLong(c: String): Long = stats(c).min.toLong
    def maxLong(c: String): Long = stats(c).max.toLong
  }

  /** One RESOLVED committed table version (checkpoint + folded deltas).
    * `txns` maps writerId → highest applied transaction version (the
    * replay watermark). */
  case class TableManifest(
      version: Long,
      schemaJson: String,
      keys: Seq[String],
      clusterBy: Seq[String],
      files: Seq[DataFileEntry],
      txns: Map[String, Long])

  /** The on-disk per-version log record. kind = "checkpoint" (adds = the
    * full live listing, removes empty) | "delta" (adds/removes relative to
    * version−1). Schema/keys/clusterBy/txns are carried IN FULL on every
    * record (all bounded metadata), so only the file listing needs the
    * checkpoint walk. */
  private case class LogRecord(
      version: Long,
      kind: String,
      schemaJson: String,
      keys: Seq[String],
      clusterBy: Seq[String],
      adds: Seq[DataFileEntry],
      removes: Seq[String],
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

  private def readRecord(table: String, v: Long): Option[LogRecord] = {
    val f = logDir(table).resolve(f"v$v%020d.json")
    if (!Files.exists(f)) None
    else {
      val txt = new String(Files.readAllBytes(f), "UTF-8")
      // the FILENAME is the CAS slot and therefore the authoritative
      // version; trusting a divergent embedded version would re-commit
      // into an occupied slot forever
      Some(org.json4s.jackson.Serialization.read[LogRecord](txt).copy(version = v))
    }
  }

  private def latestVersion(table: String): Option[Long] = {
    val ld = logDir(table)
    if (!Files.isDirectory(ld)) None
    else {
      val stream = Files.list(ld)
      try stream.iterator().asScala
        .flatMap(p => versionOf(p.getFileName.toString))
        .foldLeft(Option.empty[Long])((a, v) => Some(a.fold(v)(math.max(_, v))))
      finally stream.close()
    }
  }

  /** Latest committed manifest, or None for a not-yet-created table. */
  def latestManifest(table: String): Option[TableManifest] =
    latestVersion(table).flatMap(v => manifestAt(table, v))

  /** The RESOLVED manifest of one SPECIFIC committed version — the
    * time-travel primitive. Walks back from `v` to the nearest checkpoint
    * and folds the delta records forward (≤ CheckpointInterval reads).
    * Available until [[vacuum]] retires the version. */
  def manifestAt(table: String, v: Long): Option[TableManifest] =
    readRecord(table, v).map { head =>
      val files =
        if (head.kind == "checkpoint") head.adds
        else {
          // collect head and the deltas below it until a checkpoint
          var deltas = List(head)
          var cur = v - 1
          var cp: Option[LogRecord] = None
          while (cp.isEmpty) {
            val r = readRecord(table, cur).getOrElse(missingVersion(
              s"log gap: version $cur missing while resolving $v of $table " +
                "(foreign deletion under the checkpoint floor?)"))
            if (r.kind == "checkpoint") cp = Some(r)
            else { deltas = r :: deltas; cur -= 1 }
          }
          deltas.foldLeft(cp.get.adds) { (acc, r) =>
            val rm = r.removes.toSet
            acc.filterNot(f => rm.contains(f.path)) ++ r.adds
          }
        }
      TableManifest(v, head.schemaJson, head.keys, head.clusterBy, files, head.txns)
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
      .getOrElse(missingVersion(s"version $version not found under $table " +
        "(never committed, or retired by vacuum)")))

  private def readManifest(s: SparkSession, table: String, m: TableManifest): DataFrame =
    readFiles(s, table, DataType.fromJson(m.schemaJson).asInstanceOf[StructType], m.files)

  private def readFiles(s: SparkSession, table: String, schema: StructType,
      files: Seq[DataFileEntry]): DataFrame =
    if (files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else
      s.read.schema(schema).parquet(files.map(f => s"$table/${f.path}"): _*)

  /** Attempt to publish `r` as version `r.version`; false = lost the CAS.
    *
    * The publish primitive is a HARD LINK, not a rename: POSIX rename(2)
    * (what ATOMIC_MOVE maps to) silently REPLACES an existing target, so a
    * rename-based commit would clobber a concurrent writer's version
    * instead of failing — link(2) is atomic AND errors with EEXIST, the
    * put-if-absent a version CAS needs. (On an object store the same slot
    * is a conditional PUT.)
    */
  private def tryCommit(table: String, r: LogRecord): Boolean = {
    val ld = logDir(table)
    Files.createDirectories(ld)
    val tmp = ld.resolve(s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, org.json4s.jackson.Serialization.write(r).getBytes("UTF-8"))
    val target = ld.resolve(f"v${r.version}%020d.json")
    try { Files.createLink(target, tmp); Files.deleteIfExists(tmp); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
      case _: java.nio.file.FileSystemException if Files.exists(target) =>
        Files.deleteIfExists(tmp); false
    }
  }

  /** Publish a commit at `version`: a checkpoint record (full listing) on
    * the checkpoint cadence, a delta record otherwise. `resolved` is the
    * version's FULL live listing (needed for checkpoints and cheap for
    * every caller — it's bounded metadata the committer already holds). */
  private def commitVersion(
      table: String, version: Long, schemaJson: String, keys: Seq[String],
      clusterBy: Seq[String], adds: Seq[DataFileEntry], removes: Seq[String],
      txns: Map[String, Long], resolved: Seq[DataFileEntry]): Boolean = {
    val rec =
      if (version % CheckpointInterval == 0)
        LogRecord(version, "checkpoint", schemaJson, keys, clusterBy,
          resolved, Seq.empty, txns)
      else
        LogRecord(version, "delta", schemaJson, keys, clusterBy,
          adds, removes, txns)
    tryCommit(table, rec)
  }

  // ---- typed cluster-key statistics ---------------------------------------

  private def statTag(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "long"
    case FloatType | DoubleType => "double"
    case StringType => "string"
    case TimestampType => "timestamp"
    case DateType => "date"
    case other => sys.error(s"unsupported cluster-key type $other — " +
      "supported: integral, float/double, string, timestamp, date")
  }

  private def statFieldType(tag: String): DataType = tag match {
    case "long" => LongType
    case "double" => DoubleType
    case "string" => StringType
    case "timestamp" => TimestampType
    case "date" => DateType
  }

  /** Canonical string rendering of a collected stat value (see [[ColStat]]). */
  private def renderStat(dt: DataType, v: Any): String = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      v.asInstanceOf[Number].longValue.toString
    case FloatType | DoubleType => v.asInstanceOf[Number].doubleValue.toString
    case StringType => v.asInstanceOf[String]
    case TimestampType => v match {
      // both external timestamp types appear depending on the session's
      // java8API config — render to epoch micros either way
      case ts: java.sql.Timestamp =>
        val i = ts.toInstant
        (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
      case i: java.time.Instant =>
        (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    }
    case DateType => v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
      case d: java.time.LocalDate => d.toEpochDay.toString
    }
    case other => sys.error(s"unsupported cluster-key type $other")
  }

  /** JVM value for re-injecting a rendered stat into a DataFrame literal
    * of the stat's field type (CatalystTypeConverters accepts java.sql
    * external types regardless of the java8API setting). */
  private def statJvm(tag: String, v: String): Any = tag match {
    case "long" => v.toLong
    case "double" => v.toDouble
    case "string" => v
    case "timestamp" =>
      val micros = v.toLong
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case "date" =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.toLong))
  }

  /** Unsigned lexicographic byte comparison — the UTF8String order Spark
    * compares strings in. Driver-side box tests MUST use it too: JVM
    * String.compareTo is UTF-16 code-unit order, which disagrees above
    * the BMP, and a disagreement here would make the conflict-scoped
    * fast path unsound, not just slow. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def statLeq(t: String, a: String, b: String): Boolean = t match {
    case "long" | "timestamp" | "date" => a.toLong <= b.toLong
    case "double" => a.toDouble <= b.toDouble
    case "string" => utf8Compare(a, b) <= 0
  }

  /** Inclusive per-column interval overlap of a key box against a file's
    * stats box — true only if EVERY clustering column's intervals
    * intersect (sound: a real shared tuple implies per-column overlap). */
  private def boxesOverlap(clusterBy: Seq[String],
      box: Map[String, ColStat], f: DataFileEntry): Boolean =
    clusterBy.forall { c =>
      val a = box(c); val b = f.stats(c)
      statLeq(a.t, a.min, b.max) && statLeq(a.t, b.min, a.max)
    }

  /** The batch's per-clustering-column [min,max] box (None for an empty
    * batch — it overlaps nothing). */
  private def batchBox(batch: DataFrame,
      clusterBy: Seq[String]): Option[Map[String, ColStat]] = {
    val aggs = clusterBy.flatMap(c => Seq(min(col(c)), max(col(c))))
    val r = batch.agg(aggs.head, aggs.tail: _*).collect()(0)
    if (r.isNullAt(0)) None
    else Some(clusterBy.zipWithIndex.map { case (c, i) =>
      val dt = batch.schema(c).dataType
      c -> ColStat(statTag(dt), renderStat(dt, r.get(2 * i)),
        renderStat(dt, r.get(2 * i + 1)))
    }.toMap)
  }

  /** Paths of the files whose stats box intersects the batch's key set —
    * the point-in-box join of the distinct batch cluster tuples against
    * the broadcast ≤|files|-row box table; collects only the bounded
    * touched-path list. */
  private def touchedPaths(
      s: SparkSession, files: Seq[DataFileEntry], batch: DataFrame,
      clusterBy: Seq[String]): Set[String] = {
    if (files.isEmpty) return Set.empty
    import s.implicits._
    val tags = clusterBy.map(c => files.head.stats(c).t)
    val schema = StructType(
      StructField("path", StringType) +:
        clusterBy.indices.flatMap(i => Seq(
          StructField(s"mn_$i", statFieldType(tags(i))),
          StructField(s"mx_$i", statFieldType(tags(i))))))
    val rows: java.util.List[Row] = files.map { f =>
      Row.fromSeq(f.path +: clusterBy.zipWithIndex.flatMap { case (c, i) =>
        val st = f.stats(c)
        Seq(statJvm(st.t, st.min), statJvm(st.t, st.max))
      })
    }.asJava
    val intervals = s.createDataFrame(rows, schema)
    val probe = batch
      .select(clusterBy.zipWithIndex.map { case (c, i) => col(c).as(s"k_$i") }: _*)
      .distinct()
    val cond = clusterBy.indices
      .map(i => col(s"k_$i") >= col(s"mn_$i") && col(s"k_$i") <= col(s"mx_$i"))
      .reduce(_ && _)
    probe.join(broadcast(intervals), cond)
      .select(col("path")).distinct()
      .as[String].collect().toSet // bounded: ≤ |files| rows
  }

  /** Test-only fault injection: runs immediately before every commit
    * attempt in [[mergeUpsert]] — a spec installs a competing commit here
    * to force a deterministic CAS loss. */
  @volatile private[graft] var testPrecommitHook: () => Unit = () => ()

  /** MERGE INTO `table` USING `batch` ON `keys` — incoming rows win on key
    * collision (WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED INSERT ALL).
    * The batch must be key-unique (the standard MERGE precondition; a
    * multi-match is rejected, as `MERGE INTO` proper does). Returns true
    * if a new version committed, false if `txn` was already applied.
    *
    * `clusterBy` names the clustering columns (typed stats + range
    * clustering + file pruning); each must be one of the merge keys.
    */
  def mergeUpsert(
      s: SparkSession,
      table: String,
      batch: DataFrame,
      keys: Seq[String],
      clusterBy: Seq[String],
      targetRowsPerFile: Long = 4096,
      txn: Option[(String, Long)] = None,
      maxAttempts: Int = 20): Boolean = {
    require(keys.nonEmpty, "merge keys must be non-empty")
    // pruning soundness: a file is skipped when no batch CLUSTER tuple
    // falls in its box — valid only if a matched old row's cluster
    // values EQUAL the batch row's, i.e. every cluster column is part of
    // the match key. And the stats/pruning arithmetic needs non-null
    // comparable values: a null (or NaN) cluster value would silently
    // prune wrong (missed matches → duplicate keys).
    require(clusterBy.nonEmpty && clusterBy.forall(keys.contains),
      s"clusterBy ${clusterBy.mkString("(", ",", ")")} must be a subset of " +
        s"the merge keys ${keys.mkString("(", ",", ")")} — file pruning " +
        "assumes a matched row's cluster values equal the batch row's")
    // the SCAN-shaped preconditions run once, AFTER the first replay
    // check below — a replayed (already-applied) streaming batch must
    // no-op without paying two full batch-plan executions first
    var preconditionsChecked = false
    var batchBoxMemo: Option[Option[Map[String, ColStat]]] = None

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
      snapshot.foreach { m =>
        require(m.keys == keys && m.clusterBy == clusterBy,
          s"table $table is keyed ${m.keys.mkString(",")} clustered " +
            s"${m.clusterBy.mkString(",")}; a merge with different " +
            "keys/clustering needs an explicit migration")
      }
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
      val touched = touchedPaths(s, existingFiles, batch, clusterBy)

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
      testPrecommitHook()
      if (commitVersion(table, snapshot.map(_.version + 1).getOrElse(0L),
        schema.json, keys, clusterBy, newFiles, touched.toSeq.sorted,
        newTxns, untouched ++ newFiles)) return true

      // ---- lost the version CAS ------------------------------------------
      // CONFLICT-SCOPED retry first: our delta (adds = newFiles, removes =
      // touched) is still valid against the winner's head iff (a) no
      // intervening commit removed a file we rewrote (they rewrote a key
      // we may also carry), (b) no intervening ADD's stats box overlaps
      // our batch's key box (the winner may have inserted a key our merge
      // also inserts → duplicate), and (c) no schema/txn conflict. Then
      // the SAME data files re-commit at the new head — zero recompute.
      if (batchBoxMemo.isEmpty) batchBoxMemo = Some(batchBox(batch, clusterBy))
      val box = batchBoxMemo.get
      val basePaths = existingFiles.map(_.path).toSet
      var fastViable = true
      var fastDone = false
      // each fast-path CAS loss consumes the SAME attempt budget as the
      // outer replay loop — under sustained disjoint commit traffic the
      // merge fail-stops at maxAttempts instead of retrying unboundedly
      while (fastViable && !fastDone && attempt < maxAttempts) {
        attempt += 1
        val head = latestManifest(table).getOrElse(
          sys.error(s"commit race on $table with no committed head"))
        val headReplayed = txn.exists { case (w, v) =>
          head.txns.get(w).exists(_ >= v) }
        if (headReplayed) { deleteDir(Paths.get(table, "data", commitId)); return false }
        val headSchema = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
        val schemaOk = schema.fields.forall(f =>
          headSchema.find(_.name == f.name).forall(_.dataType == f.dataType))
        val headPaths = head.files.map(_.path).toSet
        val removedSinceBase = basePaths -- headPaths
        val addedSinceBase = head.files.filterNot(f => basePaths.contains(f.path))
        fastViable = schemaOk &&
          head.keys == keys && head.clusterBy == clusterBy &&
          removedSinceBase.intersect(touched).isEmpty &&
          !addedSinceBase.exists(f => box.exists(b => boxesOverlap(clusterBy, b, f)))
        if (fastViable) {
          val mergedSchema = StructType(headSchema.fields ++
            schema.fields.filterNot(f => headSchema.exists(_.name == f.name)))
          val resolved = head.files.filterNot(f => touched.contains(f.path)) ++ newFiles
          fastDone = commitVersion(table, head.version + 1, mergedSchema.json,
            keys, clusterBy, newFiles, touched.toSeq.sorted,
            head.txns ++ txn.map { case (w, v) => w -> v }, resolved)
          if (fastDone) return true
          // another writer won again — loop: re-evaluate against newer head
        }
      }
      // real overlap: drop this attempt's files and replay the merge
      // against the winner's snapshot
      deleteDir(Paths.get(table, "data", commitId))
    }
    sys.error(s"merge into $table lost the commit race $maxAttempts times")
  }

  /** Every cluster column must exist with a supported type and be
    * non-null (and non-NaN for float/double) in every row. */
  private def requireClusterable(df: DataFrame, clusterBy: Seq[String],
      what: String): Unit = {
    clusterBy.foreach { c =>
      require(df.columns.contains(c), s"$what: cluster column '$c' missing")
      statTag(df.schema(c).dataType) // throws on unsupported types
    }
    val badCond = clusterBy.map { c =>
      df.schema(c).dataType match {
        case FloatType | DoubleType => col(c).isNull || isnan(col(c))
        case _ => col(c).isNull
      }
    }.reduce(_ || _)
    val bad = df.where(badCond).limit(1).count()
    require(bad == 0,
      s"$what: cluster columns ${clusterBy.mkString(",")} must be non-null " +
        "(and non-NaN) in every row (they are the file-pruning statistics)")
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
      table: String, df: DataFrame, clusterBy: Seq[String],
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
        pinned.repartitionByRange(nFiles, clusterBy.map(c => col(c).asc): _*),
        clusterBy)
    } finally org.apache.spark.sql.graftbridge.Bridge
      .unpersistLocalCheckpoint(pinned)
  }

  /** Write the staged frame (one file per range partition) and derive the
    * per-file typed stats from the SAME pinned partitioning. */
  private def writeStaged(
      table: String, toStage: DataFrame,
      clusterBy: Seq[String]): (String, Seq[DataFileEntry]) = {
    val staged = toStage.localCheckpoint()
    try {
      val commitId = java.util.UUID.randomUUID().toString.take(12)
      val rel = s"data/$commitId"
      staged.write.mode("overwrite").parquet(s"$table/$rel")
      // per-partition stats keyed by partition id; partition i wrote the
      // file whose name parses to part index i (empty partitions write
      // no file and emit no stats group — both sides skip them)
      val dts = clusterBy.map(c => staged.schema(c).dataType)
      val aggs = clusterBy.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(col(c)).as(s"mn_$i"), max(col(c)).as(s"mx_$i"))
      } :+ count(lit(1)).as("cnt")
      val stats = staged
        .select(spark_partition_id().as("pid") +: clusterBy.map(col): _*)
        .groupBy(col("pid"))
        .agg(aggs.head, aggs.tail: _*)
        .collect().map { r =>
          val m = clusterBy.zipWithIndex.map { case (c, i) =>
            c -> ColStat(statTag(dts(i)),
              renderStat(dts(i), r.get(1 + 2 * i)),
              renderStat(dts(i), r.get(2 + 2 * i)))
          }.toMap
          r.getInt(0) -> (m, r.getLong(1 + 2 * clusterBy.size))
        }.toMap
      val newFiles = {
        val stream = Files.list(Paths.get(table, "data", commitId))
        try stream.iterator().asScala
          .map(_.getFileName.toString)
          .filter(f => f.startsWith("part-") && f.endsWith(".parquet"))
          .toSeq.sorted
        finally stream.close()
      }.flatMap { f =>
        val idx = f.stripPrefix("part-").takeWhile(_.isDigit).toInt
        stats.get(idx).map { case (m, cnt) =>
          DataFileEntry(s"$rel/$f", cnt, m)
        }
      }
      (commitId, newFiles)
    } finally org.apache.spark.sql.graftbridge.Bridge
      .unpersistLocalCheckpoint(staged)
  }

  /** Keyed DELETE — the right-to-be-forgotten sweep: remove every row
    * whose merge key appears in `delKeys`, touching ONLY the files whose
    * cluster-key box overlaps the delete set (same pruning as MERGE).
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
    var boxMemo: Option[Option[Map[String, ColStat]]] = None
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
      val touched = touchedPaths(s, snapshot.files, delKeys, clusterBy)
      if (touched.isEmpty) {
        // nothing overlaps — but the txn watermark must STILL be recorded,
        // or a crash-replay of this batch after a concurrent writer lands
        // the keys would re-run the delete against data the original run
        // never saw (the exactly-once contract). Metadata-only commit:
        // same files, bumped version, watermark advanced.
        txn match {
          case None => return 0L // untracked caller: a true zero-cost no-op
          case Some((w, v)) =>
            if (commitVersion(table, snapshot.version + 1, snapshot.schemaJson,
              keys, clusterBy, Seq.empty, Seq.empty,
              snapshot.txns + (w -> v), snapshot.files)) return 0L
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
        val deletedCount = oldCount - newFiles.map(_.numRows).sum
        if (commitVersion(table, snapshot.version + 1, snapshot.schemaJson,
          keys, clusterBy, newFiles, touched.toSeq.sorted,
          snapshot.txns ++ txn.map { case (w, v) => w -> v },
          untouched ++ newFiles)) return deletedCount

        // conflict-scoped retry: the delete's rewrite stays valid against
        // the winner's head iff the winner neither removed a file we
        // rewrote nor added a file whose box overlaps the delete-key box
        // (a freshly inserted matching key must be deleted by a REPLAYED
        // delete, not silently survive).
        if (boxMemo.isEmpty) boxMemo = Some(batchBox(
          delKeys.select(clusterBy.map(col): _*), clusterBy))
        val box = boxMemo.get
        val basePaths = snapshot.files.map(_.path).toSet
        var fastViable = true
        var fastDone = false
        // bounded like the outer loop — see mergeUpsert's fast path
        while (fastViable && !fastDone && attempt < maxAttempts) {
          attempt += 1
          val head = latestManifest(table).getOrElse(
            sys.error(s"commit race on $table with no committed head"))
          val headReplayed = txn.exists { case (w, v) =>
            head.txns.get(w).exists(_ >= v) }
          if (headReplayed) { deleteDir(Paths.get(table, "data", commitId)); return 0L }
          val headPaths = head.files.map(_.path).toSet
          val removedSinceBase = basePaths -- headPaths
          val addedSinceBase = head.files.filterNot(f => basePaths.contains(f.path))
          fastViable = head.schemaJson == snapshot.schemaJson &&
            head.keys == keys && head.clusterBy == clusterBy &&
            removedSinceBase.intersect(touched).isEmpty &&
            !addedSinceBase.exists(f => box.exists(b => boxesOverlap(clusterBy, b, f)))
          if (fastViable) {
            val resolved = head.files.filterNot(f => touched.contains(f.path)) ++ newFiles
            fastDone = commitVersion(table, head.version + 1, head.schemaJson,
              keys, clusterBy, newFiles, touched.toSeq.sorted,
              head.txns ++ txn.map { case (w, v) => w -> v }, resolved)
            if (fastDone) return deletedCount
          }
        }
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
      if (commitVersion(table, snapshot.version + 1, snapshot.schemaJson,
        snapshot.keys, snapshot.clusterBy, newFiles,
        smallPaths.toSeq.sorted, snapshot.txns,
        snapshot.files.filterNot(f => smallPaths.contains(f.path)) ++ newFiles))
        return small.size

      // conflict-scoped retry: a compaction rewrites rows unchanged, so
      // it stays valid against any head that still carries every small
      // file it folded in (no added-box check needed: OPTIMIZE introduces
      // no new keys, so a winner's insert cannot collide with it)
      var fastViable = true
      var fastDone = false
      // bounded like the outer loop — see mergeUpsert's fast path
      while (fastViable && !fastDone && attempt < maxAttempts) {
        attempt += 1
        val head = latestManifest(table).getOrElse(
          sys.error(s"commit race on $table with no committed head"))
        val headPaths = head.files.map(_.path).toSet
        fastViable = smallPaths.forall(headPaths.contains) &&
          head.keys == snapshot.keys && head.clusterBy == snapshot.clusterBy
        if (fastViable) {
          val resolved = head.files.filterNot(f => smallPaths.contains(f.path)) ++ newFiles
          fastDone = commitVersion(table, head.version + 1, head.schemaJson,
            head.keys, head.clusterBy, newFiles, smallPaths.toSeq.sorted,
            head.txns, resolved)
          if (fastDone) return small.size
        }
      }
      deleteDir(Paths.get(table, "data", commitId))
    }
    sys.error(s"optimize of $table lost the commit race $maxAttempts times")
  }

  /** VACUUM: delete data files referenced by no RETAINED version, and the
    * retired log records themselves. Retention is by VERSION COUNT first,
    * then age: the newest `retainVersions` versions are always kept, and
    * the live set is the union of THEIR resolved file lists — so a reader
    * pinned to latest−1 survives collection no matter how old the
    * underlying files' write times are (an age-only gate measures from
    * WRITE time, not from when a file became unreferenced: a 2-hour-old
    * file dropped by a commit one minute ago would collect instantly —
    * the GenStore retain-2 lesson applied here). The age gate then still
    * applies to everything outside the retained set, covering in-flight
    * writers of abandoned commits.
    *
    * Log retention keeps everything down to the CHECKPOINT FLOOR — the
    * newest checkpoint at or below the retained range's base — because
    * retained delta records resolve by walking back to it; only records
    * strictly below the floor retire. Callers whose readers time-travel
    * (registered queries, reproducibility audits) must size
    * `retainVersions` to cover the OLDEST version those readers pin —
    * see the retention contract spec in MergeTableSpec.
    * Returns the deleted file count.
    */
  def vacuum(table: String, graceMs: Long = 30L * 60 * 1000,
      retainVersions: Int = 2): Int = {
    val m = latestManifest(table).getOrElse(return 0)
    val keepFloor = math.max(0L, m.version - math.max(1, retainVersions) + 1)
    // delta records ≥ keepFloor resolve by walking back to this
    // checkpoint; everything ≥ cpFloor must therefore survive
    val cpFloor = keepFloor - Math.floorMod(keepFloor, CheckpointInterval.toLong)
    // union of the retained versions' resolved file lists — gaps
    // (already-vacuumed versions) just contribute nothing
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
            if (v < cpFloor && old) { Files.deleteIfExists(p); deleted += 1 }
          case None =>
            // crash-orphaned staging records (writer died between the
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

  /** Refresh a live table's root mtime — the heartbeat [[sweepScratch]]'s
    * age gate keys on. Sessions that READ a memoized table long after
    * building it must touch it per access, or a newer JVM's sweep
    * collects it mid-session (the root mtime is otherwise set at build
    * time and never refreshed by reads). */
  private[graft] def touchTable(table: String): Unit =
    try Files.setLastModifiedTime(Paths.get(table),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Exception => () }

  /** Age-gated sweep of the per-process scratch-table root: every bench
    * JVM builds its own appId-tagged fixture tables, and without a
    * reaper they accumulate across processes. Only entries older than
    * the grace collect — a concurrently-running app's table is younger
    * by construction: its build touched it, and every memoized READ
    * refreshes the heartbeat via [[touchTable]].
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

  // ---- change data feed ---------------------------------------------------

  /** Row-level changes between two committed versions of any merge table.
    *
    * FILE-SCOPED: both manifests list exactly which files each version
    * holds, so the diff reads ONLY the file-set delta — the older side
    * restricted to files `from` holds that `to` dropped, the newer side
    * to files `to` holds that `from` lacked. Files shared by both
    * versions are immutable and key-unique per version, so every row in
    * them is byte-identical on both sides and contributes no change —
    * skipping them is exact, not approximate. Cost is O(changed files +
    * changes), never O(table) — the thing a lakehouse CDF log buys,
    * recovered here from manifests alone (the round-9 O(table)-per-commit
    * scale defect, closed).
    *
    * Composite keys are supported (the diff joins on ALL key columns);
    * `cols` defaults to every non-key column of the newer version.
    * Schema evolution: the older snapshot may predate columns the newer
    * one carries — it widens with typed nulls so a widening boundary
    * reports UPDATEs (null → value) instead of failing to resolve.
    */
  def changesBetween(
      s: SparkSession, table: String, fromVersion: Long, toVersion: Long,
      cols: Seq[String] = Seq.empty): DataFrame = {
    val mTo = manifestAt(table, toVersion)
      .getOrElse(missingVersion(s"version $toVersion not found under $table"))
    val mFrom = manifestAt(table, fromVersion)
      .getOrElse(missingVersion(s"version $fromVersion not found under $table"))
    val keys = mTo.keys
    val newSchema = DataType.fromJson(mTo.schemaJson).asInstanceOf[StructType]
    val payload =
      if (cols.nonEmpty) cols
      else newSchema.fieldNames.filterNot(keys.contains).toSeq
    val fromPaths = mFrom.files.map(_.path).toSet
    val toPaths = mTo.files.map(_.path).toSet
    val removedEntries = mFrom.files.filterNot(f => toPaths.contains(f.path))
    val addedEntries = mTo.files.filterNot(f => fromPaths.contains(f.path))
    val target = StructType((keys ++ payload).map(c => newSchema(c)))
    def side(m: TableManifest, entries: Seq[DataFileEntry]) = {
      val schema = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
      withAllColumns(readFiles(s, table, schema, entries), target)
    }
    ChangeCapture.snapshotDiffKeys(
      side(mFrom, removedEntries), side(mTo, addedEntries), keys, payload)
  }

  // ---- oracled round-trip over the merged table ---------------------------

  private val mergedCache = IndexMemo.cache[(SparkSession, String), String]()

  /** Five deterministic commits over `events` — the shared fixture behind
    * BOTH merge queries: full load (v0), two overlapping update waves
    * (v1, v2), a keyed DELETE (v3), and an insert-only wave (v4). Built
    * once per (session, input); both queries read committed versions of
    * the same table. NEVER vacuumed by the fixture: the registered
    * queries time-travel to v0 and v2, so any retention policy here must
    * keep retainVersions ≥ 5 (the retention contract spec pins this).
    */
  private def buildMergedEvents(s: SparkSession, sfDir: String): String = {
    val t = IndexMemo(mergedCache, (s, sfDir)) {
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
      mergeUpsert(s, t, ev, keys, keys, txn = Some(("seed", 0L)))
      // wave 1: ~40% of keys re-delivered with updated payloads
      mergeUpsert(s, t,
        ev.where(pmod(col("event_id"), lit(5)) < 2)
          .withColumn("value", col("value") + 100.0)
          .withColumn("event_type", lit("updated")),
        keys, keys, txn = Some(("seed", 1L)))
      // wave 2: a second overlapping wave (wins over wave 1 where both hit)
      mergeUpsert(s, t,
        ev.where(pmod(col("event_id"), lit(7)) === 0)
          .withColumn("value", col("value") + 200.0),
        keys, keys, txn = Some(("seed", 2L)))
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
        keys, keys, txn = Some(("seed", 4L)))
      t
    }
    touchTable(t) // heartbeat: a long session's reads keep the table alive
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
    * latest snapshot, via the file-scoped [[changesBetween]] —
    * INSERTs from the clone wave, DELETEs from the purge wave, UPDATEs
    * from the two payload waves. The oracle rebuilds both versions from
    * the raw table with the same wave CASEs and diffs them IN FULL —
    * protocol-independent, so it also proves the file-scoped diff loses
    * nothing against the full-snapshot semantics.
    */
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
