package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

import graft.ops.MergeTable.DataFileEntry

/** OPT-IN per-file BLOOM POINT INDEXES — equality/IN file skipping for
  * high-cardinality columns UNCORRELATED with the clustering.
  *
  * Min/max boxes prune ranges: on a ts-clustered table, `WHERE ts
  * BETWEEN …` opens a handful of files. But an equality probe on a
  * column the layout never sorted (`doc_id = 'x'` on that same table)
  * overlaps EVERY file's box, so the scan opens all of them to find one
  * row — at 100 TB, the difference between a point lookup and a table
  * scan. The standard lakehouse answer is a per-file Bloom filter: a
  * fixed-size bitset whose `false` is a PROOF of absence and whose
  * `true` means "maybe" — exactly the refute-only shape of every other
  * skipping statistic in this engine.
  *
  * Reference behavior (`brian-burrows/trail-condition-etl`): the
  * read side answers per-city point lookups through Redis key hashing
  * (`categorize-trail-conditions/src/redis_store.py`) — O(1) access to
  * one city's window regardless of how many cities exist. This index is
  * the same contract at the file tier: a key probe touches the files
  * that hold the key, not the table.
  *
  * WRITE SIDE (opt-in, like the min/max ledgers):
  * `spark.graft.stats.bloomCols` = comma-separated LOGICAL column names
  * to index at write time (absent/unsupported-type names are skipped —
  * the conf is session-global, tables without the column just don't
  * index it). Each commit writes ONE side dataset
  * `bloom/<commitId>` (parquet rows `path, col, tag, bits`) in one
  * extra pass over the already-pinned staged frame, and every new
  * [[DataFileEntry]] records the dataset in `bloom`. Sizing:
  * `spark.graft.stats.bloomExpectedItems` (default 8192; ~1.2 KB/file
  * at the default fpp) and `spark.graft.stats.bloomFpp` (default
  * 0.03). OVERFILLING IS SOUND: a file with more distinct values than
  * `expectedItems` degrades its false-positive rate (keeps more files),
  * never its false-negative rate (zero, structurally) — pruning power
  * fades, answers never break. Supported domains: integral, string,
  * date, timestamp (float/double/decimal equality probes are rare and
  * canonicalization-fraught; they simply don't index).
  *
  * READ SIDE: after the min/max box prune, [[prune]] drops every file
  * whose bloom REFUTES a conjunct `col = v` / `col IN (…)` probe
  * (all of an IN's values absent). Consult cost is driver-bounded: one
  * small parquet read per REFERENCED commit dataset (one row per
  * file×column of that commit), memoized per table+commit in a bounded
  * LRU, and capped by `spark.graft.bloom.driverMaxBytes` (default
  * 64 MB) — an oversized dataset is skipped (sound), never loaded.
  * Missing datasets / unknown tags / untranslatable literals all keep
  * the file. The scan's residual filters re-check every row, so a
  * false positive costs one extra file read, never a wrong row.
  *
  * LIFECYCLE: the dataset is content-addressed by commit and immutable;
  * OPTIMIZE rewrites files through the normal write path (new files
  * get fresh blooms iff the conf is set at optimize time); VACUUM
  * retires `bloom/<id>` dirs exactly like DV datasets once no retained
  * version references them.
  *
  * 100 TB shape: the index is O(files × indexed columns) small blobs
  * written map-side with zero shuffle; the consult reads only the
  * PRUNE SURVIVORS' commit datasets (metadata-scale), and a point
  * probe's file-open count stays flat as the table grows — the
  * ScaleProbe `bloom_prune` row pins this.
  */
object BloomIndex {

  /** Canonical hash domain of a column type — build and probe MUST
    * agree on it or skipping would be unsound. None = not indexable. */
  def tagFor(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("long")
    case StringType => Some("string")
    case DateType => Some("date")
    case TimestampType => Some("timestamp")
    case _ => None
  }

  /** Literal → canonical put/probe value for `tag`. None = not
    * representable in the domain (probe keeps the file; build skips the
    * value — but build only ever sees the column's own type, which
    * always converts). */
  private def canonical(tag: String, v: Any): Option[Any] = (tag, v) match {
    case (_, null) => None
    case ("long", n: java.lang.Byte) => Some(n.longValue)
    case ("long", n: java.lang.Short) => Some(n.longValue)
    case ("long", n: java.lang.Integer) => Some(n.longValue)
    case ("long", n: java.lang.Long) => Some(n.longValue)
    case ("string", s: String) => Some(s)
    case ("date", d: java.sql.Date) => Some(d.toLocalDate.toEpochDay)
    case ("date", d: java.time.LocalDate) => Some(d.toEpochDay)
    case ("timestamp", t: java.sql.Timestamp) =>
      val i = t.toInstant
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case ("timestamp", i: java.time.Instant) =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  private def put(bf: BloomFilter, tag: String, v: Any): Unit =
    canonical(tag, v).foreach {
      case l: Long => bf.putLong(l)
      case s: String => bf.putString(s)
    }

  private def mightContain(bf: BloomFilter, tag: String, v: Any): Boolean =
    canonical(tag, v) match {
      case Some(l: Long) => bf.mightContainLong(l)
      case Some(s: String) => bf.mightContainString(s)
      case _ => true // untranslatable literal: cannot refute
    }

  /** The bloom-indexed (physicalName, tag) pairs of a PHYSICAL-named
    * write schema. Resolution order: the TABLE's declared
    * `graft.stats.bloomCols` property beats the session's
    * `spark.graft.stats.bloomCols` conf — a declared contract indexes
    * the same columns from every writer on every cluster; the conf is
    * the per-session opt-in for tables that never declared one. */
  private[graft] def indexedColumns(s: SparkSession, schema: StructType,
      columnMap: Map[String, String],
      tableProps: Map[String, String] = Map.empty): Seq[(String, String)] =
    tableProps.get("graft.stats.bloomCols")
      .orElse(s.conf.getOption("spark.graft.stats.bloomCols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
      .flatMap { logical =>
        val phys = MergeTable.physOf(columnMap, logical)
        schema.fields.find(_.name.equalsIgnoreCase(phys))
          .flatMap(f => tagFor(f.dataType).map(t => (f.name, t)))
      }.distinct

  /** (expectedItems, fpp) sizing, table property first, session conf
    * second, defaults last. */
  private[graft] def sizing(s: SparkSession,
      tableProps: Map[String, String]): (Long, Double) = {
    val expected = tableProps.get("graft.stats.bloomExpectedItems")
      .orElse(s.conf.getOption("spark.graft.stats.bloomExpectedItems"))
      .map(_.trim.toLong).getOrElse(8192L)
    val fpp = tableProps.get("graft.stats.bloomFpp")
      .orElse(s.conf.getOption("spark.graft.stats.bloomFpp"))
      .map(_.trim.toDouble).getOrElse(0.03)
    (expected, fpp)
  }

  private val rowSchema = StructType(Seq(
    StructField("pid", IntegerType, nullable = false),
    StructField("col", StringType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("bits", BinaryType, nullable = false)))

  private val backfillRowSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("col", StringType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("bits", BinaryType, nullable = false)))

  /** Build one bloom per (written file, indexed column) in a single
    * map-side pass over the pinned staged frame — no shuffle, the
    * partition that wrote `part-<pid>` builds that file's blooms.
    * `pathOfPid` is the commit's pid → relative-path listing (driver-
    * known, broadcast). Datasets are SHARDED under the consult cap
    * exactly like the backfill's: a normal incremental commit fits one
    * `bloom/<commitId>` dataset, while a bulk-load commit whose single
    * dataset would exceed `spark.graft.bloom.driverMaxBytes` (and so be
    * silently skipped by every consult) splits into
    * `bloom/<commitId>-<k>`, each ≈ half the cap. Returns each written
    * file's dataset ref (empty when the partition set is empty). */
  private[graft] def writeBlooms(staged: DataFrame,
      cols: Seq[(String, String)], expectedItems: Long, fpp: Double,
      table: String, commitId: String,
      pathOfPid: Map[Int, String]): Map[String, String] = {
    if (pathOfPid.isEmpty) return Map.empty
    val spark = staged.sparkSession
    val names = cols.map(_._1)
    val tags = cols.map(_._2)
    val perFileBytes = serializedBytes(expectedItems, fpp) * cols.size + 256L
    val cap = spark.conf.getOption("spark.graft.bloom.driverMaxBytes")
      .map(_.toLong).getOrElse(64L * 1024 * 1024)
    val chunkFiles = math.max(1L, (cap / 2) / perFileBytes).toInt
    val relOfPath: Map[String, String] =
      if (pathOfPid.size <= chunkFiles)
        pathOfPid.values.map(_ -> s"bloom/$commitId").toMap
      else pathOfPid.values.toSeq.sorted.zipWithIndex.map { case (p, i) =>
        p -> s"bloom/$commitId-${i / chunkFiles}"
      }.toMap
    val src = staged.select(
      spark_partition_id().as("__pid") +: names.map(col): _*)
    val bloomRows = src.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val bfs = tags.map(_ => BloomFilter.create(expectedItems, fpp))
        var pid = -1
        while (it.hasNext) {
          val r = it.next()
          pid = r.getInt(0)
          var i = 0
          while (i < bfs.size) {
            val v = r.get(i + 1)
            if (v != null) put(bfs(i), tags(i), v)
            i += 1
          }
        }
        bfs.indices.iterator.map { i =>
          val bos = new ByteArrayOutputStream()
          bfs(i).writeTo(bos)
          Row(pid, names(i), tags(i), bos.toByteArray)
        }
      }
    }(org.apache.spark.sql.Encoders.row(rowSchema))
    val pidPathRows = new java.util.ArrayList[Row](pathOfPid.size)
    pathOfPid.toSeq.sortBy(_._1).foreach { case (p, f) =>
      pidPathRows.add(Row(p, f, relOfPath(f)))
    }
    val pidPath = spark.createDataFrame(pidPathRows,
      StructType(Seq(
        StructField("pid", IntegerType, nullable = false),
        StructField("path", StringType, nullable = false),
        StructField("rel", StringType, nullable = false))))
    // ONE job whatever the shard count: rows land under a staging dir
    // partitioned by target dataset, and the shard dirs then MOVE to
    // their flat `bloom/<commitId>[-k]` homes (driver-side renames —
    // the flat layout is what the vacuum sweep and the consult expect)
    val joined = bloomRows.join(broadcast(pidPath), "pid")
      .select(col("rel"), col("path"), col("col"), col("tag"), col("bits"))
    val shards = relOfPath.values.toSeq.distinct
    if (shards.size == 1) {
      joined.drop("rel").coalesce(8)
        .write.mode("overwrite").parquet(s"$table/${shards.head}")
    } else {
      val stage = s"bloom/.stage-$commitId"
      joined.withColumn("rel",
        element_at(split(col("rel"), "/"), -1))
        .write.partitionBy("rel").mode("overwrite")
        .parquet(s"$table/$stage")
      try shards.foreach { r =>
        val leaf = r.split('/').last
        java.nio.file.Files.move(
          java.nio.file.Paths.get(table, stage, s"rel=$leaf"),
          java.nio.file.Paths.get(table, r))
      } finally MergeTable.deleteDir(java.nio.file.Paths.get(table, stage))
    }
    relOfPath
  }

  /** BACKFILL build ([[graft.ops.MergeTable.bloomBackfill]]): one
    * column-pruned read-only scan over `paths` (table-relative), blooms
    * built per (file, column) inside each read partition and MERGED
    * across partitions (same sizing ⇒ compatible bitsets), written as
    * the standard dataset at `<table>/<rel>`. Missing columns in old
    * files read as null and contribute nothing (refute-only stays
    * sound). Returns false (nothing written) when `paths` is empty. */
  private[graft] def buildBackfill(spark: SparkSession, table: String,
      paths: Seq[String], cols: Seq[(String, String)], expectedItems: Long,
      fpp: Double, rel: String): Boolean = {
    if (paths.isEmpty || cols.isEmpty) return false
    val names = cols.map(_._1)
    val tags = cols.map(_._2)
    // read the TARGET files only, bloom columns only (explicit schema =
    // column pruning + null-fill for pre-widening files); keep each
    // row's source file to key the blooms
    val readSchema = StructType(cols.map { case (n, tag) =>
      StructField(n, tag match {
        case "long" => LongType
        case "string" => StringType
        case "date" => DateType
        case "timestamp" => TimestampType
      }, nullable = true)
    })
    // the parquet reader reports absolute/URI file names; entries are
    // table-relative — match on the last three segments
    // (data/<commit>/<part-file>), which IS the entry path shape.
    // Conversion happens ONCE PER FILE at emit (and the hot loop keys
    // by the raw reported name, caching the last-seen lookup — the
    // reader hands long runs of rows from one file, so the per-row cost
    // is a reference compare, not a string split)
    def relOf(abs: String): String =
      abs.split('/').takeRight(3).mkString("/")
    val src = spark.read.schema(readSchema)
      .parquet(paths.map(p => s"$table/$p"): _*)
      .select(input_file_name().as("__file") +: names.map(col): _*)
    val partial = src.mapPartitions { it =>
      val perFile = scala.collection.mutable.HashMap
        .empty[String, Array[BloomFilter]]
      var lastAbs: String = null
      var lastBfs: Array[BloomFilter] = null
      while (it.hasNext) {
        val r = it.next()
        val abs = r.getString(0)
        if (lastAbs == null || abs != lastAbs) {
          lastBfs = perFile.getOrElseUpdate(abs,
            tags.map(_ => BloomFilter.create(expectedItems, fpp)).toArray)
          lastAbs = abs
        }
        val bfs = lastBfs
        var i = 0
        while (i < bfs.length) {
          val v = r.get(i + 1)
          if (v != null) put(bfs(i), tags(i), v)
          i += 1
        }
      }
      perFile.iterator.flatMap { case (abs, bfs) =>
        val p = relOf(abs)
        bfs.indices.iterator.map { i =>
          val bos = new ByteArrayOutputStream()
          bfs(i).writeTo(bos)
          Row(p, names(i), tags(i), bos.toByteArray)
        }
      }
    }(org.apache.spark.sql.Encoders.row(backfillRowSchema))
    // a file read across several partitions yields several partial
    // blooms — OR them into one (typed reduce, no UDF)
    import spark.implicits._
    val merged = partial.as[(String, String, String, Array[Byte])]
      .groupByKey { case (p, c, _, _) => (p, c) }
      .reduceGroups { (a, b) =>
        val x = BloomFilter.readFrom(new ByteArrayInputStream(a._4))
        x.mergeInPlace(BloomFilter.readFrom(new ByteArrayInputStream(b._4)))
        val bos = new ByteArrayOutputStream()
        x.writeTo(bos)
        (a._1, a._2, a._3, bos.toByteArray)
      }
      .map(_._2)
      .toDF("path", "col", "tag", "bits")
    merged.coalesce(8).write.mode("overwrite").parquet(s"$table/$rel")
    true
  }

  // ---- consult side ------------------------------------------------------

  /** Per-conjunct equality probes a bloom can refute: `col = v`,
    * null-safe equals with a non-null literal, and null-free `IN`
    * lists, walked through AND. Column names are resolved to PHYSICAL
    * and lowercased (the dataset keys). Everything else contributes
    * nothing (never prunes — the box prune and residual filters own
    * those shapes). */
  private[graft] def equalityProbes(filters: Seq[Filter],
      resolve: String => String): Seq[(String, Seq[Any])] = {
    def norm(a: String): String =
      resolve(a).toLowerCase(java.util.Locale.ROOT)
    def walk(f: Filter): Seq[(String, Seq[Any])] = f match {
      case EqualTo(a, v) if v != null => Seq((norm(a), Seq(v)))
      case EqualNullSafe(a, v) if v != null => Seq((norm(a), Seq(v)))
      case In(a, vs) if vs != null && vs.nonEmpty && !vs.contains(null) =>
        Seq((norm(a), vs.toSeq))
      case And(l, r) => walk(l) ++ walk(r)
      case _ => Seq.empty
    }
    filters.flatMap(walk)
  }

  private type Loaded = Map[(String, String), (String, BloomFilter)]

  /** Bounded LRU of successfully loaded commit datasets keyed by
    * `<table>/<rel>` (failures/skips are NOT cached — they re-check on
    * the next consult and heal without eviction). Access-ordered so
    * repeated point lookups over a hot table never re-read parquet. */
  private val MaxLoadedRefs = 32
  private val loadedRefs =
    new java.util.LinkedHashMap[String, Option[Loaded]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[Loaded]]): Boolean =
        size() > MaxLoadedRefs
    }

  /** Spec/probe hook: how many dataset loads actually hit parquet. */
  private[graft] val loadCount = new java.util.concurrent.atomic.AtomicLong

  /** Over-cap skips memoized by (dataset, cap): the datasets are
    * immutable (content-addressed by commit / backfill run), so a size
    * verdict is deterministic for a given cap — memoizing it avoids an
    * O(files) directory re-walk per query on a table whose stamped
    * dataset is oversized, while a RAISED cap changes the key and
    * re-probes immediately. Transient read errors stay uncached. */
  private val oversized =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Boolean]

  /** Serialized size of one bloom at this sizing (driver-side, exact —
    * used to shard backfill datasets under the consult cap). */
  private[graft] def serializedBytes(expectedItems: Long, fpp: Double): Long = {
    val bos = new ByteArrayOutputStream()
    BloomFilter.create(expectedItems, fpp).writeTo(bos)
    bos.size().toLong
  }

  /** Does `rel` hold an entry for EVERY column in `colsLc` (lowercased
    * physical names) for this file? Some(false) = provably not covered
    * (backfill should re-index); Some(true) = covered; None = the
    * dataset is unreadable/over-cap — coverage unknowable. */
  private[graft] def covers(spark: SparkSession, table: String, rel: String,
      path: String, colsLc: Seq[String]): Option[Boolean] =
    load(spark, table, rel).map(idx =>
      colsLc.forall(c => idx.contains((path, c))))

  /** Spec hook: drop the memo (e.g. after moving datasets on disk). */
  private[graft] def resetLoadedForTest(): Unit = {
    loadedRefs.synchronized { loadedRefs.clear() }
    oversized.clear()
  }

  private def load(spark: SparkSession, table: String,
      rel: String): Option[Loaded] = {
    val key = s"$table/$rel"
    // memo check and insert hold the monitor; the parquet read runs
    // OUTSIDE it — two concurrent scans of unrelated tables must not
    // serialize on a global lock for the duration of a driver-side read
    // (a rare duplicate load is idempotent, last write wins)
    loadedRefs.synchronized {
      val cached = loadedRefs.get(key)
      if (cached != null) return cached
    }
    val cap = spark.conf
      .getOption("spark.graft.bloom.driverMaxBytes")
      .map(_.toLong).getOrElse(64L * 1024 * 1024)
    if (oversized.containsKey((key, cap))) return None
    val v: Option[Loaded] =
      try {
        val dir = java.nio.file.Paths.get(table, rel)
        val sz = {
          val st = java.nio.file.Files.list(dir)
          try st.iterator().asScala
            .filter(p => java.nio.file.Files.isRegularFile(p))
            .map(p => java.nio.file.Files.size(p)).sum
          finally st.close()
        }
        if (sz > cap) { oversized.put((key, cap), true); None }
        else {
          loadCount.incrementAndGet()
          Some(spark.read.parquet(s"$table/$rel")
            .select("path", "col", "tag", "bits")
            .collect().map { r =>
              (r.getString(0),
                r.getString(1).toLowerCase(java.util.Locale.ROOT)) ->
                ((r.getString(2), BloomFilter.readFrom(
                  new ByteArrayInputStream(r.getAs[Array[Byte]](3)))))
            }.toMap)
        }
      } catch { case _: Exception => None } // missing/corrupt: never prune
    // cache SUCCESSES only: a skip (over the driver cap, vacuumed dir,
    // transient read error) re-checks on the next consult — the re-check
    // is a cheap directory stat, and a raised cap / repaired dataset
    // heals immediately instead of after 32 evictions
    if (v.nonEmpty) loadedRefs.synchronized { loadedRefs.put(key, v) }
    v
  }

  /** Drop every file whose bloom PROVES the probe value(s) absent.
    * Refute-only, stacked AFTER the min/max box prune: a file without a
    * bloom ref, an unloadable dataset, an unindexed column, or an
    * untranslatable literal always keeps the file. */
  def prune(spark: SparkSession, table: String, files: Seq[DataFileEntry],
      filters: Seq[Filter],
      resolve: String => String = identity): Seq[DataFileEntry] = {
    if (files.isEmpty || filters.isEmpty) return files
    if (!files.exists(_.bloom.nonEmpty)) return files
    val probes = equalityProbes(filters, resolve)
    if (probes.isEmpty) return files
    files.filter { f =>
      f.bloom match {
        case None => true
        case Some(rel) => load(spark, table, rel) match {
          case None => true
          case Some(idx) => probes.forall { case (c, vs) =>
            idx.get((f.path, c)) match {
              case None => true
              case Some((tag, bf)) => vs.exists(mightContain(bf, tag, _))
            }
          }
        }
      }
    }
  }
}
