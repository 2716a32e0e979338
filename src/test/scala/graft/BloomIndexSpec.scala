package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{BloomIndex, MergeTable}
import graft.sources.{GraftScanAudit, Tables}
import scala.jdk.CollectionConverters._

/** Per-file BLOOM point indexes: the oracled `q_point_lookup` pins the
  * VALUES; this suite pins the pruning contract the oracle cannot see —
  * which files a probe opens, soundness under saturation (false
  * positives keep files, never drop rows), the refute-only edges
  * (no-bloom tables, unindexed columns, untranslatable literals), the
  * SQL find-phase inheritance, the load memo, and the vacuum lifecycle.
  */
class BloomIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_bloom_$tag")
      .resolve("t").toString

  /** events keyed by event_id, clustered by user_id — each file's
    * event_id box spans nearly the whole id range, so min/max skipping
    * keeps every file for an event_id equality probe and any pruning
    * observed below is the bloom's. */
  private def writeFixture(t: String, bloom: Boolean,
      expectedItems: Long = 8192L): Unit = {
    val ev = Tables.read(spark, dir, "events")
    val prior = spark.conf.getOption("spark.graft.stats.bloomCols")
    val priorN = spark.conf.getOption("spark.graft.stats.bloomExpectedItems")
    if (bloom) {
      spark.conf.set("spark.graft.stats.bloomCols", "event_id,event_type")
      spark.conf.set("spark.graft.stats.bloomExpectedItems",
        expectedItems.toString)
    }
    // clusterBy must be a key subset: the composite (user_id, event_id)
    // key keeps event_id unique row identity while clustering on user
    try MergeTable.mergeUpsert(spark, t, ev,
      Seq("user_id", "event_id"), Seq("user_id"),
      targetRowsPerFile = 64, txn = Some(("seed", 0L)))
    finally {
      prior match {
        case Some(p) => spark.conf.set("spark.graft.stats.bloomCols", p)
        case None => spark.conf.unset("spark.graft.stats.bloomCols")
      }
      priorN match {
        case Some(p) =>
          spark.conf.set("spark.graft.stats.bloomExpectedItems", p)
        case None =>
          spark.conf.unset("spark.graft.stats.bloomExpectedItems")
      }
    }
  }

  private def scanned(t: String): Int =
    GraftScanAudit.lastFor(t).map(_.scannedFiles).getOrElse(-1)

  test("point probe on a non-cluster column opens only the true-positive " +
    "file(s); min/max boxes alone keep everything (the gap the bloom " +
    "closes); absent keys open zero files") {
    val withB = fresh("on"); val without = fresh("off")
    writeFixture(withB, bloom = true)
    writeFixture(without, bloom = false)
    val m = MergeTable.latestManifest(withB).get
    assert(m.files.size > 5, s"fixture must fragment: ${m.files.size} files")
    assert(m.files.forall(_.bloom.nonEmpty), "every entry carries the ref")
    val total = m.files.size

    // a mid-range key (maximally box-ambiguous under user clustering)
    val key = 501L
    val rows = spark.read.format("graft").load(withB)
      .where(col("event_id") === key).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("event_id") == key)
    val openedB = scanned(withB)
    // the no-bloom twin proves the boxes CAN'T refute this probe shape
    spark.read.format("graft").load(without)
      .where(col("event_id") === key).collect()
    val openedNo = scanned(without)
    assert(openedNo == MergeTable.latestManifest(without).get.files.size,
      s"boxes unexpectedly pruned an uncorrelated equality: $openedNo")
    // true positives: exactly one file holds the key; fpp 3% over
    // ~16 files adds at most a couple of maybes
    assert(openedB <= math.max(2, total / 4),
      s"bloom must prune to near the true-positive set: $openedB/$total")

    // an absent key refutes EVERY file (fpp-bounded)
    spark.read.format("graft").load(withB)
      .where(col("event_id") === 999999L).collect()
    assert(scanned(withB) <= 1,
      s"absent key must open ~0 files: ${scanned(withB)}/$total")
  }

  test("soundness: every present key returns exactly its row through the " +
    "bloom-pruned scan (zero false negatives, structurally)") {
    val t = fresh("sound")
    writeFixture(t, bloom = true)
    val expected = Tables.read(spark, dir, "events")
      .select(col("event_id"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every 13th key — a spread sample across the id range
    val probes = expected.keys.filter(_ % 13 == 0).toSeq.sorted
    assert(probes.size > 50)
    val got = spark.read.format("graft").load(t)
      .where(col("event_id").isin(probes: _*))
      .select(col("event_id"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == probes.map(k => k -> expected(k)).toMap,
      "a bloom may only ever keep extra files, never drop a matching row")
  }

  test("saturated bloom (expectedItems=1, grossly overfilled) degrades " +
    "pruning, never answers: results identical, files kept ≥ the " +
    "well-sized index") {
    val sat = fresh("sat")
    writeFixture(sat, bloom = true, expectedItems = 1L)
    val key = 501L
    val rows = spark.read.format("graft").load(sat)
      .where(col("event_id") === key)
      .select(col("event_id"), col("value")).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == key,
      "an overfilled bloom must still return the exact row")
  }

  test("refute-only edges: IN keeps any-of files, conjunction with an " +
    "unindexed column still prunes, a fractional literal never prunes, " +
    "and a missing dataset keeps everything") {
    val t = fresh("edges")
    writeFixture(t, bloom = true)
    val total = MergeTable.latestManifest(t).get.files.size
    val df = spark.read.format("graft").load(t)

    // IN: present + absent key — the present key's file must survive
    val in = df.where(col("event_id").isin(501L, 999999L)).collect()
    assert(in.length == 1 && in.head.getAs[Long]("event_id") == 501L)
    assert(scanned(t) <= math.max(2, total / 4))

    // conjunction: the value conjunct is not bloom-indexed (double) and
    // must not block the event_id prune
    df.where(col("event_id") === 501L && col("value") > -1e9).collect()
    assert(scanned(t) <= math.max(2, total / 4),
      "an unindexed conjunct must not disable the indexed one")

    // fractional literal against a long column: untranslatable — keep all
    val fr = df.where(col("event_id") === lit(501.5)).collect()
    assert(fr.isEmpty)

    // dataset removed out-of-band: prune degrades to keep-all, loudly
    // returning correct rows (refute-only means missing = no refutation)
    val m = MergeTable.latestManifest(t).get
    val ref = m.files.head.bloom.get
    val dest = java.nio.file.Paths.get(t, ref + ".hidden")
    java.nio.file.Files.move(java.nio.file.Paths.get(t, ref), dest)
    BloomIndex.resetLoadedForTest()
    try {
      val rows = spark.read.format("graft").load(t)
        .where(col("event_id") === 501L).collect()
      assert(rows.length == 1, "missing dataset must degrade, not drop rows")
      assert(scanned(t) == total)
    } finally {
      java.nio.file.Files.move(dest, java.nio.file.Paths.get(t, ref))
      BloomIndex.resetLoadedForTest()
    }
  }

  test("string-column probes prune too (event_type indexed): an absent " +
    "label refutes every file") {
    val t = fresh("str")
    writeFixture(t, bloom = true)
    val total = MergeTable.latestManifest(t).get.files.size
    spark.read.format("graft").load(t)
      .where(col("event_type") === "no_such_label").collect()
    assert(scanned(t) <= 1,
      s"absent string key must refute files: ${scanned(t)}/$total")
  }

  test("SQL find phases inherit the index: DELETE WHERE event_id = k " +
    "removes exactly one row, and the consult actually loaded the index") {
    val t = fresh("sql")
    writeFixture(t, bloom = true)
    val before = BloomIndex.loadCount.get()
    val n = spark.read.format("graft").load(t).count()
    spark.sql(s"DELETE FROM graft.`$t` WHERE event_id = 501")
    assert(BloomIndex.loadCount.get() >= before,
      "the find phase consults the same index")
    val after = spark.read.format("graft").load(t)
    assert(after.count() == n - 1)
    assert(after.where(col("event_id") === 501L).count() == 0)
  }

  test("BLOOMS backfill: in-place index for pre-declaration files — " +
    "zero bytes rewritten, metadata-only commit, probes prune like " +
    "write-side blooms; a WIDENED contract re-indexes; idempotent; " +
    "vacuum keeps the referenced datasets") {
    val t = fresh("backfill")
    writeFixture(t, bloom = false) // files exist, NO blooms
    val before = MergeTable.latestManifest(t).get
    assert(before.files.forall(_.bloom.isEmpty))
    // no contract declared -> loud
    intercept[Exception] { MergeTable.bloomBackfill(spark, t) }
    // declare ONE column on the table, backfill through the SQL face
    MergeTable.setProperties(spark, t,
      Map("graft.stats.bloomCols" -> "event_id"))
    val stamped = spark.sql(s"OPTIMIZE graft.`$t` BLOOMS")
      .collect().head.getInt(0)
    assert(stamped == before.files.size)
    val after = MergeTable.latestManifest(t).get
    assert(after.files.forall(_.bloom.nonEmpty))
    // IN-PLACE: the data files are the SAME paths (no rewrite)
    assert(after.files.map(_.path).sorted == before.files.map(_.path).sorted)
    // and the probe prunes exactly like a write-side index
    graft.ops.BloomIndex.resetLoadedForTest()
    val rows = spark.read.format("graft").load(t)
      .where(col("event_id") === 501L).collect()
    assert(rows.length == 1)
    assert(scanned(t) <= math.max(2, after.files.size / 4),
      s"backfilled bloom must prune: ${scanned(t)}/${after.files.size}")
    // idempotent under the SAME contract: nothing left to stamp
    assert(MergeTable.bloomBackfill(spark, t) == 0)
    // WIDEN the contract: a re-run must re-index the stamped files for
    // the new column instead of silently no-opping
    MergeTable.setProperties(spark, t,
      Map("graft.stats.bloomCols" -> "event_id,event_type"))
    assert(MergeTable.bloomBackfill(spark, t) == before.files.size)
    graft.ops.BloomIndex.resetLoadedForTest()
    spark.read.format("graft").load(t)
      .where(col("event_type") === "no_such_type").collect()
    assert(scanned(t) <= 1,
      "the widened column must refute after the re-run")
    // and event_id pruning survived the restamp
    assert(spark.read.format("graft").load(t)
      .where(col("event_id") === 501L).count() == 1)
    assert(MergeTable.bloomBackfill(spark, t) == 0)
    // vacuum keeps the datasets while the stamped version is retained
    MergeTable.vacuum(t, graceMs = 0L, retainVersions = 1)
    graft.ops.BloomIndex.resetLoadedForTest()
    assert(spark.read.format("graft").load(t)
      .where(col("event_id") === 501L).count() == 1)
  }

  test("write-side datasets shard under the consult cap too: a bulk-load " +
    "commit over the cap splits into consultable bloom/<commit>-<k> " +
    "datasets instead of one silently-skipped monolith") {
    val t = fresh("wshard")
    val prior = spark.conf.getOption("spark.graft.bloom.driverMaxBytes")
    spark.conf.set("spark.graft.bloom.driverMaxBytes", (64 * 1024).toString)
    try {
      writeFixture(t, bloom = true)
      val m = MergeTable.latestManifest(t).get
      assert(m.files.forall(_.bloom.nonEmpty))
      val refs = m.files.flatMap(_.bloom).distinct
      assert(refs.size > 1,
        s"a bulk commit over the cap must shard: got ${refs.size} dataset(s)")
      assert(refs.forall(_.matches("bloom/[-0-9a-f]+-\\d+")), refs.toString)
      graft.ops.BloomIndex.resetLoadedForTest()
      val got = spark.read.format("graft").load(t)
        .where(col("event_id") === 501L).collect()
      assert(got.length == 1)
      assert(scanned(t) <= math.max(2, m.files.size / 4),
        s"sharded write-side blooms must prune: ${scanned(t)}/${m.files.size}")
      // no staging residue
      assert(!java.nio.file.Files.list(java.nio.file.Paths.get(t, "bloom"))
        .iterator().asScala.exists(_.getFileName.toString.startsWith(".stage")))
    } finally prior match {
      case Some(p) => spark.conf.set("spark.graft.bloom.driverMaxBytes", p)
      case None => spark.conf.unset("spark.graft.bloom.driverMaxBytes")
    }
  }

  test("BLOOMS backfill shards its side datasets under the consult cap " +
    "— every shard loads, probes still prune") {
    val t = fresh("shard")
    writeFixture(t, bloom = false)
    val files = MergeTable.latestManifest(t).get.files.size
    MergeTable.setProperties(spark, t,
      Map("graft.stats.bloomCols" -> "event_id,event_type"))
    val prior = spark.conf.getOption("spark.graft.bloom.driverMaxBytes")
    // a cap small enough to force several shards but large enough that
    // each shard (≈ cap/2) stays consultable
    spark.conf.set("spark.graft.bloom.driverMaxBytes", (64 * 1024).toString)
    try {
      assert(MergeTable.bloomBackfill(spark, t) == files)
      val refs = MergeTable.latestManifest(t).get.files
        .flatMap(_.bloom).distinct
      assert(refs.size > 1,
        s"a tiny cap must shard the backfill datasets, got ${refs.size}")
      graft.ops.BloomIndex.resetLoadedForTest()
      val got = spark.read.format("graft").load(t)
        .where(col("event_id") === 501L).collect()
      assert(got.length == 1)
      assert(scanned(t) <= math.max(2, files / 4),
        s"sharded backfill must still prune: ${scanned(t)}/$files")
    } finally prior match {
      case Some(p) => spark.conf.set("spark.graft.bloom.driverMaxBytes", p)
      case None => spark.conf.unset("spark.graft.bloom.driverMaxBytes")
    }
  }

  test("load memo: a second probe against the same commit set reads " +
    "parquet zero more times") {
    val t = fresh("memo")
    writeFixture(t, bloom = true)
    spark.read.format("graft").load(t)
      .where(col("event_id") === 77L).collect() // warm
    val before = BloomIndex.loadCount.get()
    spark.read.format("graft").load(t)
      .where(col("event_id") === 333L).collect()
    assert(BloomIndex.loadCount.get() == before,
      "the second probe must be served from the memo")
  }

  test("lifecycle: OPTIMIZE rewrite + VACUUM retires the orphaned bloom " +
    "dataset; the post-vacuum probe reads the fresh index correctly") {
    val t = fresh("vac")
    writeFixture(t, bloom = true)
    val oldRefs = MergeTable.latestManifest(t).get.files.flatMap(_.bloom).toSet
    assert(oldRefs.nonEmpty)
    // rewrite through the normal write path with the conf set → new blooms
    val prior = spark.conf.getOption("spark.graft.stats.bloomCols")
    spark.conf.set("spark.graft.stats.bloomCols", "event_id")
    try MergeTable.optimize(spark, t, targetRowsPerFile = 4096)
    finally prior match {
      case Some(p) => spark.conf.set("spark.graft.stats.bloomCols", p)
      case None => spark.conf.unset("spark.graft.stats.bloomCols")
    }
    val newRefs = MergeTable.latestManifest(t).get.files.flatMap(_.bloom).toSet
    assert(newRefs.nonEmpty && newRefs.intersect(oldRefs).isEmpty,
      "the rewrite must carry fresh bloom datasets")
    MergeTable.vacuum(t, graceMs = 0L, retainVersions = 1)
    oldRefs.foreach { r =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(t, r)),
        s"orphaned dataset must retire: $r")
    }
    newRefs.foreach { r =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t, r)),
        s"live dataset must survive: $r")
    }
    BloomIndex.resetLoadedForTest()
    val rows = spark.read.format("graft").load(t)
      .where(col("event_id") === 501L).collect()
    assert(rows.length == 1)
  }
}
