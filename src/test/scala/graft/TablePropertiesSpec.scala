package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeTable
import graft.sources.GraftScanAudit

/** Versioned table properties (`ALTER TABLE … SET/UNSET TBLPROPERTIES`).
  * The matrix: set/unset round-trip as metadata-only commits, time
  * travel shows each version's own map, RESTORE restores the target's,
  * reserved / unknown-engine / invalid-engine keys are rejected loudly
  * BEFORE any commit, and the load-bearing consumer works end-to-end —
  * a table-declared `graft.stats.bloomCols` drives per-file bloom
  * indexing with NO session conf set (and beats the session conf when
  * both exist), so every writer honors the same declared contract.
  */
class TablePropertiesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_props_$tag")
      .resolve("t").toString

  private def seed(t: String): Unit =
    MergeTable.mergeUpsert(spark, t,
      (0L until 512L).map(i => (i % 8, i, s"e$i")).toDF(
        "g", "event_id", "tag"),
      Seq("g", "event_id"), Seq("g"),
      targetRowsPerFile = 64, txn = Some(("w", 0L)))

  test("set/unset round-trip: metadata-only commits, versioned state, " +
    "time travel shows each version's own map") {
    val t = fresh("roundtrip")
    seed(t)
    val v0 = MergeTable.latestManifest(t).get.version
    val v1 = MergeTable.setProperties(spark, t,
      Map("team" -> "etl", "graft.stats.bloomCols" -> "event_id"))
    assert(v1 == v0 + 1)
    val head = MergeTable.latestManifest(t).get
    assert(head.properties == Map(
      "team" -> "etl", "graft.stats.bloomCols" -> "event_id"))
    assert(head.files == MergeTable.manifestAt(t, v0).get.files,
      "a property commit must not touch the file listing")
    // the pre-set version still shows no properties (versioned state)
    assert(MergeTable.manifestAt(t, v0).get.properties.isEmpty)
    // unset one key; unknown keys are loud unless ifExists
    val v2 = MergeTable.unsetProperties(t, Seq("team"))
    assert(MergeTable.latestManifest(t).get.properties.keySet ==
      Set("graft.stats.bloomCols"))
    intercept[Exception] { MergeTable.unsetProperties(t, Seq("ghost")) }
    assert(MergeTable.unsetProperties(t, Seq("ghost"), ifExists = true) == v2)
  }

  test("reserved, unknown-engine and invalid-engine keys are rejected " +
    "before any commit") {
    val t = fresh("reject")
    seed(t)
    val v = MergeTable.latestManifest(t).get.version
    // first-class facts are not properties
    intercept[IllegalArgumentException] {
      MergeTable.setProperties(spark, t, Map("keys" -> "tag"))
    }
    // unknown graft.* = probable typo, rejected
    intercept[IllegalArgumentException] {
      MergeTable.setProperties(spark, t, Map("graft.stats.blomCols" -> "x"))
    }
    // engine-key validation: unknown column, non-indexable type, bad fpp
    intercept[Exception] {
      MergeTable.setProperties(spark, t,
        Map("graft.stats.bloomCols" -> "no_such"))
    }
    intercept[Exception] {
      MergeTable.setProperties(spark, t,
        Map("graft.stats.bloomFpp" -> "1.5"))
    }
    assert(MergeTable.latestManifest(t).get.version == v,
      "every rejected set must leave the version unchanged")
  }

  test("a table-declared bloomCols drives indexing with NO session conf " +
    "and beats a conflicting session conf") {
    val t = fresh("declared")
    seed(t)
    assert(spark.conf.getOption("spark.graft.stats.bloomCols").isEmpty)
    MergeTable.setProperties(spark, t,
      Map("graft.stats.bloomCols" -> "event_id"))
    // next write indexes from the DECLARATION (no session conf at all)
    MergeTable.mergeUpsert(spark, t,
      (512L until 1024L).map(i => (i % 8, i, s"e$i")).toDF(
        "g", "event_id", "tag"),
      Seq("g", "event_id"), Seq("g"),
      targetRowsPerFile = 64, txn = Some(("w", 1L)))
    val head = MergeTable.latestManifest(t).get
    val newFiles = head.files.filter(_.bloom.nonEmpty)
    assert(newFiles.nonEmpty, "declared bloomCols must index new files")
    // and the probe path prunes: an equality probe on the NEW key range
    // opens exactly its true-positive files, not the whole overlap set
    graft.ops.BloomIndex.resetLoadedForTest()
    GraftScanAudit.reset()
    val got = spark.read.format("graft").load(t)
      .where(col("event_id") === 700L).collect()
    assert(got.length == 1)
    val opened = GraftScanAudit.lastFor(t).map(_.scannedFiles).getOrElse(-1)
    assert(opened >= 1 && opened < newFiles.size,
      s"bloom must refute non-matching new files (opened $opened of " +
        s"${head.files.size} live / ${newFiles.size} indexed)")
    // a conflicting session conf loses to the declaration: write with
    // conf naming a different column; new files still index event_id
    val prior = spark.conf.getOption("spark.graft.stats.bloomCols")
    spark.conf.set("spark.graft.stats.bloomCols", "tag")
    try MergeTable.mergeUpsert(spark, t,
      (1024L until 1100L).map(i => (i % 8, i, s"e$i")).toDF(
        "g", "event_id", "tag"),
      Seq("g", "event_id"), Seq("g"),
      targetRowsPerFile = 64, txn = Some(("w", 2L)))
    finally prior match {
      case Some(p) => spark.conf.set("spark.graft.stats.bloomCols", p)
      case None => spark.conf.unset("spark.graft.stats.bloomCols")
    }
    val wave3 = MergeTable.latestManifest(t).get.files
      .filter(f => f.bloom.nonEmpty &&
        f.bloom != newFiles.head.bloom && head.files.forall(_.path != f.path))
    assert(wave3.nonEmpty)
    val ds = spark.read.parquet(s"$t/${wave3.head.bloom.get}")
    assert(ds.select("col").distinct().collect().map(_.getString(0)).toSet ==
      Set("event_id"),
      "the table declaration must beat the session conf")
  }

  test("multi-key SET TBLPROPERTIES is ONE commit, atomically validated: " +
    "a bad key rejects the whole statement with nothing applied") {
    val t = fresh("atomic")
    seed(t)
    val v = MergeTable.latestManifest(t).get.version
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` SET TBLPROPERTIES " +
        "('team' = 'etl', 'graft.stats.bloomCols' = 'no_such')")
    }
    val head = MergeTable.latestManifest(t).get
    assert(head.version == v && head.properties.isEmpty,
      "a rejected statement must apply NOTHING — not its valid prefix")
    spark.sql(s"ALTER TABLE graft.`$t` SET TBLPROPERTIES " +
      "('team' = 'etl', 'env' = 'dev')")
    val head2 = MergeTable.latestManifest(t).get
    assert(head2.version == v + 1, "N keys must cost ONE commit, not N")
    assert(head2.properties == Map("team" -> "etl", "env" -> "dev"))
  }

  test("CREATE TABLE validates TBLPROPERTIES BEFORE the first commit: a " +
    "rejected property leaves no half-created table behind") {
    val t = fresh("createval")
    intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE graft.`$t` (g BIGINT, event_id BIGINT, tag STRING)
           |USING graft TBLPROPERTIES (
           |  'keys' = 'g,event_id', 'graft.stats.bloomCols' = 'no_such')
           |""".stripMargin)
    }
    assert(MergeTable.latestManifest(t).isEmpty,
      "the failed CREATE must not commit v0")
    // the corrected retry succeeds — nothing blocks it
    spark.sql(
      s"""CREATE TABLE graft.`$t` (g BIGINT, event_id BIGINT, tag STRING)
         |USING graft TBLPROPERTIES (
         |  'keys' = 'g,event_id', 'graft.stats.bloomCols' = 'event_id')
         |""".stripMargin)
    assert(MergeTable.latestManifest(t).get
      .properties("graft.stats.bloomCols") == "event_id")
  }

  test("rename/drop of a bloom-declared column re-points the declared " +
    "contract in the SAME commit — SHOW TBLPROPERTIES never lies") {
    val t = fresh("remap")
    seed(t)
    MergeTable.setProperties(spark, t,
      Map("graft.stats.bloomCols" -> "tag,event_id"))
    MergeTable.renameColumn(t, "tag", "label")
    assert(MergeTable.latestManifest(t).get
      .properties("graft.stats.bloomCols") == "label,event_id")
    MergeTable.dropColumn(t, "label")
    assert(MergeTable.latestManifest(t).get
      .properties("graft.stats.bloomCols") == "event_id")
    // dropping the LAST declared column retires the key entirely
    val t2 = fresh("remap2")
    seed(t2)
    MergeTable.setProperties(spark, t2,
      Map("graft.stats.bloomCols" -> "tag"))
    MergeTable.dropColumn(t2, "tag")
    assert(!MergeTable.latestManifest(t2).get
      .properties.contains("graft.stats.bloomCols"))
  }

  test("RESTORE restores the target version's property map") {
    val t = fresh("restore")
    seed(t)
    val vClean = MergeTable.latestManifest(t).get.version
    MergeTable.setProperties(spark, t, Map("team" -> "etl"))
    MergeTable.restore(t, vClean)
    assert(MergeTable.latestManifest(t).get.properties.isEmpty)
  }

  test("SQL DDL face: CREATE TABLE TBLPROPERTIES persists user + engine " +
    "keys; ALTER TABLE SET/UNSET round-trips; SHOW TBLPROPERTIES reports") {
    val t = fresh("sql")
    spark.sql(
      s"""CREATE TABLE graft.`$t` (g BIGINT, event_id BIGINT, tag STRING)
         |USING graft TBLPROPERTIES (
         |  'keys' = 'g,event_id', 'clusterBy' = 'g',
         |  'team' = 'etl', 'graft.stats.bloomCols' = 'event_id')
         |""".stripMargin)
    val head = MergeTable.latestManifest(t).get
    assert(head.properties == Map(
      "team" -> "etl", "graft.stats.bloomCols" -> "event_id"))
    // an INSERT through SQL honors the declared contract (files indexed)
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1, 10, 'x'), (2, 20, 'y')")
    assert(MergeTable.latestManifest(t).get.files.exists(_.bloom.nonEmpty))
    spark.sql(s"ALTER TABLE graft.`$t` SET TBLPROPERTIES ('env' = 'dev')")
    assert(MergeTable.latestManifest(t).get.properties("env") == "dev")
    val shown = spark.sql(s"SHOW TBLPROPERTIES graft.`$t`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("env").contains("dev") &&
      shown.get("team").contains("etl"), shown.toString)
    spark.sql(s"ALTER TABLE graft.`$t` UNSET TBLPROPERTIES ('env', 'team')")
    assert(MergeTable.latestManifest(t).get.properties.keySet ==
      Set("graft.stats.bloomCols"))
    // engine validation holds through the SQL door too
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` SET TBLPROPERTIES " +
        "('graft.stats.bloomCols' = 'no_such')")
    }
  }
}
