package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeTable

/** Column mapping (log format v3): RENAME and DROP are metadata-only
  * commits — zero data-file rewrites, per-version names under time
  * travel, tombstoned physicals so re-added names never resurrect old
  * bytes, and a change feed that stays consistent across a rename.
  */
class ColumnMappingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-colmap-$tag")
    Files.delete(p)
    p.toString
  }

  private def seed(tag: String): String = {
    val t = fresh(tag)
    MergeTable.mergeUpsert(spark, t,
      (1L to 100L).map(i => (i, s"tag${i % 3}", i * 1.0))
        .toDF("event_id", "tag", "value"),
      Seq("event_id"), Seq("event_id"), targetRowsPerFile = 25)
    t
  }

  private def dataFilesOf(t: String): Set[String] =
    MergeTable.latestManifest(t).get.files.map(_.path).toSet

  test("RENAME is metadata-only: identical data files, new logical name, " +
    "same values, same stats bytes") {
    val t = seed("ren")
    val before = MergeTable.latestManifest(t).get
    val v = MergeTable.renameColumn(t, "value", "score")
    val after = MergeTable.latestManifest(t).get
    assert(v == 1L && after.version == 1L)
    assert(after.files == before.files,
      "rename must carry every file entry byte-identically")
    assert(after.columnMap == Map("score" -> "value"))
    val out = MergeTable.read(spark, t)
    assert(out.columns.toSeq == Seq("event_id", "tag", "score"))
    assert(out.agg(round(sum(col("score")), 2)).as[Double].head() == 5050.0)
    // physical parquet files still carry the OLD column name
    val aFile = after.files.head.path
    val raw = spark.read.parquet(s"$t/$aFile")
    assert(raw.columns.contains("value") && !raw.columns.contains("score"))
  }

  test("time travel reads each version under ITS OWN names") {
    val t = seed("tt")
    MergeTable.renameColumn(t, "value", "score")
    assert(MergeTable.readVersion(spark, t, 0L).columns.toSeq ==
      Seq("event_id", "tag", "value"))
    assert(MergeTable.readVersion(spark, t, 1L).columns.toSeq ==
      Seq("event_id", "tag", "score"))
    assert(MergeTable.readVersion(spark, t, 0L)
      .agg(sum(col("value"))).as[Double].head() == 5050.0)
  }

  test("merging under the renamed name lands in the SAME physical column " +
    "and old+new files read back as one") {
    val t = seed("merge")
    MergeTable.renameColumn(t, "value", "score")
    MergeTable.mergeUpsert(spark, t,
      Seq((1L, "tagx", 1000.0), (200L, "tagx", 2000.0))
        .toDF("event_id", "tag", "score"),
      Seq("event_id"), Seq("event_id"), targetRowsPerFile = 25)
    val out = MergeTable.read(spark, t)
      .select("event_id", "score").as[(Long, Double)].collect().toMap
    assert(out(1L) == 1000.0 && out(200L) == 2000.0 && out(2L) == 2.0)
    assert(out.size == 101)
    // the new files carry the PHYSICAL name (value), not the logical
    val m = MergeTable.latestManifest(t).get
    val newFile = m.files.find(f => f.maxLong("event_id") >= 200L).get
    val raw = spark.read.parquet(s"$t/${newFile.path}")
    assert(raw.columns.contains("value") && !raw.columns.contains("score"))
    // and their stats are keyed physical too → pruning on the logical
    // name still works through the map
    assert(newFile.stats.contains("value"))
  }

  test("DSv2: format read + pushed predicate on a RENAMED column prune " +
    "and return correct rows") {
    val t = seed("dsv2")
    MergeTable.renameColumn(t, "value", "score")
    graft.sources.GraftScanAudit.reset()
    val out = spark.read.format("graft").load(t)
      .where(col("score") > 90.0).select("event_id").as[Long].collect().toSet
    assert(out == (91L to 100L).toSet)
    val audit = graft.sources.GraftScanAudit.lastFor(t).get
    assert(audit.scannedFiles < audit.totalFiles,
      s"renamed-column predicate must still prune: ${audit.scannedFiles}/${audit.totalFiles}")
  }

  test("DROP is metadata-only and a re-ADDED same-name column starts " +
    "null — old bytes never resurrect") {
    val t = seed("drop")
    val before = dataFilesOf(t)
    MergeTable.dropColumn(t, "value")
    assert(dataFilesOf(t) == before)
    assert(MergeTable.read(spark, t).columns.toSeq == Seq("event_id", "tag"))
    // re-add "value" via a widening merge for a FEW keys
    MergeTable.mergeUpsert(spark, t,
      Seq((1L, "tagx", 7.0)).toDF("event_id", "tag", "value"),
      Seq("event_id"), Seq("event_id"), targetRowsPerFile = 25)
    val m = MergeTable.latestManifest(t).get
    val phys = MergeTable.physOf(m.columnMap, "value")
    assert(phys != "value", s"re-added column must take a fresh physical, got $phys")
    assert(m.retiredPhysical == Seq("value"))
    val out = MergeTable.read(spark, t)
      .select("event_id", "value").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(7.0))
    assert(out(2L).isEmpty, "untouched rows must read the re-added column " +
      "as NULL, not as the dropped column's old bytes")
    // pre-drop versions still read the original column
    assert(MergeTable.readVersion(spark, t, 0L)
      .agg(sum(col("value"))).as[Double].head() == 5050.0)
  }

  test("a re-ADD differing only by CASE from a dropped column still " +
    "takes a fresh physical (parquet resolution is case-insensitive)") {
    val t = seed("case")
    MergeTable.dropColumn(t, "value")
    MergeTable.mergeUpsert(spark, t,
      Seq((1L, "tagx", 7.0)).toDF("event_id", "tag", "Value"),
      Seq("event_id"), Seq("event_id"), targetRowsPerFile = 25)
    val m = MergeTable.latestManifest(t).get
    assert(MergeTable.physOf(m.columnMap, "Value") != "Value",
      s"case-colliding re-add must remap: ${m.columnMap}")
    val out = MergeTable.read(spark, t)
      .select("event_id", "Value").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(7.0) && out(2L).isEmpty,
      "old bytes must not resurrect through the case difference")
  }

  test("CDF stays consistent across a rename: updates diff through the " +
    "physical identity under the NEW name, preimages included") {
    val t = seed("cdf")
    MergeTable.renameColumn(t, "value", "score")          // v1
    MergeTable.mergeUpsert(spark, t,
      Seq((5L, "tag2", 500.0)).toDF("event_id", "tag", "score"),
      Seq("event_id"), Seq("event_id"), targetRowsPerFile = 25) // v2
    val feed = MergeTable.changesBetween(spark, t, 0L, 2L,
      Seq("score"), preimages = true)
      .select("event_id", "change_type", "score", "score_pre")
      .as[(Long, String, Option[Double], Option[Double])].collect()
    // only key 5 changed; the rename itself must contribute NOTHING
    // (same physical bytes on both sides)
    val touchedFile = MergeTable.latestManifest(t).get.files
      .find(f => f.minLong("event_id") <= 5L && f.maxLong("event_id") >= 5L).get
    val updates = feed.filter(_._2 == "UPDATE").toSeq
    assert(updates == Seq((5L, "UPDATE", Some(500.0), Some(5.0))),
      s"got: ${feed.toSeq}")
    // rewritten-file co-residents re-emit nothing (unchanged rows are
    // hash-skipped by the diff) — assert no DELETE/INSERT leaked for
    // unchanged keys
    assert(feed.forall(_._1 == 5L) ||
      feed.filter(_._1 != 5L).forall(r => r._2 != "DELETE" && r._2 != "INSERT"))
    assert(touchedFile.stats.contains("value"), "stats stay physical-keyed")
  }

  test("rename/drop of keys or cluster columns is rejected; rename to an " +
    "existing name is rejected") {
    val t = seed("reject")
    intercept[IllegalArgumentException](MergeTable.renameColumn(t, "event_id", "id"))
    intercept[IllegalArgumentException](MergeTable.dropColumn(t, "event_id"))
    intercept[IllegalArgumentException](MergeTable.renameColumn(t, "value", "tag"))
    intercept[IllegalArgumentException](MergeTable.renameColumn(t, "nope", "x"))
    assert(MergeTable.latestManifest(t).get.version == 0L, "no commit landed")
  }

  test("rename a→b→a lands back on an EMPTY map and v2-format records " +
    "(mapping-free tables stay readable by pre-mapping readers)") {
    val t = seed("roundtrip")
    MergeTable.renameColumn(t, "value", "score")
    MergeTable.renameColumn(t, "score", "value")
    val m = MergeTable.latestManifest(t).get
    assert(m.columnMap.isEmpty && m.retiredPhysical.isEmpty)
    assert(MergeTable.read(spark, t).columns.toSeq ==
      Seq("event_id", "tag", "value"))
    // the v2 record (map-free) vs the v1 record (mapped) format versions
    def fv(v: Long): Int = {
      val txt = new String(Files.readAllBytes(
        Paths.get(t, "_graft_log", f"v$v%020d.json")), "UTF-8")
      val jv = org.json4s.jackson.JsonMethods.parse(txt) \ "formatVersion"
      jv.asInstanceOf[org.json4s.JInt].num.toInt
    }
    assert(fv(0L) == 2, "mapping-free commits stay v2")
    assert(fv(1L) == 3, "a mapped commit must carry v3")
    assert(fv(2L) == 2, "back-to-identity lands on v2 again")
  }

  test("RESTORE across a rename restores the OLD name (the target " +
    "version's own mapping state)") {
    val t = seed("restore")
    MergeTable.renameColumn(t, "value", "score") // v1
    val v = MergeTable.restore(t, 0L)            // v2 = v0's state
    assert(v == 2L)
    assert(MergeTable.read(spark, t).columns.toSeq ==
      Seq("event_id", "tag", "value"))
    assert(MergeTable.latestManifest(t).get.columnMap.isEmpty)
  }

  test("SQL ALTER TABLE drives the full rename → read-old-version → drop " +
    "cycle through spark.sql — the last API-only lifecycle verb") {
    val t = seed("sqlalter")
    val filesBefore = dataFilesOf(t)
    // RENAME COLUMN through the catalog's alterTable door
    spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN value TO score")
    assert(MergeTable.read(spark, t).columns.toSeq ==
      Seq("event_id", "tag", "score"))
    assert(dataFilesOf(t) == filesBefore, "rename must be metadata-only")
    // the renamed column answers queries with the original bytes
    assert(spark.sql(
      s"SELECT round(sum(score), 2) AS s FROM graft.`$t`")
      .collect()(0).getDouble(0) == 5050.0)
    // time travel still reads v0 under its OWN name
    assert(spark.sql(
      s"SELECT round(sum(value), 2) AS s FROM graft.`$t` VERSION AS OF 0")
      .collect()(0).getDouble(0) == 5050.0)
    // DROP COLUMN through the same door
    spark.sql(s"ALTER TABLE graft.`$t` DROP COLUMN score")
    assert(MergeTable.read(spark, t).columns.toSeq == Seq("event_id", "tag"))
    assert(dataFilesOf(t) == filesBefore, "drop must be metadata-only")
    // pre-drop versions keep serving the dropped column
    assert(spark.sql(
      s"SELECT round(sum(score), 2) AS s FROM graft.`$t` VERSION AS OF 1")
      .collect()(0).getDouble(0) == 5050.0)
    // rejections surface through SQL too: keys, missing columns, retypes
    intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$t` RENAME COLUMN event_id TO id"))
    intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$t` DROP COLUMN event_id"))
    intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$t` ALTER COLUMN tag TYPE INT"))
    // ADD COLUMNS is metadata-only widening: old rows read back NULL…
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (note STRING)")
    assert(dataFilesOf(t) == filesBefore, "add must be metadata-only")
    assert(spark.sql(s"SELECT count(note) AS n FROM graft.`$t`")
      .collect()(0).getLong(0) == 0L)
    // …and a re-ADD of the DROPPED name takes a fresh physical: the old
    // `score` bytes (still in every data file) must NOT resurrect
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (score DOUBLE)")
    assert(spark.sql(s"SELECT count(score) AS n FROM graft.`$t`")
      .collect()(0).getLong(0) == 0L,
      "re-added column must start empty, not resurrect pre-drop bytes")
    assert(dataFilesOf(t) == filesBefore)
  }
}
