package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeTable

/** The SQL maintenance front end (`OPTIMIZE` / `VACUUM graft.`p``) — the
  * delegating-parser grammar, the metrics rows, pass-through of every
  * other statement, and parity with the API calls the commands wrap.
  */
class MaintenanceSqlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-maintsql-$tag")
    Files.delete(p)
    p.toString
  }

  private def seed(t: String, n: Long = 400L, perFile: Long = 50L): Unit =
    MergeTable.mergeUpsert(spark,
      t, (1L to n).map(i => (i, s"e$i", i * 1.0))
        .toDF("event_id", "event_type", "value"),
      Seq("event_id"), Seq("event_id"), targetRowsPerFile = perFile)

  test("OPTIMIZE graft.`p` compacts DV debt and returns the metrics row; " +
    "case-insensitive, trailing semicolon tolerated; other SQL parses " +
    "verbatim through the delegating parser") {
    val t = fresh("opt")
    seed(t)
    MergeTable.mergeDelete(spark, t,
      Seq(3L, 7L).toDF("event_id"), deletionVectors = true)
    val before = MergeTable.latestManifest(t).get
    assert(before.files.exists(_.dv.nonEmpty))
    val r = spark.sql(s"optimize graft.`$t` ;").collect()
    assert(r.map(_.getInt(0)).toSeq.head > 0, "metrics row: rewritten files")
    assert(r.head.schema.fieldNames.toSeq == Seq("rewritten_files"))
    val after = MergeTable.latestManifest(t).get
    assert(after.files.forall(_.dv.isEmpty), "DV debt retired")
    assert(MergeTable.read(spark, t).count() == 398L)
    // the wrapper adds grammar, it never changes any: plain SQL works
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    assert(spark.range(3).count() == 3L)
  }

  test("OPTIMIZE ... ZORDER BY / SPLIT BY route to the re-layouts; both " +
    "at once rejects with the API's own error") {
    val t = fresh("optz")
    seed(t)
    val rz = spark.sql(
      s"OPTIMIZE graft.`$t` ZORDER BY (event_id, event_type)").collect()
    assert(rz.head.getInt(0) > 0)
    assert(MergeTable.read(spark, t).count() == 400L)
    val e = intercept[Exception](spark.sql(
      s"OPTIMIZE graft.`$t` ZORDER BY (event_id, event_type) " +
        "SPLIT BY (event_id)").collect())
    assert(e.getMessage.contains("not both"))
    val t2 = fresh("opts")
    seed(t2)
    val rs = spark.sql(s"OPTIMIZE graft.`$t2` SPLIT BY (event_id)").collect()
    assert(rs.head.getInt(0) >= 0)
    assert(MergeTable.read(spark, t2).count() == 400L)
    // an empty re-layout list never silently degrades to plain compaction
    assert(intercept[Exception](spark.sql(
      s"OPTIMIZE graft.`$t2` ZORDER BY ()")).getMessage
      .contains("names no columns"))
    assert(intercept[Exception](spark.sql(
      s"OPTIMIZE graft.`$t2` SPLIT BY ( )")).getMessage
      .contains("names no columns"))
  }

  test("OPTIMIZE ... LEDGERS backfills a pre-ledger table (flag on) and " +
    "rejects flag-off") {
    val t = fresh("optl")
    seed(t)
    assert(MergeTable.latestManifest(t).get.files.forall(_.bottomK.isEmpty))
    val eOff = intercept[Exception](
      spark.sql(s"OPTIMIZE graft.`$t` LEDGERS").collect())
    assert(eOff.getMessage.contains("ledgerK"))
    spark.conf.set("spark.graft.stats.ledgerK", "4")
    try {
      val r = spark.sql(s"OPTIMIZE graft.`$t` LEDGERS").collect()
      assert(r.head.getInt(0) > 0)
      assert(MergeTable.latestManifest(t).get.files.forall(
        _.bottomK.contains("event_id")), "every file ledgered")
    } finally spark.conf.unset("spark.graft.stats.ledgerK")
  }

  test("OPTIMIZE ... BLOOMS parses, refuses composing with a re-layout, " +
    "and needs a declared contract") {
    val t = fresh("optb")
    seed(t)
    // no bloom contract anywhere -> loud
    assert(intercept[Exception](
      spark.sql(s"OPTIMIZE graft.`$t` BLOOMS").collect()).getMessage
      .contains("bloomCols"))
    // composing with a re-layout is two statements, not one
    assert(intercept[Exception](spark.sql(
      s"OPTIMIZE graft.`$t` ZORDER BY (event_id, value) BLOOMS").collect())
      .getMessage.contains("two statements"))
    MergeTable.setProperties(spark, t,
      Map("graft.stats.bloomCols" -> "event_id"))
    val r = spark.sql(s"OPTIMIZE graft.`$t` BLOOMS").collect()
    assert(r.head.schema.fieldNames.toSeq == Seq("stamped_files"))
    assert(r.head.getInt(0) > 0)
    assert(MergeTable.latestManifest(t).get.files.forall(_.bloom.nonEmpty))
  }

  test("RESTORE graft.`p` TO VERSION/TIMESTAMP AS OF rolls the head " +
    "forward to the exact historical state, preserving history; a " +
    "vacuumed target rejects loudly") {
    val t = fresh("restore")
    seed(t, n = 100L, perFile = 50L) // v0
    MergeTable.mergeUpsert(spark, t,
      (1L to 100L).map(i => (i, "wave1", i + 0.5))
        .toDF("event_id", "event_type", "value"),
      Seq("event_id"), Seq("event_id"), targetRowsPerFile = 50L) // v1
    val t1 = MergeTable.history(t).find(_.version == 1L).get.timestampMs
    MergeTable.mergeDelete(spark, t, (1L to 50L).toDF("event_id")) // v2
    assert(MergeTable.read(spark, t).count() == 50L)
    // restore by VERSION: back to the full v1 state, committed as v3
    val r = spark.sql(s"RESTORE graft.`$t` TO VERSION AS OF 1").collect()
    assert(r.head.schema.fieldNames.toSeq == Seq("restored_to_version"))
    assert(r.head.getLong(0) == 3L, "the restore commits a NEW head")
    assert(MergeTable.read(spark, t).count() == 100L)
    assert(MergeTable.read(spark, t)
      .where(col("event_type") === "wave1").count() == 100L)
    // history preserved: the deleted interval stays auditable
    assert(MergeTable.history(t).map(_.version) == Seq(0L, 1L, 2L, 3L))
    // restore by TIMESTAMP string (v1's instant) → the same state, v4
    MergeTable.mergeDelete(spark, t, Seq(7L).toDF("event_id")) // v4
    val iso = java.time.Instant.ofEpochMilli(t1).toString
    val r2 = spark.sql(
      s"RESTORE graft.`$t` TO TIMESTAMP AS OF '$iso'").collect()
    assert(r2.head.getLong(0) == 5L)
    assert(MergeTable.read(spark, t).count() == 100L)
    // a vacuumed target rejects loudly instead of publishing a head
    // that references deleted files
    assert(MergeTable.vacuum(t, graceMs = 0L, retainVersions = 1) > 0)
    val ex = intercept[Exception](
      spark.sql(s"RESTORE graft.`$t` TO VERSION AS OF 0").collect())
    assert(ex.getMessage.contains("restore") ||
      ex.getMessage.contains("vacuum"), ex.getMessage)
  }

  test("VACUUM graft.`p` RETAIN n VERSIONS GRACE n MS collects retired " +
    "files, returns the count, and the head stays readable") {
    val t = fresh("vac")
    seed(t, n = 200L, perFile = 50L) // v0
    MergeTable.mergeUpsert(spark, t,
      (1L to 200L).map(i => (i, "rewrite", i + 0.5))
        .toDF("event_id", "event_type", "value"),
      Seq("event_id"), Seq("event_id"), targetRowsPerFile = 50L) // v1
    // default retention in a fresh-commit window: nothing age-eligible
    assert(spark.sql(s"VACUUM graft.`$t`").head().getInt(0) == 0)
    // DRY RUN: the preflight reports the exact would-collect count and
    // touches NOTHING — v0 stays fully readable afterwards
    val dry = spark.sql(
      s"VACUUM graft.`$t` RETAIN 1 VERSIONS GRACE 0 MS DRY RUN").collect()
    assert(dry.head.schema.fieldNames.toSeq == Seq("would_delete_files"))
    val wouldDelete = dry.head.getInt(0)
    assert(wouldDelete > 0, "the preflight must report the retired files")
    assert(MergeTable.readVersion(spark, t, 0L).count() == 200L,
      "a dry run must not collect anything")
    val r = spark.sql(
      s"VACUUM graft.`$t` RETAIN 1 VERSIONS GRACE 0 MS").collect()
    assert(r.head.getInt(0) == wouldDelete,
      "the real sweep must collect exactly what the preflight reported")
    assert(r.head.schema.fieldNames.toSeq == Seq("deleted_files"))
    assert(MergeTable.read(spark, t).count() == 200L)
    assert(MergeTable.read(spark, t)
      .where(col("event_type") === "rewrite").count() == 200L)
    // v0's data is gone (vacuum keeps log records; data presence decides)
    val ex = intercept[Exception](
      MergeTable.readVersion(spark, t, 0L).collect())
    assert(ex != null)
  }
}
