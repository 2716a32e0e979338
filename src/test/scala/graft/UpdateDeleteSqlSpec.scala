package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GraftSql, MergeTable}

/** SQL `UPDATE` / `DELETE` over graft tables: arbitrary-predicate
  * row-level writes land on the transactional engine (keyed delete /
  * guarded merge), with SQL's simultaneous-SET semantics, replay
  * watermarks, and loud rejection of rekeying updates. Both doors:
  * GraftSql.update/deleteFrom and plain spark.sql.
  */
class UpdateDeleteSqlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seed(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-upddel-$tag")
    Files.delete(p)
    val t = p.toString
    MergeTable.mergeUpsert(spark, t,
      (1L to 100L).map(i => (i, if (i % 4 == 0) "error" else "ok", i * 1.0))
        .toDF("event_id", "event_type", "value"),
      Seq("event_id"), Seq("event_id"), targetRowsPerFile = 25)
    t
  }

  private def state(t: String): Map[Long, (String, Double)] =
    MergeTable.read(spark, t)
      .select("event_id", "event_type", "value")
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("DELETE FROM with an arbitrary non-key predicate via spark.sql") {
    val t = seed("del")
    spark.sql(s"DELETE FROM graft.`$t` WHERE event_type = 'error' AND value > 50")
    val out = state(t)
    // %4==0 above 50: 52,56,...,100 (13 rows) gone
    assert(out.size == 100 - 13)
    assert(!out.contains(52L) && !out.contains(100L))
    assert(out.contains(48L) && out.contains(51L))
  }

  test("DELETE returns the deleted count and is replay-safe under txn") {
    val t = seed("delreplay")
    val stmt = s"DELETE FROM graft.`$t` WHERE value <= 10"
    assert(GraftSql.deleteFrom(spark, stmt, txn = Some(("purge", 1L))) == 10L)
    assert(GraftSql.deleteFrom(spark, stmt, txn = Some(("purge", 1L))) == 0L)
    assert(state(t).size == 90)
  }

  test("UPDATE SET evaluates every assignment against the OLD row " +
    "(simultaneous semantics) and only where the predicate holds") {
    val t = seed("upd")
    spark.sql(
      s"""UPDATE graft.`$t` SET value = value * 10, event_type = 'boosted'
         |WHERE event_id <= 3""".stripMargin)
    val out = state(t)
    assert(out(1L) == (("boosted", 10.0)))
    assert(out(3L) == (("boosted", 30.0)))
    assert(out(4L) == (("error", 4.0)), "predicate must gate the update")
    assert(out.size == 100)
  }

  test("UPDATE with a swap-shaped SET sees old values on both sides") {
    val p = Files.createTempDirectory("graft-upddel-swap")
    Files.delete(p)
    val t = p.toString
    MergeTable.mergeUpsert(spark, t,
      Seq((1L, 10.0, 20.0)).toDF("event_id", "a", "b"),
      Seq("event_id"), Seq("event_id"))
    GraftSql.update(spark, s"UPDATE graft.`$t` SET a = b, b = a")
    val (a, b) = MergeTable.read(spark, t).select("a", "b")
      .as[(Double, Double)].head()
    assert((a, b) == ((20.0, 10.0)), s"swap must not chain: ($a, $b)")
  }

  test("UPDATE of a merge key is rejected loudly; state untouched") {
    val t = seed("rekey")
    intercept[UnsupportedOperationException](GraftSql.update(spark,
      s"UPDATE graft.`$t` SET event_id = event_id + 1000"))
    assert(MergeTable.latestManifest(t).get.version == 0L)
  }

  test("UPDATE via alias-qualified references and WHERE-less UPDATE") {
    val t = seed("alias")
    spark.sql(s"UPDATE graft.`$t` AS g SET value = g.value + 0.5")
    val out = state(t)
    assert(out(1L)._2 == 1.5 && out(100L)._2 == 100.5)
  }

  test("the find-affected scan is FILE-SKIPPED: a stats-prunable " +
    "predicate's snapshot scan opens only overlapping files") {
    val t = seed("prunefind")
    val head = MergeTable.latestManifest(t).get
    assert(head.files.size >= 4)
    val scan = GraftSql.prunedSnapshot(spark, t, head, "value > 90.0")
    val opened = scan.inputFiles.toSet
    assert(opened.size < head.files.size,
      s"find phase must skip files: ${opened.size}/${head.files.size}")
    assert(scan.count() == 10L)
    // and the DELETE built on it still lands exactly
    assert(GraftSql.deleteFrom(spark,
      s"DELETE FROM graft.`$t` WHERE value > 90.0") == 10L)
    assert(state(t).size == 90)
  }

  test("UPDATE re-runs its find phase when a concurrent commit lands " +
    "between the WHERE scan and the commit (no lost update)") {
    val t = seed("toctou-upd")
    // the winner fires at the UPDATE's precommit instant: it rewrites a
    // row the UPDATE's SET was derived from — committing the stale batch
    // would clobber the winner's 1000.0 with 2.5 (value derived from the
    // OLD row 2.0). The pinned-version guard must detect the moved head
    // and re-derive, landing the serial outcome: winner first, UPDATE on
    // top of its value.
    var fired = false
    MergeTable.testPrecommitHook = () => if (!fired) {
      fired = true
      MergeTable.mergeUpsert(spark, t,
        Seq((2L, "hacked", 1000.0)).toDF("event_id", "event_type", "value"),
        Seq("event_id"), Seq("event_id"))
    }
    try spark.sql(
      s"UPDATE graft.`$t` SET value = value + 0.5 WHERE event_id <= 5")
    finally MergeTable.testPrecommitHook = () => ()
    val out = state(t)
    assert(out(2L) == (("hacked", 1000.5)),
      s"lost update: ${out(2L)} — SET must see the winner's row")
    assert(out(1L)._2 == 1.5 && out(5L)._2 == 5.5 && out(6L)._2 == 6.0)
  }

  test("DELETE re-runs its find phase when a concurrent commit changes " +
    "which rows match the WHERE") {
    val t = seed("toctou-del")
    // winner rewrites id 95's value to 5.0 — it no longer matches
    // `value > 90`; a stale key list would delete it anyway
    var fired = false
    MergeTable.testPrecommitHook = () => if (!fired) {
      fired = true
      MergeTable.mergeUpsert(spark, t,
        Seq((95L, "ok", 5.0)).toDF("event_id", "event_type", "value"),
        Seq("event_id"), Seq("event_id"))
    }
    val n =
      try GraftSql.deleteFrom(spark, s"DELETE FROM graft.`$t` WHERE value > 90")
      finally { MergeTable.testPrecommitHook = () => () }
    assert(n == 9L, s"re-found delete must skip the rewritten row, got $n")
    val out = state(t)
    assert(out(95L) == (("ok", 5.0)), "the winner's row must survive")
    assert(out.size == 91 && !out.contains(91L) && !out.contains(100L))
  }

  test("SQL writes compose: MERGE, UPDATE, DELETE against the same table " +
    "leave a consistent, time-travelable history") {
    val t = seed("compose")
    (101L to 105L).map(i => (i, "new", i * 1.0))
      .toDF("event_id", "event_type", "value")
      .createOrReplaceTempView("ud_batch")
    spark.sql(
      s"""MERGE INTO graft.`$t` AS tt USING ud_batch AS s
         |ON tt.event_id = s.event_id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)       // v1
    spark.sql(s"UPDATE graft.`$t` SET value = value * 2 WHERE event_type = 'new'") // v2
    spark.sql(s"DELETE FROM graft.`$t` WHERE event_id = 103")  // v3
    val out = state(t)
    assert(out.size == 104)
    assert(out(101L) == (("new", 202.0)) && !out.contains(103L))
    assert(MergeTable.readVersion(spark, t, 1L).count() == 105L)
    assert(MergeTable.latestManifest(t).get.version == 3L)
  }
}
