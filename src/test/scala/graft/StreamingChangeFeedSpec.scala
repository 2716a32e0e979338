package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeTable
import graft.streaming.StreamingChangeFeed

/** The streaming change-data-feed consumer: the file-stream source over
  * the commit log must deliver each committed version exactly once, the
  * per-version output must equal [[MergeTable.changesBetween]] for that
  * version pair, and a checkpoint replay must converge without
  * re-writing completed versions.
  */
class StreamingChangeFeedSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-cdfstream-$tag")
    p.toFile.deleteOnExit(); p.toString
  }

  private def rows(ids: Seq[Long], v: Double) =
    ids.map(id => (id, s"u$id", v)).toDF("event_id", "tag", "value")

  test("feed == per-version diffs; late commits are picked up; replay converges") {
    val base = tmp("feed")
    val table = s"$base/table"
    val out = s"$base/out"
    val cp = s"$base/cp"

    // two commits BEFORE the stream starts (backfill) ...
    MergeTable.mergeUpsert(spark, table, rows(1L to 6L, 1.0), Seq("event_id"), Seq("event_id"))
    MergeTable.mergeUpsert(spark, table, rows(5L to 8L, 2.0), Seq("event_id"), Seq("event_id"))

    val q = StreamingChangeFeed.startChangeFeedSink(spark, table, out, cp)
    try {
      q.processAllAvailable()
      // ... and two more while the feed is live
      MergeTable.mergeDelete(spark, table, rows(Seq(1L), 0.0))
      q.processAllAvailable()
      MergeTable.mergeUpsert(spark, table, rows(Seq(9L), 3.0), Seq("event_id"), Seq("event_id"))
      q.processAllAvailable()
    } finally q.stop()

    val feed = StreamingChangeFeed.readFeed(spark, out)
    val byVersion = feed.select("version", "event_id", "change_type")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    assert(byVersion.keySet == Set(0L, 1L, 2L, 3L))
    // v0: the full snapshot as INSERTs
    assert(byVersion(0L) == (1L to 6L).map(_ -> "INSERT").toMap)
    // v1: updates 5,6 + inserts 7,8 — must equal changesBetween exactly
    val expect1 = MergeTable.changesBetween(spark, table, 0L, 1L)
      .select("event_id", "change_type").as[(Long, String)].collect().toMap
    assert(byVersion(1L) == expect1)
    assert(byVersion(2L) == Map(1L -> "DELETE"))
    assert(byVersion(3L) == Map(9L -> "INSERT"))

    // replay from a FRESH checkpoint: completed version dirs are detected
    // by their _SUCCESS markers and not rewritten
    val before = new java.io.File(s"$out/version=1").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    val q2 = StreamingChangeFeed.startChangeFeedSink(spark, table, out, s"$base/cp2")
    try q2.processAllAvailable() finally q2.stop()
    val after = new java.io.File(s"$out/version=1").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    assert(before == after, "replay rewrote a completed feed version")
    assert(StreamingChangeFeed.readFeed(spark, out)
      .select("version").distinct().count() == 4)
  }

  test("a lagging feed heals past versions whose DATA files were collected — " +
    "manifest existence is not proof of readability") {
    val base = tmp("heal")
    val table = s"$base/table"
    val out = s"$base/out"

    MergeTable.mergeUpsert(spark, table, rows(1L to 6L, 1.0), Seq("event_id"), Seq("event_id"))
    MergeTable.mergeUpsert(spark, table, rows(5L to 8L, 2.0), Seq("event_id"), Seq("event_id"))
    // simulate vacuum outrunning the lagging feed: v0's replaced data
    // files are gone from disk while BOTH manifests still exist (the
    // ADVICE wedge: files written before the manifest can age out first)
    val m0 = MergeTable.manifestAt(table, 0L).get
    val m1 = MergeTable.manifestAt(table, 1L).get
    val m1Paths = m1.files.map(_.path).toSet
    m0.files.filterNot(f => m1Paths.contains(f.path)).foreach { f =>
      Files.delete(java.nio.file.Paths.get(table, f.path))
    }
    val q = StreamingChangeFeed.startChangeFeedSink(spark, table, out, s"$base/cp")
    try q.processAllAvailable() finally q.stop()
    // v0 is unreadable → skipped; v1 cannot diff against it → SNAPSHOT
    // boot (feed_type marks the reset), and the query never died
    val feed = StreamingChangeFeed.readFeed(spark, out)
    val versions = feed.select("version").distinct().as[Long].collect().toSet
    assert(versions == Set(1L), s"expected only the snapshot boot, got $versions")
    val v1 = feed.where(col("version") === 1L)
    assert(v1.select("feed_type").distinct().as[String].collect().toSeq ==
      Seq("snapshot"), "a boot past missing data must be marked as a reset")
    assert(v1.select("event_id", "change_type").as[(Long, String)]
      .collect().toMap == (1L to 8L).map(_ -> "INSERT").toMap)
    // the skipped version is OBSERVABLE, not a silent gap: v0 left a
    // _SKIPPED marker a reconciling consumer can enumerate
    assert(StreamingChangeFeed.skippedVersions(out) == Seq(0L))
  }

  test("a version dir carrying BOTH _SUCCESS and _SKIPPED is served as " +
    "complete and NOT reported skipped — consumers never get the " +
    "contradictory pair of signals") {
    val base = tmp("contradict")
    val table = s"$base/table"
    val out = s"$base/out"
    MergeTable.mergeUpsert(spark, table, rows(1L to 3L, 1.0),
      Seq("event_id"), Seq("event_id"))
    val q = StreamingChangeFeed.startChangeFeedSink(spark, table, out, s"$base/cp")
    try q.processAllAvailable() finally q.stop()
    // simulate the race the guard exists for: a replayed batch found v0's
    // data vacuumed AFTER another replay completed the delivery — a
    // legacy marker lands in a dir that already holds parquet + _SUCCESS
    val dir = java.nio.file.Paths.get(out, "version=0")
    assert(java.nio.file.Files.exists(dir.resolve("_SUCCESS")))
    java.nio.file.Files.write(dir.resolve("_SKIPPED"),
      "version 0 skipped: test-planted legacy marker\n".getBytes("UTF-8"))
    // the COMPLETE delivery wins on both read paths
    assert(StreamingChangeFeed.skippedVersions(out).isEmpty,
      "a completely-delivered version must not be reported skipped")
    assert(StreamingChangeFeed.readFeed(spark, out)
      .where(col("version") === 0L).count() == 3L)
  }

  test("a mid-stream column RENAME keeps the feed readable: both name " +
    "generations survive the merged read, new versions carry new names") {
    val base = tmp("renamefeed")
    val table = s"$base/table"
    val out = s"$base/out"
    MergeTable.mergeUpsert(spark, table, rows(1L to 5L, 1.0),
      Seq("event_id"), Seq("event_id"))                          // v0
    val q1 = StreamingChangeFeed.startChangeFeedSink(spark, table, out, s"$base/cp")
    try q1.processAllAvailable() finally q1.stop()
    MergeTable.renameColumn(table, "value", "score")             // v1
    MergeTable.mergeUpsert(spark, table,
      Seq((2L, "u2", 9.0)).toDF("event_id", "tag", "score"),
      Seq("event_id"), Seq("event_id"))                          // v2
    val q2 = StreamingChangeFeed.startChangeFeedSink(spark, table, out, s"$base/cp")
    try q2.processAllAvailable() finally q2.stop()
    val feed = StreamingChangeFeed.readFeed(spark, out)
    assert(feed.columns.contains("value") && feed.columns.contains("score"),
      s"merged read must keep both generations: ${feed.columns.toSeq}")
    // v0 rows speak the old name, the v2 update speaks the new one
    assert(feed.where(col("version") === 0L && col("value").isNotNull)
      .count() == 5L)
    val upd = feed.where(col("version") === 2L)
      .select("event_id", "change_type", "score")
      .as[(Long, String, Double)].collect().toSeq
    assert(upd == Seq((2L, "UPDATE", 9.0)), upd.toString)
  }

  test("preimages: an incremental consumer applies the feed — inserts add, " +
    "updates retract the old value, deletes retract — and lands on the " +
    "table's true aggregate") {
    val base = tmp("pre")
    val table = s"$base/table"
    val out = s"$base/out"

    MergeTable.mergeUpsert(spark, table, rows(1L to 8L, 10.0), Seq("event_id"), Seq("event_id"))
    MergeTable.mergeUpsert(spark, table, rows(3L to 5L, 25.0), Seq("event_id"), Seq("event_id"))
    MergeTable.mergeDelete(spark, table, Seq(1L, 7L).toDF("event_id"))
    val q = StreamingChangeFeed.startChangeFeedSink(spark, table, out, s"$base/cp")
    try q.processAllAvailable() finally q.stop()

    val feed = StreamingChangeFeed.readFeed(spark, out)
    // UPDATE rows must CARRY the preimage — not force a v−1 re-read
    val upd = feed.where(col("change_type") === "UPDATE")
      .select("event_id", "value", "value_pre")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(upd.keySet == Set(3L, 4L, 5L) &&
      upd.values.forall(_ == ((25.0, 10.0))), upd.toString)
    // DELETE rows carry ONLY the preimage (new side is null)
    val del = feed.where(col("change_type") === "DELETE")
      .select(col("event_id"), col("value_pre"), col("value").isNull)
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(del == Map(1L -> ((10.0, true)), 7L -> ((10.0, true))), del.toString)
    // the incremental application: +value on INSERT, +value−value_pre on
    // UPDATE, −value_pre on DELETE — running it over the whole feed must
    // reproduce the live table's sum exactly
    val applied = feed.select(
      sum(when(col("change_type") === "INSERT", col("value"))
        .when(col("change_type") === "UPDATE", col("value") - col("value_pre"))
        .when(col("change_type") === "DELETE", -col("value_pre"))))
      .as[Double].collect()(0)
    val direct = MergeTable.read(spark, table)
      .select(sum(col("value"))).as[Double].collect()(0)
    assert(applied == direct, s"incremental $applied != direct $direct")
  }
}
