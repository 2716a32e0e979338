package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeTable

/** The WRITE doors: `df.write.format("graft")` (SaveMode semantics over
  * the transactional merge — Append = key-unique upsert, Overwrite =
  * one-commit full sync, ErrorIfExists/Ignore against table existence)
  * and `df.writeStream.format("graft")` (one merge per micro-batch,
  * exactly-once via the engine's per-writer txn watermark keyed on the
  * checkpoint location).
  */
class GraftWriteDoorSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-wd-$tag")
    Files.delete(p)
    p.toString
  }

  private def state(t: String): Map[Long, Double] =
    MergeTable.read(spark, t).select("event_id", "value")
      .as[(Long, Double)].collect().toMap

  test("batch write: first write needs keys; Append upserts; " +
    "ErrorIfExists and Ignore follow their contracts") {
    val t = fresh("modes")
    val df = (1L to 10L).map(i => (i, i * 1.0)).toDF("event_id", "value")
    intercept[Exception](df.write.format("graft").save(t))
    df.write.format("graft").option("keys", "event_id").save(t)
    assert(state(t) == (1L to 10L).map(i => i -> i * 1.0).toMap)
    // format read and engine read agree
    assert(spark.read.format("graft").load(t).count() == 10L)

    // Append = upsert on the key-unique table
    (8L to 12L).map(i => (i, 99.0)).toDF("event_id", "value")
      .write.format("graft").mode(SaveMode.Append).save(t)
    val s1 = state(t)
    assert(s1.size == 12 && s1(8L) == 99.0 && s1(12L) == 99.0 && s1(1L) == 1.0)

    // ErrorIfExists refuses, Ignore no-ops — both leave the version alone
    val v = MergeTable.latestManifest(t).get.version
    intercept[Exception](df.write.format("graft")
      .mode(SaveMode.ErrorIfExists).save(t))
    df.write.format("graft").mode(SaveMode.Ignore).save(t)
    assert(MergeTable.latestManifest(t).get.version == v)

    // a keys option disagreeing with the table's pinned keys rejects
    intercept[Exception]((1L to 2L).map(i => (i, 0.0))
      .toDF("event_id", "value").write.format("graft")
      .option("keys", "value").mode(SaveMode.Append).save(t))
  }

  test("batch Overwrite is a one-commit full sync: absent keys delete, " +
    "history still serves every pre-overwrite version") {
    val t = fresh("overwrite")
    (1L to 10L).map(i => (i, i * 1.0)).toDF("event_id", "value")
      .write.format("graft").option("keys", "event_id").save(t)
    (5L to 7L).map(i => (i, -1.0)).toDF("event_id", "value")
      .write.format("graft").mode(SaveMode.Overwrite).save(t)
    assert(state(t) == Map(5L -> -1.0, 6L -> -1.0, 7L -> -1.0))
    val m = MergeTable.latestManifest(t).get
    assert(m.version == 1L, "one commit, not delete+insert")
    assert(MergeTable.readVersion(spark, t, 0L).count() == 10L)
  }

  test("streaming sink: one transactional commit per micro-batch, " +
    "exactly-once across a checkpointed restart") {
    val t = fresh("sink")
    val ckpt = fresh("sink-ckpt")
    val input = MemoryStream[(Long, Double)](spark)
    def start() = input.toDF().toDF("event_id", "value")
      .writeStream.format("graft")
      .option("keys", "event_id")
      .option("checkpointLocation", ckpt)
      .start(t)

    val q = start()
    input.addData((1L, 1.0), (2L, 2.0))
    q.processAllAvailable()
    input.addData((2L, 20.0), (3L, 3.0))
    q.processAllAvailable()
    q.stop()
    assert(state(t) == Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0))
    val m = MergeTable.latestManifest(t).get
    assert(m.version == 1L, "two micro-batches = two commits")
    // the txn watermark carries the checkpoint-derived writer id
    assert(m.txns.keys.exists(_.startsWith("graft-sink:")), m.txns.toString)

    // restart on the same checkpoint: new data lands once, no replays
    val q2 = start()
    input.addData((4L, 4.0))
    q2.processAllAvailable()
    q2.stop()
    val s2 = state(t)
    assert(s2 == Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0, 4L -> 4.0))

    // a manual replay of an ALREADY-APPLIED batch id is a no-op commit
    val vNow = MergeTable.latestManifest(t).get.version
    val writer = m.txns.keys.find(_.startsWith("graft-sink:")).get
    MergeTable.mergeUpsert(spark, t,
      Seq((1L, 777.0)).toDF("event_id", "value"),
      Seq("event_id"), Seq("event_id"), txn = Some((writer, 0L)))
    assert(state(t)(1L) == 1.0, "replayed batch 0 must not re-apply")
    assert(MergeTable.latestManifest(t).get.version == vNow)
  }

  test("SQL INSERT INTO upserts and INSERT OVERWRITE full-syncs through " +
    "the analyzer door; both keep history") {
    val t = fresh("sqlins")
    (1L to 10L).map(i => (i, i * 1.0)).toDF("event_id", "value")
      .write.format("graft").option("keys", "event_id").save(t)
    // INSERT INTO with VALUES: new key inserts, existing key upserts
    spark.sql(s"INSERT INTO graft.`$t` VALUES (11, 11.0), (1, 100.0)")
    val s1 = state(t)
    assert(s1.size == 11 && s1(11L) == 11.0 && s1(1L) == 100.0)
    // INSERT INTO with a SELECT (positional, SQL semantics)
    spark.sql(s"INSERT INTO graft.`$t` SELECT 12L, 200.0")
    assert(state(t)(12L) == 200.0)
    // and the BY NAME form aligns out-of-order columns
    spark.sql(
      s"INSERT INTO graft.`$t` BY NAME SELECT 300.0 AS value, 13L AS event_id")
    assert(state(t)(13L) == 300.0)
    // INSERT OVERWRITE: the batch becomes the whole table, one commit
    val vBefore = MergeTable.latestManifest(t).get.version
    spark.sql(s"INSERT OVERWRITE graft.`$t` VALUES (5, 5.5), (99, 9.9)")
    assert(state(t) == Map(5L -> 5.5, 99L -> 9.9))
    assert(MergeTable.latestManifest(t).get.version == vBefore + 1)
    assert(MergeTable.readVersion(spark, t, vBefore).count() == 13L)
    // a missing target fails loudly (the catalog's not-found, raised
    // before the rule swap — tables are created by their first commit)
    val miss = fresh("sqlins-miss")
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO graft.`$miss` VALUES (1, 1.0)"))
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.contains("first transactional commit"), e.getMessage)
  }

  test("SQL CREATE TABLE / DROP TABLE: the DDL face of the first-commit " +
    "protocol — empty v0, then the full SQL lifecycle on top") {
    val t = fresh("ddl")
    spark.sql(
      s"""CREATE TABLE graft.`$t` (event_id BIGINT, value DOUBLE)
         |USING graft TBLPROPERTIES ('keys' = 'event_id')""".stripMargin)
    val m0 = MergeTable.latestManifest(t).get
    assert(m0.version == 0L && m0.files.isEmpty)
    assert(m0.keys == Seq("event_id"))
    // empty reads serve the schema
    val empty = spark.sql(s"SELECT * FROM graft.`$t`")
    assert(empty.columns.toSeq == Seq("event_id", "value") && empty.count() == 0)
    // the whole lifecycle in SQL: insert, update, merge, read, history
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1, 1.0), (2, 2.0)")
    spark.sql(s"UPDATE graft.`$t` SET value = value * 10 WHERE event_id = 2")
    assert(state(t) == Map(1L -> 1.0, 2L -> 20.0))
    assert(MergeTable.readVersion(spark, t, 0L).count() == 0,
      "VERSION AS OF 0 is the empty create")
    // CREATE on an existing path rejects; IF NOT EXISTS no-ops
    intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`$t` (event_id BIGINT)
         |USING graft TBLPROPERTIES ('keys' = 'event_id')""".stripMargin))
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS graft.`$t` (event_id BIGINT)
         |USING graft TBLPROPERTIES ('keys' = 'event_id')""".stripMargin)
    assert(state(t).size == 2, "IF NOT EXISTS must not touch the table")
    // keys property is required and must name a column
    val t2 = fresh("ddl2")
    intercept[Exception](spark.sql(
      s"CREATE TABLE graft.`$t2` (a BIGINT) USING graft"))
    // DROP removes the tree; a recreate starts a fresh incarnation
    spark.sql(s"DROP TABLE graft.`$t`")
    assert(MergeTable.latestManifest(t).isEmpty)
    spark.sql(
      s"""CREATE TABLE graft.`$t` (event_id BIGINT, value DOUBLE)
         |USING graft TBLPROPERTIES ('keys' = 'event_id')""".stripMargin)
    assert(MergeTable.latestManifest(t).get.version == 0L)
    assert(spark.sql(s"SELECT * FROM graft.`$t`").count() == 0)
  }

  test("a streaming sink without writerId or an explicit " +
    "checkpointLocation OPTION fails loudly — a table-path-derived " +
    "writer id would let two queries share a txn watermark and drop " +
    "each other's batches as replays") {
    val t = fresh("sink-noid")
    val input = MemoryStream[(Long, Double)](spark)
    val e = intercept[Exception] {
      // checkpoint comes from the session conf, NOT the writer options —
      // invisible to createSink, so the sink must refuse rather than
      // derive a shared id from the table path
      val q = input.toDF().toDF("event_id", "value")
        .writeStream.format("graft")
        .option("keys", "event_id")
        .start(t)
      try { input.addData((1L, 1.0)); q.processAllAvailable() }
      finally q.stop()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("writerId")), msgs(e).mkString(" | "))
    assert(MergeTable.latestManifest(t).isEmpty, "nothing may commit")
  }

  test("streaming Complete mode is a per-batch full sync: keys absent " +
    "from the new result delete") {
    val t = fresh("complete")
    val ckpt = fresh("complete-ckpt")
    val input = MemoryStream[(Long, Double)](spark)
    val agg = input.toDF().toDF("k", "v")
      .groupBy(col("k").as("event_id"))
      .agg(round(sum(col("v")), 2).as("value"))
    val q = agg.writeStream.format("graft")
      .outputMode("complete")
      .option("keys", "event_id")
      .option("checkpointLocation", ckpt)
      .start(t)
    input.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
    q.processAllAvailable()
    assert(state(t) == Map(1L -> 3.0, 2L -> 5.0))
    input.addData((3L, 7.0), (1L, 1.0))
    q.processAllAvailable()
    q.stop()
    assert(state(t) == Map(1L -> 4.0, 2L -> 5.0, 3L -> 7.0))
  }
}
