package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{GenStore, StreamingProfile}

/** The live data-quality profile must equal a single-shot batch fold of
  * the same rows EXACTLY (all stats mergeable; HLL union associative),
  * and replayed batch ids must not double-count.
  */
class StreamingProfileSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-prof-$tag")
    p.toFile.deleteOnExit(); p.toString
  }

  // (doc_id, text, lang) with some null langs and varied lengths
  private val rows: Seq[(Long, String, String)] =
    (0 until 240).map { i =>
      (i.toLong,
        ("tok " * (5 + i % 40)).trim,
        if (i % 11 == 0) null else Seq("en", "de", "fr")(i % 3))
    }

  test("streamed profile == one-shot batch fold, exactly; stats are sane") {
    val store = tmpDir("s") + "/prof"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingProfile.startProfileSink(
      input.toDF().toDF("doc_id", "text", "lang"), store, tmpDir("c"))
    try {
      rows.grouped(80).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val oneShot = tmpDir("o") + "/prof"
    StreamingProfile.mergeBatchIntoStore(
      rows.toDF("doc_id", "text", "lang"), oneShot, 0L)

    val a = StreamingProfile.profileFromStore(spark, store)
      .collect().map(_.toString).toSeq
    val b = StreamingProfile.profileFromStore(spark, oneShot)
      .collect().map(_.toString).toSeq
    assert(a == b, s"streamed $a\nvs one-shot $b")

    val byCol = StreamingProfile.profileFromStore(spark, store)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(byCol("doc_id").getAs[Long]("n_rows") == 240)
    assert(byCol("doc_id").getAs[Long]("n_distinct_est") == 240) // exact-range HLL
    assert(byCol("lang").getAs[Long]("n_nulls") == rows.count(_._3 == null))
    assert(byCol("lang").getAs[String]("min_str") == "de")
    assert(byCol("text_len").getAs[Double]("min_num") > 0)
  }

  test("replayed or stale batch ids never double-count") {
    val store = tmpDir("r") + "/prof"
    val b0 = rows.take(100).toDF("doc_id", "text", "lang")
    StreamingProfile.mergeBatchIntoStore(b0, store, 0L)
    val before = StreamingProfile.profileFromStore(spark, store)
      .collect().map(_.toString).toSeq
    StreamingProfile.mergeBatchIntoStore(b0, store, 0L) // exact replay
    val after = StreamingProfile.profileFromStore(spark, store)
      .collect().map(_.toString).toSeq
    assert(before == after)
    // progress still possible after the skip
    StreamingProfile.mergeBatchIntoStore(
      rows.slice(100, 140).toDF("doc_id", "text", "lang"), store, 1L)
    val counts = StreamingProfile.profileFromStore(spark, store)
      .where(col("column_name") === "doc_id").collect()(0)
    assert(counts.getAs[Long]("n_rows") == 140)
  }

  test("drift store is bounded under pathological source cardinality") {
    import graft.streaming.StreamingDrift
    val store = tmpDir("cap") + "/drift"
    // 10⁴ distinct sources, one doc each — a mis-tagged feed minting a
    // source per request; an uncapped store would hold 10⁴·B rows
    val pathological = (0 until 10000)
      .map(i => (i.toLong, s"src-$i", "alpha beta gamma"))
      .toDF("doc_id", "source", "text")
    StreamingDrift.mergeBatchIntoStore(pathological, store, 0L, maxSources = 50)
    val stored = GenStore.read(spark, store).get
    val srcCount = stored.select("source").distinct().count()
    assert(srcCount <= 50, s"store holds $srcCount sources, cap is 50")
    assert(stored.where(col("source") === StreamingDrift.OtherSource).count() > 0,
      "tail sources must roll into the __other bucket")
    // mass is conserved: the rollup redistributes, never drops
    val totalTokens = stored.agg(sum(col("c"))).collect()(0).getLong(0)
    assert(totalTokens == 3L * 10000, s"token mass lost: $totalTokens")
    // and a further merge stays within the cap
    StreamingDrift.mergeBatchIntoStore(
      (0 until 100).map(i => (100000L + i, s"late-$i", "delta epsilon"))
        .toDF("doc_id", "source", "text"),
      store, 1L, maxSources = 50)
    val after = GenStore.read(spark, store).get
    assert(after.select("source").distinct().count() <= 50)
    assert(after.agg(sum(col("c"))).collect()(0).getLong(0) == 3L * 10000 + 2L * 100)
  }

  test("gen store ignores foreign entries under its root") {
    import graft.streaming.StreamingDrift
    val store = tmpDir("g") + "/drift"
    StreamingDrift.mergeBatchIntoStore(
      Seq((1L, "s0", "alpha beta")).toDF("doc_id", "source", "text"), store, 0L)
    // junk a checkpoint-ish dir and a non-numeric gen name into the root
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(store, "gen-abc"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(store, "_spark_metadata"))
    // both reader and a further merge must skip them (no NumberFormatException)
    StreamingDrift.mergeBatchIntoStore(
      Seq((2L, "s0", "gamma delta")).toDF("doc_id", "source", "text"), store, 1L)
    assert(StreamingDrift.driftFromStore(spark, store).count() === 1L)
  }

  test("streamed drift report == batch sourceDrift row-for-row; replay-safe") {
    import graft.streaming.StreamingDrift
    val docsDf = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val docRows = docsDf.select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    val store = tmpDir("d") + "/drift"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingDrift.startDriftSink(
      input.toDF().toDF("doc_id", "source", "text"), store, tmpDir("dc"))
    try {
      docRows.grouped(170).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = StreamingDrift.driftFromStore(spark, store)
      .collect().map(_.toString).toSeq
    val batch = graft.ops.CorpusOps.sourceDrift(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch)

    // replaying the last batch id must not move the report
    StreamingDrift.mergeBatchIntoStore(
      docRows.takeRight(170).toDF("doc_id", "source", "text"), store, 0L)
    val after = StreamingDrift.driftFromStore(spark, store)
      .collect().map(_.toString).toSeq
    assert(after == streamed)
  }
}
