package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{GenStore, StreamingSimilarity}

/** The quantizer-staleness monitor ("when to retrain" for the durable ANN
  * tier): a stream of vectors drawn from the training corpus must NOT trip
  * the retrain signal, a drifted stream MUST, and a replayed batch id must
  * not double-count. The batch form's arithmetic is oracled
  * (q_quantizer_drift); here the streaming store path is pinned against
  * the shared verdict projection.
  */
class QuantizerStalenessSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def tmpDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-qstale-$tag")
    p.toFile.deleteOnExit(); p.toString
  }

  private def corpusVectors =
    graft.sources.Tables.read(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))

  test("a fresh-corpus stream does not trip the retrain signal") {
    val store = tmpDir("fresh") + "/resid"
    StreamingSimilarity.mergeResidualsIntoStore(corpusVectors, dir, store, 0L)
    val report = StreamingSimilarity.stalenessFromStore(spark, dir, store)
    assert(report.count() > 0)
    assert(report.where(col("stale")).count() == 0,
      "training-corpus arrivals flagged the quantizer stale")
    // arrivals == corpus ⇒ per-cell incoming mean residual equals baseline
    val diverging = report.where(
      abs(col("resid_inc_bp") - col("resid_base_bp")) > 0).count()
    assert(diverging == 0, s"$diverging cells diverged on identical input")
  }

  test("a drifted stream trips the retrain signal; replay does not double-count") {
    val store = tmpDir("drift") + "/resid"
    // drifted arrivals: negate every dimension — assignments land far from
    // any trained centroid, residuals jump well past the 0.05 threshold
    val drifted = corpusVectors
      .select(col("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    StreamingSimilarity.mergeResidualsIntoStore(drifted, dir, store, 0L)
    val report = StreamingSimilarity.stalenessFromStore(spark, dir, store)
    assert(report.where(col("stale")).count() > 0,
      "negated-vector arrivals must flag at least one cell stale")

    // replayed batch id: store unchanged
    val before = GenStore.read(spark, store).get
      .agg(sum(col("n"))).collect()(0).getLong(0)
    StreamingSimilarity.mergeResidualsIntoStore(drifted, dir, store, 0L)
    val after = GenStore.read(spark, store).get
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(before == after, "replayed batch id double-counted")
  }

  test("staleness sink end-to-end: micro-batched stream accumulates like the direct merges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val store = tmpDir("sink") + "/resid"
    val cp = tmpDir("sinkcp")
    val vecs = corpusVectors
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingSimilarity.startStalenessSink(
      input.toDF().toDF("vec_id", "embedding"), dir, store, cp)
    try {
      vecs.grouped(math.max(1, vecs.size / 3)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // accumulated store == one-shot merge of the whole corpus
    val streamed = StreamingSimilarity.stalenessFromStore(spark, dir, store)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val oneShotStore = tmpDir("oneshot") + "/resid"
    StreamingSimilarity.mergeResidualsIntoStore(corpusVectors, dir, oneShotStore, 0L)
    val oneShot = StreamingSimilarity.stalenessFromStore(spark, dir, oneShotStore)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(streamed == oneShot, "micro-batched accumulation diverged from one-shot")
    assert(streamed.nonEmpty)
  }

  test("gen-store retention: a frame read before a concurrent publish stays collectable") {
    import spark.implicits._
    val store = tmpDir("gens") + "/resid"
    StreamingSimilarity.mergeResidualsIntoStore(corpusVectors, dir, store, 0L)
    // a monitoring reader takes a LAZY frame pinned to gen-0's path...
    val pinned = GenStore.read(spark, store).get
    // ...a micro-batch publishes gen-1 (pruning may run) ...
    StreamingSimilarity.mergeResidualsIntoStore(corpusVectors, dir, store, 1L)
    // ...and the reader's deferred action must still succeed (retain-2)
    assert(pinned.count() > 0, "gen-0 pruned out from under a live reader")
    // gen-2 retires gen-0: at most two generations remain on disk
    StreamingSimilarity.mergeResidualsIntoStore(corpusVectors, dir, store, 2L)
    val gens = new java.io.File(store).listFiles
      .filter(_.getName.startsWith("gen-")).map(_.getName).sorted
    assert(gens.length <= 2 && gens.contains("gen-2"), gens.mkString(","))
  }
}
