package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MergeTable, SimilarityOps}

/** The quantizer-retrain operator closes the drift-monitor loop: a
  * planted drifted stream trips the staleness verdict, the retrain
  * re-fits ONLY the stale cells on the drifted window, re-encodes the
  * affected vectors transactionally, restores nprobe=1 ANN recall the
  * drift had broken, leaves healthy cells untouched, and a replayed
  * retrain batch is a no-op.
  */
class QuantizerRetrainSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-retrain-$tag")
    Files.delete(p)
    p.toString
  }

  private def vecs(rows: Seq[(Long, Array[Double])]): DataFrame =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "vec")
      .select(col("vec_id"), col("vec").cast("array<double>").as("vec"))

  // geometry (dim 4): two trained cells at e0 and e1. The drifted window
  // arrives along the e2⊕e3 ridge, INTERLEAVED: even arrivals tilt a hair
  // toward c0 (x = 0.02) at 4th coords {0, .2, .4, …}, odd arrivals tilt
  // toward c1 (y = 0.02) at the midpoints {.1, .3, …}. The tilt decides
  // the OLD cell (A→c0, B→c1) while the 4th coordinate decides true
  // nearness (spacing 0.1 ≫ tilt 0.02·√2), so a c0-tilted query placed AT
  // a B member's 4th coord probes cell 0 but its true nearest neighbor
  // sits in cell 1 — the classic IVF drift failure, fully deterministic.
  private val c0 = Array(1.0, 0.0, 0.0, 0.0)
  private val c1 = Array(0.0, 1.0, 0.0, 0.0)
  private def lumpA(j: Long) = Array(0.02, 0.0, 1.0, 0.2 * j)
  private def lumpB(j: Long) = Array(0.0, 0.02, 1.0, 0.2 * j + 0.1)

  private def base: DataFrame = vecs(
    (0L until 30L).map(i => i -> Array(1.0, 0.001 * i, 0.0, 0.0)) ++
      (30L until 60L).map(i => i -> Array(0.001 * i, 1.0, 0.0, 0.0)))

  // ids interleave A/B so the re-fit's first-k seeds hit both tilts
  private def arrivals: DataFrame = vecs(
    (0L until 10L).flatMap(j => Seq(
      (100L + 2 * j) -> lumpA(j),
      (101L + 2 * j) -> lumpB(j))))

  private def cents: DataFrame =
    vecs(Seq(0L -> c0, 1L -> c1))
      .select(col("vec_id").as("cid"), col("vec").as("c_vec"))

  /** nprobe=1 recall@1 over the assignments table: for each query, brute
    * force the true NN over (base ∪ arrivals), probe the single nearest
    * centroid cell, and check the true NN is retrievable from it. */
  private def recallAt1(table: String, centroids: DataFrame,
      queries: DataFrame): Double = {
    val corpus = base.unionByName(arrivals)
    val assigned = MergeTable.read(spark, table).select("vec_id", "cid")
    val member = corpus.join(assigned, "vec_id")
    val q = queries.select(col("vec_id").as("query_id"), col("vec").as("q_vec"))
    // true NN (excluding self)
    val bf = q.crossJoin(corpus)
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("cosine_sim(q_vec, vec)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rn") === 1)
      .select(col("query_id"), col("vec_id").as("true_nn"))
    // probed cell per query
    val probe = q.crossJoin(broadcast(centroids))
      .withColumn("cos", expr("cosine_sim(q_vec, c_vec)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("query_id"), col("cid").as("probe_cell"))
    val hits = bf.join(probe, "query_id")
      .join(member.select(col("vec_id").as("true_nn"), col("cid")), "true_nn")
      .withColumn("hit", (col("cid") === col("probe_cell")).cast("int"))
      .agg(avg(col("hit"))).as[Double].head()
    hits
  }

  test("planted drift trips the monitor; retrain re-fits ONLY stale cells, " +
    "restores nprobe=1 recall, and a replayed batch is a no-op") {
    val t = fresh("loop")
    // ingest: index base under the trained quantizer
    val a0 = base.crossJoin(broadcast(cents))
      .withColumn("cos", expr("cosine_sim(vec, c_vec)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cos").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid"), lit(0L).as("resid_bp"))
    MergeTable.mergeUpsert(spark, t, a0, Seq("vec_id"), Seq("vec_id"),
      txn = Some(("ingest", 0L)))
    // naive incremental ingest of the drifted arrivals (old centroids)
    val a1 = arrivals.crossJoin(broadcast(cents))
      .withColumn("cos", expr("cosine_sim(vec, c_vec)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cos").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid"), lit(0L).as("resid_bp"))
    MergeTable.mergeUpsert(spark, t, a1, Seq("vec_id"), Seq("vec_id"),
      txn = Some(("ingest", 1L)))
    val vPre = MergeTable.latestManifest(t).get.version

    // drift really breaks nprobe=1 recall: c0-tilted queries placed AT
    // B members' 4th coords (true NN in cell 1) and vice versa
    val queries = vecs(
      (0L until 5L).map(j => (200L + j) ->
        Array(0.02, 0.0, 1.0, 0.2 * j + 0.1)) ++   // probes c0, NN = B_j
        (0L until 5L).map(j => (205L + j) ->
          Array(0.0, 0.02, 1.0, 0.2 * j)))          // probes c1, NN = A_j
    val recallBefore = recallAt1(t, cents, queries)
    assert(recallBefore == 0.0,
      s"fixture must degrade pre-retrain recall to zero, got $recallBefore")

    // retrain: monitor trips on BOTH cells (each holds high-residual
    // arrivals), re-fit runs on the drifted window, merge commits
    val r = SimilarityOps.quantizerRetrain(spark, t, base, arrivals, cents,
      txn = Some(("retrain", 2L)))
    assert(r.committed, "drift must commit a retrain")
    assert(r.staleCells == Seq(0L, 1L), s"both cells drift: ${r.staleCells}")
    assert(MergeTable.latestManifest(t).get.version == vPre + 1)

    // recall restored: the re-fit centroids sit ON the two sub-lumps
    val recallAfter = recallAt1(t, r.centroids, queries)
    assert(recallAfter == 1.0, s"retrain must restore recall, got $recallAfter")

    // healthy base members of non-stale cells would be untouched — here
    // both cells were stale, so instead pin the OTHER invariant: every
    // vector (60 base + 20 arrivals) is still assigned — re-encode
    // loses nobody
    assert(MergeTable.read(spark, t).count() == 80L)

    // monitor is clean after retrain: re-checking arrivals against the
    // updated quantizer flags nothing
    val r2 = SimilarityOps.quantizerRetrain(spark, t, base, arrivals,
      r.centroids, txn = Some(("retrain", 3L)))
    assert(!r2.committed && r2.staleCells.isEmpty,
      "post-retrain window must not re-flag")

    // replayed retrain batch: same watermark → no-op, no new version
    val vNow = MergeTable.latestManifest(t).get.version
    val r3 = SimilarityOps.quantizerRetrain(spark, t, base, arrivals, cents,
      txn = Some(("retrain", 2L)))
    assert(!r3.committed, "replay must be a no-op")
    assert(MergeTable.latestManifest(t).get.version == vNow)
  }

  test("a re-fit cell that loses all members in a Lloyd round keeps its " +
    "previous centroid — the cid space never shrinks") {
    val t = fresh("emptycell")
    val a0 = base.crossJoin(broadcast(cents))
      .withColumn("cos", expr("cosine_sim(vec, c_vec)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cos").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid"), lit(0L).as("resid_bp"))
    MergeTable.mergeUpsert(spark, t, a0, Seq("vec_id"), Seq("vec_id"),
      txn = Some(("ingest", 0L)))
    // both cells drift (10 high-residual arrivals each), but the FIRST
    // TWO arrivals by id — the re-fit's seeds for cids (0, 1) — are
    // IDENTICAL vectors: every member ties between the two seeds and the
    // lowest cid wins them all, so cell 1 wins nothing in round 1. The
    // groupBy mean-update would silently drop cid 1 and the quantizer
    // would shrink to one centroid; the carry-forward must keep cid 1 at
    // its seed.
    val arr = vecs(
      (0L until 10L).map(j => (100L + j) -> Array(0.02, 0.0, 1.0, 0.0)) ++
        (0L until 10L).map(j => (110L + j) -> Array(0.0, 0.02, 1.0, 0.0)))
    val r = SimilarityOps.quantizerRetrain(spark, t, base, arr, cents,
      txn = Some(("retrain", 1L)))
    assert(r.committed && r.staleCells == Seq(0L, 1L), s"got ${r.staleCells}")
    val cids = r.centroids.select("cid").as[Long].collect().sorted.toSeq
    assert(cids == Seq(0L, 1L),
      s"cid space must stay (0, 1) after an empty-cell round, got $cids")
    // every vector still assigned (re-encode loses nobody)
    assert(MergeTable.read(spark, t).count() == 80L)
  }

  test("no drift → no retrain, no commit, centroids unchanged") {
    val t = fresh("quiet")
    val calm = vecs((300L until 330L).map(i =>
      i -> Array(1.0, 0.001 * (i % 5), 0.0, 0.0)))
    val r = SimilarityOps.quantizerRetrain(spark, t, base, calm, cents)
    assert(!r.committed && r.staleCells.isEmpty)
    assert(MergeTable.latestManifest(t).isEmpty, "no table must be created")
    assert(r.centroids.collect().toSet == cents.collect().toSet)
  }

  test("healthy cells keep their centroids and their members' assignments " +
    "byte-untouched when only ONE cell drifts") {
    val t = fresh("scoped")
    val a0 = base.crossJoin(broadcast(cents))
      .withColumn("cos", expr("cosine_sim(vec, c_vec)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cos").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid"), lit(0L).as("resid_bp"))
    MergeTable.mergeUpsert(spark, t, a0, Seq("vec_id"), Seq("vec_id"),
      txn = Some(("ingest", 0L)))
    // drift near c0 only; arrivals near c1 stay healthy
    val arr = vecs(
      (100L until 115L).map(i => i -> lumpA(i - 100L)) ++ // stale: assigns c0
        (115L until 130L).map(i => i -> Array(0.001 * i, 1.0, 0.0, 0.0)))
    val r = SimilarityOps.quantizerRetrain(spark, t, base, arr, cents,
      txn = Some(("retrain", 1L)))
    assert(r.committed && r.staleCells == Seq(0L), s"got ${r.staleCells}")
    // c1's centroid is carried byte-identically
    val c1After = r.centroids.where(col("cid") === 1L)
      .select("c_vec").as[Seq[Double]].head()
    assert(c1After == c1.toSeq)
    // c1's base members keep cid 1
    val c1Members = MergeTable.read(spark, t)
      .where(col("vec_id") >= 30L && col("vec_id") < 60L)
      .select("cid").as[Long].collect()
    assert(c1Members.forall(_ == 1L))
  }
}
