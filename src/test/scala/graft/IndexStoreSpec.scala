package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IndexStore, SimilarityOps}

/** The persisted-index contract: trained IVF/PQ artifacts written to
  * parquet load back exactly, and a loaded quantizer reproduces the
  * in-session assignment path bit-for-bit.
  */
class IndexStoreSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"
  lazy val out = Files.createTempDirectory("graft_index_store").toString

  test("IVF centroids and PQ tables round-trip parquet exactly") {
    IndexStore.saveIndexes(spark, dir, out)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(IndexStore.loadIvfCentroids(spark, out)) ==
      rows(SimilarityOps.kmeansCentroids(spark, dir)))
    assert(rows(IndexStore.loadPqCodebooks(spark, out)) ==
      rows(SimilarityOps.pqCodebooks(spark, dir)))
    assert(rows(IndexStore.loadPqCodes(spark, out)) ==
      rows(SimilarityOps.pqCodes(spark, dir)))
  }

  test("a loaded quantizer reproduces in-session coarse cells bit-for-bit") {
    IndexStore.saveIndexes(spark, dir, out)
    val loaded = IndexStore.assignWithLoaded(spark, dir, out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val inSession = SimilarityOps.coarseCells(spark, dir)
      .select("vec_id", "cell")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(loaded == inSession)
    assert(loaded.map(_._2).distinct.length > 1)
  }
}
