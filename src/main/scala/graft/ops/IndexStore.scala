package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the similarity tier's trained index artifacts — the
  * operational "build once per corpus version, query many" contract. The
  * in-session [[IndexMemo]] caches stand in for these materializations
  * during one run; this writes the same tables to parquet so a LATER
  * session (or another cluster) loads the index instead of re-training:
  *
  *  - IVF coarse quantizer: (cid, c_vec) — k rows;
  *  - PQ codebooks:        (j, cid, c_vec) — m·k rows;
  *  - PQ codes:            (vec_id, j, code) — n·m rows, the 16×-compressed
  *                         corpus representation ADC scans at query time.
  *
  * All three round-trip exactly (parquet doubles are lossless), so loaded
  * indexes reproduce memoized-path results bit-for-bit — pinned in
  * IndexStoreSpec by recomputing centroid assignments from a LOADED
  * quantizer and comparing to the in-session path.
  */
object IndexStore {

  /** Write the trained IVF + PQ artifacts for `dir`'s corpus under `out`. */
  def saveIndexes(s: SparkSession, dir: String, out: String): Unit = {
    // coalesce(1): each artifact is bounded (k, m·k, n·m rows) — one file
    // per table is the layout a loader wants; the big corpus NEVER routes
    // through here
    SimilarityOps.kmeansCentroids(s, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/ivf_centroids")
    SimilarityOps.pqCodebooks(s, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/pq_codebooks")
    SimilarityOps.pqCodes(s, dir)
      .write.mode("overwrite").parquet(s"$out/pq_codes")
  }

  def loadIvfCentroids(s: SparkSession, out: String): DataFrame =
    s.read.parquet(s"$out/ivf_centroids")

  def loadPqCodebooks(s: SparkSession, out: String): DataFrame =
    s.read.parquet(s"$out/pq_codebooks")

  def loadPqCodes(s: SparkSession, out: String): DataFrame =
    s.read.parquet(s"$out/pq_codes")

  /** Assign every corpus vector to its nearest LOADED centroid — the same
    * argmax/tie contract as the in-session coarse cells (cos desc, then
    * cid), so a loaded quantizer reproduces assignments exactly.
    */
  def assignWithLoaded(s: SparkSession, dir: String, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = graft.sources.Tables.read(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("cid"))
    e.crossJoin(broadcast(loadIvfCentroids(s, out)))
      .withColumn("cos", SimilarityOps.cosine(col("vec"), col("c_vec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
  }
}
