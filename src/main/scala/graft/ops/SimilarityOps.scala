package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import TextOps.hash60Sql

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Numeric-parity rules for the DuckDB oracle: vectors are cast to double
  * up front; dot products and norms are LEFT-FOLD sums over the 64 elements
  * in index order on both engines (Spark `aggregate`, DuckDB `list_sum` of a
  * `list_transform`), so scores are bit-identical — ranking never diverges.
  *
  * Scale design: the query side is always the broadcast side; candidates
  * stream map-side. Brute force is the correctness baseline (n·q work);
  * the sign-LSH variant buckets candidates so each query only scores its
  * own bucket — the 100 TB path where q·n/2^p replaces q·n.
  */
object SimilarityOps {

  val Dim = 64

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")
      .select(
        col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))

  private val embSql =
    "SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS vec FROM embeddings"

  /** Left-fold dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, $Dim + 1), i -> $a[i] * $b[i]))"

  /** Composed higher-order form — six interpreted array walks; kept as the
    * reference implementation the native expression is tested against.
    */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Native codegen'd single-pass cosine (see
    * [[graft.functions.CosineSimilarity]]); bit-identical to
    * [[cosineComposed]] by construction.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_sim(a, b)

  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  // ---- brute-force cosine top-k ------------------------------------------

  val TopK = 5
  val NQueries = 8

  /** Baseline ANN: broadcast the query set, score every candidate, keep
    * top-k per query via a ranked window (WindowGroupLimit keeps only k per
    * partition before the shuffle).
    */
  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("q_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("vec"), col("q_vec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
      .select(
        col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  val annBruteForceSql: String =
    s"""WITH e AS ($embSql),
       |q AS (SELECT vec_id AS query_id, vec AS q_vec FROM e WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |    ${cosineSql("vec", "q_vec")} AS cos
       |  FROM e, q WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin

  // ---- sign-LSH bucketed ANN ---------------------------------------------

  val LshPlanes = 6

  /** Deterministic pseudo-random hyperplane weights for (plane p, dim d) in
    * [-1, 1): md5-derived so the oracle reproduces them exactly. The planes
    * are CONSTANTS, so they are computed once at plan-build time and
    * embedded as literals — recomputing 6×64 md5s per row in the expression
    * tree costs ~400 digests/row for values that never change. (At cluster
    * scale this is the broadcast-the-model pattern.)
    */
  private[ops] lazy val planeWeights: Seq[Seq[Double]] = {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    (0 until LshPlanes).map { p =>
      (1 to Dim).map { d =>
        val h = BigInt(md5hex(s"${p}_$d").substring(0, 15), 16)
        ((h % 2001) - 1000).toDouble / 1000.0
      }
    }
  }

  private def planeWeightSql(p: String, d: String): String =
    s"(((${hash60Sql(s"$p::VARCHAR || '_' || $d::VARCHAR")}) % 2001) - 1000) / 1000.0"

  /** Sign-LSH bucket id: for each of 6 hyperplanes, the sign of vec·plane
    * becomes a bit → 64 buckets. One map-side expression over literal
    * plane vectors.
    */
  def lshBucket(vec: Column): Column = {
    val planesLit = typedLit(planeWeights)
    aggregate(
      transform(
        sequence(lit(0), lit(LshPlanes - 1)),
        p =>
          when(
            aggregate(
              zip_with(vec, element_at(planesLit, p.cast("int") + 1), (x, w) => x * w),
              lit(0.0), (acc, x) => acc + x) >= 0,
            pow(lit(2.0), p).cast("long"))
            .otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  def lshBucketSql(vec: String): String =
    s"""list_sum(list_transform(range(0, $LshPlanes), p ->
       |  CASE WHEN list_sum(list_transform(range(1, $Dim + 1),
       |    d -> $vec[d] * ${planeWeightSql("p", "d")})) >= 0
       |  THEN (1::BIGINT << p) ELSE 0 END))""".stripMargin

  /** Bucketed ANN: queries only score candidates in their own sign-LSH
    * bucket. Same output shape as brute force (top-3 per query, from the
    * bucket), so recall vs the baseline is directly measurable.
    */
  def annLshBucketed(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).withColumn("bucket", lshBucket(col("vec")))
    val q = e.where(col("vec_id") < NQueries)
      .select(
        col("vec_id").as("query_id"), col("vec").as("q_vec"),
        col("bucket").as("q_bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(q), col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("vec"), col("q_vec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(
        col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  val annLshBucketedSql: String =
    s"""WITH e AS (SELECT vec_id, vec, ${lshBucketSql("vec")} AS bucket FROM ($embSql)),
       |q AS (SELECT vec_id AS query_id, vec AS q_vec, bucket AS q_bucket
       |      FROM e WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id, ${cosineSql("vec", "q_vec")} AS cos
       |  FROM e JOIN q ON e.bucket = q.q_bucket AND e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  // ---- label-centroid assignment -----------------------------------------

  /** Per-label centroids (posexplode → per-dim avg, ROUNDED to 6dp so both
    * engines proceed from identical centroids) → assign each vector to its
    * nearest centroid by cosine. The centroid table is tiny → broadcast;
    * assignment is map-side.
    */
  def centroidAssign(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val centroids = e
      .select(col("label"), posexplode(col("vec")).as(Seq("d", "x")))
      .groupBy(col("label").as("c_label"), col("d"))
      .agg(round(avg(col("x")), 6).as("cx"))
      .groupBy(col("c_label"))
      .agg(array_sort(collect_list(struct(col("d"), col("cx")))).as("pairs"))
      .select(
        col("c_label"),
        transform(col("pairs"), p => p.getField("cx")).as("c_vec"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("c_label"))
    e.crossJoin(broadcast(centroids))
      .withColumn("cos", cosine(col("vec"), col("c_vec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(
        col("vec_id"), col("label"),
        col("c_label").as("assigned_label"),
        (col("label") === col("c_label")).as("is_match"))
      .orderBy("vec_id")
  }

  val centroidAssignSql: String =
    s"""WITH e AS ($embSql),
       |flat AS (
       |  SELECT label, d, avg(vec[d]) AS cx
       |  FROM e, (SELECT unnest(range(1, $Dim + 1)) AS d)
       |  GROUP BY label, d),
       |cent AS (
       |  SELECT label AS c_label, list(round(cx, 6) ORDER BY d) AS c_vec
       |  FROM flat GROUP BY label),
       |scored AS (
       |  SELECT vec_id, label, c_label, ${cosineSql("vec", "c_vec")} AS cos
       |  FROM e, cent),
       |ranked AS (
       |  SELECT vec_id, label, c_label, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_label) AS rn
       |  FROM scored)
       |SELECT vec_id, label, c_label AS assigned_label, label = c_label AS is_match
       |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin
}
