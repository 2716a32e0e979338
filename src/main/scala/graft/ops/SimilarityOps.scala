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

  val LshPlanes = 4

  /** Deterministic pseudo-random hyperplane weights for (plane p, dim d) in
    * [-1, 1): md5-derived so the oracle reproduces them exactly. The planes
    * are CONSTANTS, so they are computed once at plan-build time and
    * embedded as literals — recomputing LshPlanes×Dim md5s per row in the
    * expression tree pays for values that never change. (At cluster scale
    * this is the broadcast-the-model pattern.)
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

  /** Sign-LSH bucket id: for each of the LshPlanes hyperplanes, the sign of
    * vec·plane becomes a bit → 2^LshPlanes buckets. One map-side expression
    * over literal plane vectors.
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

  /** Multi-probe bucketed ANN: each query scores candidates in its own
    * sign-LSH bucket PLUS every bucket at Hamming distance 1 (flip one
    * plane's bit) — the standard multi-probe trick that recovers most of
    * the recall a single-bucket probe loses at bucket boundaries, while
    * still scoring only (planes+1)/2^planes of the corpus. Output shape
    * matches brute force so recall is directly measurable.
    */
  def annLshBucketed(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).withColumn("bucket", lshBucket(col("vec")))
    val probeBuckets = array(
      col("q_bucket") +: (0 until LshPlanes).map(p =>
        expr(s"q_bucket ^ ${1L << p}")): _*)
    val q = e.where(col("vec_id") < NQueries)
      .select(
        col("vec_id").as("query_id"), col("vec").as("q_vec"),
        col("bucket").as("q_bucket"))
      .select(
        col("query_id"), col("q_vec"),
        explode(probeBuckets).as("probe_bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(q), col("bucket") === col("probe_bucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("vec"), col("q_vec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(
        col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  val annLshBucketedSql: String = {
    val probeList = ("q_bucket" +: (0 until LshPlanes).map(p =>
      s"xor(q_bucket, ${1L << p})")).mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, vec, ${lshBucketSql("vec")} AS bucket FROM ($embSql)),
       |q0 AS (SELECT vec_id AS query_id, vec AS q_vec, bucket AS q_bucket
       |       FROM e WHERE vec_id < $NQueries),
       |q AS (SELECT query_id, q_vec, unnest($probeList) AS probe_bucket FROM q0),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id, ${cosineSql("vec", "q_vec")} AS cos
       |  FROM e JOIN q ON e.bucket = q.probe_bucket AND e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  // ---- label-centroid assignment -----------------------------------------

  /** Per-label centroids (posexplode → per-dim avg, ROUNDED to 6dp so both
    * engines proceed from identical centroids) → assign each vector to its
    * nearest centroid by cosine. The centroid table is tiny → broadcast;
    * assignment is map-side.
    */
  /** Per-label centroids (posexplode → per-dim avg rounded to 6dp so both
    * engines proceed from identical values), collected back to arrays.
    */
  private def centroids(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label"), posexplode(col("vec")).as(Seq("d", "x")))
      .groupBy(col("label").as("c_label"), col("d"))
      .agg(round(avg(col("x")), 6).as("cx"))
      .groupBy(col("c_label"))
      .agg(array_sort(collect_list(struct(col("d"), col("cx")))).as("pairs"))
      .select(
        col("c_label"),
        transform(col("pairs"), p => p.getField("cx")).as("c_vec"))

  /** Every vector's nearest centroid (its IVF cell). */
  private def assignments(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("c_label"))
    emb(s, dir).crossJoin(broadcast(centroids(s, dir)))
      .withColumn("cos", cosine(col("vec"), col("c_vec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("vec"), col("c_label").as("cell"))
  }

  def centroidAssign(s: SparkSession, dir: String): DataFrame =
    assignments(s, dir)
      .select(
        col("vec_id"), col("label"),
        col("cell").as("assigned_label"),
        (col("label") === col("cell")).as("is_match"))
      .orderBy("vec_id")

  /** IVF ANN: the centroid table is the coarse quantizer. Each query probes
    * its `nprobe` nearest cells and scores ONLY vectors assigned there —
    * the q·n/cells scale path (vs brute force's q·n), complementary to the
    * sign-LSH variant. Output shape matches brute force so recall is
    * directly measurable.
    */
  val IvfProbes = 2

  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val assign = assignments(s, dir)
    val cents = centroids(s, dir)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("c_label"))
    val probes = emb(s, dir).where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("q_vec"))
      .crossJoin(broadcast(cents))
      .withColumn("c_cos", cosine(col("q_vec"), col("c_vec")))
      .withColumn("c_rn", row_number().over(probeW))
      .where(col("c_rn") <= IvfProbes)
      .select(col("query_id"), col("q_vec"), col("c_label").as("probe_cell"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assign
      .join(broadcast(probes),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("vec"), col("q_vec")))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .where(col("rank") <= 3)
      .select(
        col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  // ---- deterministic k-means ---------------------------------------------

  val KmeansK = 8
  val KmeansIters = 3

  /** Deterministic spherical k-means (cosine assignment, 3 fixed Lloyd
    * iterations): seeds = the first k vectors by id, centroids re-averaged
    * per dim and ROUNDED to 6dp each round so the DuckDB oracle (same
    * rounds unrolled) proceeds from identical values. The index-build op
    * behind a real IVF; also the engine's demonstration of iterative ML
    * discipline — lineage truncated per round (see nearDupClusters).
    *
    * Scale: per round, one broadcast of k centroids + one shuffle for the
    * per-(cluster, dim) averages. Assignment is map-side.
    */
  def kmeans(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)

    def assign(cents: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("cid"))
      e.crossJoin(broadcast(cents))
        .withColumn("cos", cosine(col("vec"), col("c_vec")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("vec"), col("cid"), col("cos"))
    }

    def update(assigned: DataFrame): DataFrame =
      assigned
        .select(col("cid"), posexplode(col("vec")).as(Seq("d", "x")))
        .groupBy(col("cid"), col("d"))
        .agg(round(avg(col("x")), 6).as("cx"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("d"), col("cx")))).as("pairs"))
        .select(col("cid"), transform(col("pairs"), p => p.getField("cx")).as("c_vec"))

    var cents = e.where(col("vec_id") < KmeansK)
      .select(col("vec_id").as("cid"), col("vec").as("c_vec"))
      .localCheckpoint()
    for (_ <- 1 to KmeansIters)
      cents = update(assign(cents)).localCheckpoint()

    assign(cents)
      .groupBy(col("cid"))
      .agg(
        count(lit(1)).as("n_members"),
        round(avg(col("cos")), 4).as("avg_cosine"))
      .orderBy("cid")
  }

  val kmeansSql: String = {
    def assignCte(name: String, centCte: String): String =
      s"""$name AS (
         |  SELECT vec_id, vec, cid, cos FROM (
         |    SELECT e.vec_id, e.vec, c.cid, ${cosineSql("vec", "c_vec")} AS cos,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosineSql("vec", "c_vec")} DESC, c.cid) AS rn
         |    FROM e, $centCte c)
         |  WHERE rn = 1)""".stripMargin
    def updateCte(name: String, assignCte: String): String =
      s"""$name AS (
         |  SELECT cid, list(round(cx, 6) ORDER BY d) AS c_vec FROM (
         |    SELECT cid, d, avg(vec[d]) AS cx
         |    FROM $assignCte, (SELECT unnest(range(1, $Dim + 1)) AS d)
         |    GROUP BY cid, d)
         |  GROUP BY cid)""".stripMargin
    val rounds = (1 to KmeansIters).map { i =>
      assignCte(s"a$i", s"c${i - 1}") + ",\n" + updateCte(s"c$i", s"a$i")
    }.mkString(",\n")
    s"""WITH e AS ($embSql),
       |c0 AS (SELECT vec_id AS cid, vec AS c_vec FROM e WHERE vec_id < $KmeansK),
       |$rounds,
       |${assignCte("afinal", s"c$KmeansIters")}
       |SELECT cid, count(*) AS n_members, round(avg(cos), 4) AS avg_cosine
       |FROM afinal GROUP BY cid ORDER BY cid""".stripMargin
  }

  val annIvfSql: String =
    s"""WITH e AS ($embSql),
       |flat AS (
       |  SELECT label, d, avg(vec[d]) AS cx
       |  FROM e, (SELECT unnest(range(1, $Dim + 1)) AS d)
       |  GROUP BY label, d),
       |cent AS (
       |  SELECT label AS c_label, list(round(cx, 6) ORDER BY d) AS c_vec
       |  FROM flat GROUP BY label),
       |assign AS (
       |  SELECT vec_id, vec, c_label AS cell FROM (
       |    SELECT e.vec_id, e.vec, c_label,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("vec", "c_vec")} DESC, c_label) AS rn
       |    FROM e, cent)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, q_vec, c_label AS probe_cell FROM (
       |    SELECT e.vec_id AS query_id, e.vec AS q_vec, c_label,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("vec", "c_vec")} DESC, c_label) AS c_rn
       |    FROM e, cent WHERE e.vec_id < $NQueries)
       |  WHERE c_rn <= $IvfProbes),
       |scored AS (
       |  SELECT query_id, a.vec_id AS neighbor_id,
       |    ${cosineSql("a.vec", "q_vec")} AS cos
       |  FROM assign a JOIN probes p
       |    ON a.cell = p.probe_cell AND a.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

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
