package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic global shuffle + shard assignment — the LAST stage of a
  * training-data pipeline: after dedup/filter/selection, the surviving
  * corpus must be (a) shuffled so no shard carries source/time locality
  * (training batches sample shards sequentially), and (b) split into
  * fixed-count shards, reproducibly, so a rerun of the pipeline emits
  * byte-identical shards (C4/Pile-style releases pin a seed for exactly
  * this reason).
  *
  * The shuffle key is a seeded 60-bit md5 residue of the doc id — a
  * PERMUTATION, not `rand()`: deterministic under retries, re-executions
  * and partitioning changes (Spark re-runs tasks; a `rand()` order is not
  * replayable). shard = key mod nShards gives balanced shards without a
  * global sort; within-shard order = ascending key.
  *
  * Scale shape: the production write path is
  * `repartition(nShards, shard_id) → sortWithinPartitions(key) →
  * write` — ONE shuffle, one local sort, no global ordering structure.
  * The stats form below adds a per-shard `row_number` only to fold the
  * order into a checkable digest; its window partitions by shard_id
  * (thousands of shards at 100 TB → thousands of independent sorts, no
  * SinglePartition).
  */
object ShardOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  /** Full assignment: (doc_id, shard_id, position). Deterministic in
    * (seed, nShards) — PropertySpec pins permutation-invariance and that
    * two runs agree row-for-row. */
  def shuffleShard(s: SparkSession, dir: String,
      nShards: Int = 8, seed: Int = 42): DataFrame =
    shuffleShardOf(docs(s, dir), nShards, seed)

  /** Core form over any (doc_id, text) frame — ScaleProbe drives this
    * directly at synthetic 1×/10× corpus sizes. */
  def shuffleShardOf(docs: DataFrame, nShards: Int, seed: Int): DataFrame = {
    val key = TextOps.hash60(concat_ws(":", col("doc_id"), lit(seed)))
    docs
      .select(col("doc_id"), col("text"), key.as("k"))
      .withColumn("shard_id", pmod(col("k"), lit(nShards.toLong)))
      .withColumn("position",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard_id")).orderBy(col("k"), col("doc_id"))))
  }

  /** Bounded per-shard summary for the oracle: shard sizes, token mass,
    * and an order digest Σ (k mod 2^30) · position mod 2^40 — any doc in
    * the wrong shard, missing, or out of order breaks it. Term < 2^47,
    * sum over ≤10^7 rows < 2^63: no overflow under ANSI mode. */
  def shuffleShardStats(s: SparkSession, dir: String,
      nShards: Int = 8, seed: Int = 42): DataFrame =
    shuffleShardStatsOf(docs(s, dir), nShards, seed)

  def shuffleShardStatsOf(docs: DataFrame,
      nShards: Int = 8, seed: Int = 42): DataFrame =
    shuffleShardOf(docs, nShards, seed)
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("n_tokens"),
        sum(pmod(pmod(col("k"), lit(1L << 30)) * col("position"), lit(1L << 40)))
          .as("order_digest"))
      .orderBy("shard_id")

  def shuffleShardStatsSql(nShards: Int = 8, seed: Int = 42): String = {
    val k = TextOps.hash60Sql(s"concat(doc_id, ':', $seed)")
    s"""WITH keyed AS (
       |  SELECT doc_id, text, ($k) AS k, ($k) % $nShards AS shard_id
       |  FROM documents),
       |pos AS (
       |  SELECT shard_id, k,
       |    len(string_split(text, ' ')) AS n_toks,
       |    row_number() OVER (PARTITION BY shard_id ORDER BY k, doc_id)
       |      AS position
       |  FROM keyed)
       |SELECT shard_id, count(*) AS n_docs,
       |  sum(n_toks)::BIGINT AS n_tokens,
       |  sum(((k % ${1L << 30}) * position) % ${1L << 40})::BIGINT
       |    AS order_digest
       |FROM pos GROUP BY shard_id ORDER BY shard_id""".stripMargin
  }
}
