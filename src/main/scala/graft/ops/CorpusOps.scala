package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import TextOps.hash60

/** Corpus-level training-data operations: distribution stats, deterministic
  * stratified sampling, vocabulary analysis. All one-shuffle aggregations.
  */
object CorpusOps {

  /** Exact percentiles per key (linear interpolation — identical definition
    * in Spark's `percentile` and DuckDB's `quantile_cont`). At 100 TB the
    * swap-in is `approx_percentile` (t-digest sketch: mergeable, bounded
    * memory) — exact form kept here because it is oracle-able.
    */
  def valuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")

  val valuePercentilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.9), 4) AS p90,
      |  round(quantile_cont(value, 0.99), 4) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Deterministic stratified sample: ~10% of documents per language via a
    * content-independent hash split — the reproducible train/eval split
    * every data pipeline needs (no rand(), so replays and engines agree;
    * at scale this is a pure map-side filter).
    */
  def stratifiedSample(s: SparkSession, dir: String, pct: Int = 10): DataFrame =
    Tables.read(s, dir, "documents")
      .where(hash60(concat(lit("split#"), col("doc_id").cast("string"))) % 100 < pct)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  def stratifiedSampleSql(pct: Int = 10): String =
    s"""SELECT doc_id, lang FROM documents
       |WHERE (${TextOps.hash60Sql("'split#' || doc_id::VARCHAR")}) % 100 < $pct
       |ORDER BY doc_id""".stripMargin

  /** Training-data hygiene: PII-style scrubbing — redact emails, phone
    * numbers, and residual numeric runs in the raw payload with per-class
    * placeholders and count total redactions. Stateless regexp map-side
    * transform; every pattern is restricted to syntax with identical
    * semantics in Java regex and RE2 (no lookaround, no backreferences),
    * and both engines use leftmost-first alternation, so the single-pass
    * redaction count matches the sequential per-class replacements exactly.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  val DigitRunRe = "[0-9]+"

  /** Alternation order matters: email before phone before digit run, so the
    * count pass segments the string the same way the replace passes do
    * (placeholders contain no digits or '@', so later passes never re-match
    * earlier replacements).
    */
  private val piiAnyRe = s"$EmailRe|$PhoneRe|$DigitRunRe"

  /** Per-class redaction of one string column (email → phone → digit run). */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      DigitRunRe, "<NUM>")

  /** Total redactions a [[scrubPii]] pass performs on the column. */
  def piiRedactionCount(c: Column): Column =
    regexp_count(c, lit(piiAnyRe)).cast("long")

  def piiScrub(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "events").select(
      col("event_id"),
      scrubPii(col("props")).as("scrubbed_props"),
      piiRedactionCount(col("props")).as("n_redactions"))
      .orderBy("event_id")

  val piiScrubSql: String =
    s"""SELECT event_id,
       |  regexp_replace(regexp_replace(regexp_replace(props,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g'),
       |    '$DigitRunRe', '<NUM>', 'g') AS scrubbed_props,
       |  len(regexp_extract_all(props, '$EmailRe|$PhoneRe|$DigitRunRe'))::BIGINT AS n_redactions
       |FROM events ORDER BY event_id""".stripMargin

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  /** Vocabulary stats: top-20 tokens by document frequency with their
    * collection frequency — the inverted-index aggregate feeding stopword
    * lists and tokenizer audits. One shuffle on the token.
    */
  def vocabTopK(s: SparkSession, dir: String, k: Int = 20): DataFrame =
    Tables.read(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens.as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy(col("token"))
      .agg(
        countDistinct(col("doc_id")).as("doc_freq"),
        count(lit(1)).as("coll_freq"))
      .orderBy(col("doc_freq").desc, col("coll_freq").desc, col("token"))
      .limit(k)

  def vocabTopKSql(k: Int = 20): String =
    s"""SELECT token, count(DISTINCT doc_id) AS doc_freq, count(*)::BIGINT AS coll_freq
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |GROUP BY token
       |ORDER BY doc_freq DESC, coll_freq DESC, token LIMIT $k""".stripMargin
}
