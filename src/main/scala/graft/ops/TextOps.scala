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
  def textStats(s: SparkSession, dir: String): DataFrame =
    textStatsOf(docs(s, dir))

  /** One compiled pass per document (round-18 optimization, same device
    * as [[qualityRepetitionOf]]): the retired per-row form (kept below as
    * [[textStatsComposedOf]], the spec's parity reference) paid three
    * interpreted array passes — `array_distinct`, the stopword `filter`
    * lambda, and the `aggregate(transform(...))` BPE fold.
    * [[graft.functions.TextStatsRowExpr]] computes the four integer
    * aggregates map-side in one pass; divisions + rounding stay in the
    * Catalyst projection so float behavior is unchanged.
    */
  private[graft] def textStatsOf(d: DataFrame): DataFrame = {
    val nL = col("st.n")
    d.select(col("doc_id"), length(col("text")).as("text_len"),
      graft.functions.TextStatsRowExpressions
        .text_stats_row(tokens, Seq("the", "a")).as("st"))
      .select(
        col("doc_id"),
        nL.as("n_tokens"),
        col("st.uniq").as("n_uniq_tokens"),
        round(col("st.uniq").cast("double") / nL, 4).as("type_token_ratio"),
        round(col("st.stop_c").cast("double") / nL, 4).as("stopword_ratio"),
        // mean token length from arithmetic identity: chars minus (n-1) spaces
        round((col("text_len") - nL + 1).cast("double") / nL, 4)
          .as("avg_token_len"),
        col("st.bpe").as("n_bpe_est"),
        round(
          lit(0.5) * (col("st.uniq").cast("double") / nL) +
            lit(0.5) * (lit(1.0) - col("st.stop_c").cast("double") / nL), 4)
          .as("quality_score"))
      .orderBy("doc_id")
  }

  private[graft] def textStatsComposedOf(d: DataFrame): DataFrame = {
    val n = size(tokens)
    val nUniq = size(array_distinct(tokens))
    val nStop = size(filter(tokens, t => t.isin("the", "a")))
    d.select(
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

  // ---- repetition metrics + composite quality filter ---------------------

  /** Gopher-style repetition signals per document, token-based (the corpus
    * is single-line, so line/paragraph rules degenerate): fraction of
    * tokens that are the single most frequent token, fraction of tokens
    * occurring more than once, and the analogous top fraction over word
    * bigrams.
    *
    * Shape: explode → count per (doc, gram) → per-doc agg. Both
    * aggregations are partial (map-side combine) and key on (doc_id, gram)
    * then doc_id — at 100 TB this is the vocab-stats shape, no stage sees
    * the raw text after the explode.
    */
  def qualityRepetition(s: SparkSession, dir: String): DataFrame =
    qualityRepetitionOf(docs(s, dir))

  /** One compiled pass per document (round-18 optimization): every output
    * fraction depends only on the row's own tokens, so the retired
    * two-pipeline explode/aggregate/join form (four shuffles of the
    * exploded token stream — kept below as
    * [[qualityRepetitionComposedOf]], the spec's parity reference) was
    * pure overhead. [[graft.functions.RepetitionStatsExpr]] computes the
    * five integer aggregates map-side; division + rounding stay in the
    * Catalyst projection so float behavior is unchanged. Zero exchanges
    * before the final sort.
    */
  private[graft] def qualityRepetitionOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), graft.functions.RepetitionStatsExpressions
      .repetition_stats(tokens).as("st"))
      .select(
        col("doc_id"),
        round(col("st.u_top_c").cast("double") / col("st.u_n"), 4)
          .as("top_token_frac"),
        round(col("st.u_dup_c").cast("double") / col("st.u_n"), 4)
          .as("dup_token_frac"),
        round(col("st.b_top_c").cast("double") / col("st.b_n"), 4)
          .as("top_bigram_frac"))
      .orderBy("doc_id")

  private[graft] def qualityRepetitionComposedOf(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), tokens.as("toks"))
    def gramStats(gram: Column, pfx: String) =
      base.select(col("doc_id"), explode(gram).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(
          max(col("c")).as(s"${pfx}_top_c"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as(s"${pfx}_dup_c"),
          sum(col("c")).as(s"${pfx}_n"))
    val uni = gramStats(col("toks"), "u")
    // try_element_at on the successor: a 1-token document probes index 2
    // of a 1-element array, which THROWS under ANSI — the null →
    // concat_ws skips it and yields the bare token, exactly the oracle's
    // `|| coalesce(' ' || next, '')` (same convention as
    // [[graft.ops.DedupOps.bigramShingles]])
    val bi = gramStats(expr(
      """transform(sequence(1, greatest(size(toks) - 1, 1)),
        |  i -> concat_ws(' ', element_at(toks, i), try_element_at(toks, i + 1)))""".stripMargin), "b")
    uni.join(bi, "doc_id")
      .select(
        col("doc_id"),
        round(col("u_top_c").cast("double") / col("u_n"), 4).as("top_token_frac"),
        round(col("u_dup_c").cast("double") / col("u_n"), 4).as("dup_token_frac"),
        round(col("b_top_c").cast("double") / col("b_n"), 4).as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Oracle-side NON-distinct bigram list (counts matter here, unlike
    * [[graft.ops.DedupOps.shingleListSql]]).
    */
  private val bigramListSql: String =
    """list_transform(
      |  range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
      |  i -> string_split(text, ' ')[i] || coalesce(' ' || string_split(text, ' ')[i + 1], ''))""".stripMargin

  val qualityRepetitionSql: String =
    s"""WITH u AS (
       |  SELECT doc_id, tok, count(*) AS c
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY 1, 2),
       |us AS (
       |  SELECT doc_id, max(c) AS u_top_c,
       |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS u_dup_c, sum(c) AS u_n
       |  FROM u GROUP BY doc_id),
       |b AS (
       |  SELECT doc_id, bg, count(*) AS c
       |  FROM (SELECT doc_id, unnest($bigramListSql) AS bg FROM documents)
       |  GROUP BY 1, 2),
       |bs AS (SELECT doc_id, max(c) AS b_top_c, sum(c) AS b_n FROM b GROUP BY doc_id)
       |SELECT us.doc_id,
       |  round(u_top_c * 1.0 / u_n, 4) AS top_token_frac,
       |  round(u_dup_c * 1.0 / u_n, 4) AS dup_token_frac,
       |  round(b_top_c * 1.0 / b_n, 4) AS top_bigram_frac
       |FROM us JOIN bs ON us.doc_id = bs.doc_id ORDER BY us.doc_id""".stripMargin

  /** C4/Gopher-style composite keep/drop decision per document. Every rule
    * compares in INTEGER arithmetic (`top_c * 20 <= n * 3` is
    * top_token_frac ≤ 0.15) so the threshold boundary is exact on both
    * engines — the float-division form would hash-diverge on ties.
    * Thresholds chosen to split this corpus (top_token_frac spans
    * 0.05–0.30 with median 0.09; dup_token_frac 0–0.99 median 0.83).
    */
  def qualityFilter(s: SparkSession, dir: String): DataFrame = {
    // one compiled pass per document (round-18, same device as
    // [[qualityRepetitionOf]]): every rule input depends only on the
    // row's own tokens, so the explode → (doc, tok) count → per-doc
    // aggregate pipeline (two shuffles of the token stream) was pure
    // overhead; `bigrams = false` skips the half this op never reads
    val stats = docs(s, dir)
      .select(col("doc_id"), graft.functions.RepetitionStatsExpressions
        .repetition_stats(tokens, bigrams = false).as("st"))
      .select(col("doc_id"),
        col("st.u_top_c").as("top_c"), col("st.u_dup_c").as("dup_c"),
        col("st.u_n").as("n_tok"), col("st.u_uniq").as("n_uniq"))
    stats.select(
      col("doc_id"),
      (col("n_tok") >= 20 && col("n_tok") <= 1000).as("len_ok"),
      (col("n_uniq") * 4 >= col("n_tok")).as("diversity_ok"),
      (col("top_c") * 20 <= col("n_tok") * 3).as("top_token_ok"),
      (col("dup_c") * 10 <= col("n_tok") * 9).as("dup_token_ok"))
      .withColumn("keep",
        col("len_ok") && col("diversity_ok") &&
          col("top_token_ok") && col("dup_token_ok"))
      .orderBy("doc_id")
  }

  val qualityFilterSql: String =
    """WITH c AS (
      |  SELECT doc_id, tok, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |s AS (
      |  SELECT doc_id, max(c) AS top_c,
      |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c,
      |    sum(c) AS n_tok, count(*) AS n_uniq
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id,
      |  n_tok >= 20 AND n_tok <= 1000 AS len_ok,
      |  n_uniq * 4 >= n_tok AS diversity_ok,
      |  top_c * 20 <= n_tok * 3 AS top_token_ok,
      |  dup_c * 10 <= n_tok * 9 AS dup_token_ok,
      |  (n_tok >= 20 AND n_tok <= 1000) AND n_uniq * 4 >= n_tok
      |    AND top_c * 20 <= n_tok * 3 AND dup_c * 10 <= n_tok * 9 AS keep
      |FROM s ORDER BY doc_id""".stripMargin

  // ---- unigram-LM scoring (perplexity-style quality signal) --------------

  /** CCNet-style language-model quality score: train a unigram LM on the
    * corpus itself (MLE token probabilities), score each document by its
    * mean token log-probability and perplexity. Low-probability token
    * soup scores high perplexity → filter candidate. Two aggregates
    * (token counts, per-doc sum of logprobs) — both partial-aggregated;
    * the LM (≤|vocab| rows) broadcasts back onto the token stream, so at
    * 100 TB the only big exchange keys on (doc, token).
    *
    * Numeric parity: ln on the SAME rational (count/total) on both
    * engines; the per-doc mean folds in one aggregate (sum/n of
    * identical doubles) and is rounded to 4dp — no rank depends on it.
    */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), tokens.as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
    // corpus token total folded from the per-token counts (Σ groups ≡
    // Σ rows) so the total shares the unigram exchange instead of
    // re-tokenizing the corpus a third time (q11/q15 reuse pattern;
    // measured 3 scans → 2, the LM build plus the scoring pass)
    val cnt = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val lm = cnt
      .crossJoin(broadcast(cnt.agg(sum(col("c")).as("total"))))
      .select(col("tok"), log(col("c").cast("double") / col("total")).as("logp"))
    toks.join(broadcast(lm), "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("logp")).as("sum_logp"))
      .select(
        col("doc_id"),
        round(col("sum_logp") / col("n_tok"), 4).as("mean_logp"),
        round(exp(-col("sum_logp") / col("n_tok")), 4).as("perplexity"))
      .orderBy("doc_id")
  }

  val lmScoreSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |lm AS (
      |  SELECT tok, ln(count(*) * 1.0 / (SELECT count(*) FROM t)) AS logp
      |  FROM t GROUP BY tok)
      |SELECT doc_id,
      |  round(sum(logp) / count(*), 4) AS mean_logp,
      |  round(exp(-sum(logp) / count(*)), 4) AS perplexity
      |FROM t JOIN lm ON t.tok = lm.tok
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- benchmark decontamination (n-gram overlap) ------------------------

  /** Eval-set decontamination: documents sharing any 5-gram with the held
    * "benchmark" slice (sources 'src0'/'src1' stand in for an eval
    * set) are flagged with their overlap count. The eval side collapses
    * to DISTINCT 5-gram hashes — at 100 TB a broadcast-sized set (eval
    * suites are small) semi-joined against the corpus n-gram stream:
    * corpus rows never shuffle, contaminated ids fall out of the join.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = gramHashes(s, dir)
    grams.where(!isEval)
      .join(broadcast(evalHashes(s, dir)), "h")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  val decontaminateSql: String = {
    val h = hash60Sql("g")
    s"""WITH grams AS (
       |  SELECT doc_id, source, $h AS h FROM (
       |    SELECT doc_id, source,
       |      unnest(list_transform(range(1, greatest(len(string_split(text, ' ')) - 4, 1) + 1),
       |        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 4), ' '))) AS g
       |    FROM documents)),
       |ev AS (
       |  SELECT DISTINCT h FROM grams WHERE source IN ('src0', 'src1'))
       |SELECT doc_id, count(DISTINCT grams.h)::BIGINT AS n_shared_grams
       |FROM grams JOIN ev ON grams.h = ev.h
       |WHERE source NOT IN ('src0', 'src1')
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---- adaptive quality threshold ----------------------------------------

  /** ADAPTIVE quality filtering: keep documents above their own language's
    * P25 quality score — the data-driven form of the fixed-threshold
    * [[qualityFilter]] (real pipelines cut per-language percentiles, not
    * global constants, because score distributions differ by language).
    * Two aggregates over the scored frame: the per-lang percentile (exact
    * here for oracle parity; `approx_percentile` is the sketch swap-in at
    * 100 TB) joined back on lang — a ≤|languages|-row side, unhinted.
    * Score and cut are both rounded to 4dp on both engines so the strict
    * boundary comparison cannot flip on a last-ulp difference.
    */
  def adaptiveQualityFilter(s: SparkSession, dir: String, pct: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = size(tokens)
    val nUniq = size(array_distinct(tokens))
    val nStop = size(filter(tokens, t => t.isin("the", "a")))
    val scored = docs(s, dir).select(
      col("doc_id"), col("lang"),
      round(
        lit(0.5) * (nUniq.cast("double") / n) +
          lit(0.5) * (lit(1.0) - nStop.cast("double") / n), 4)
        .as("quality_score"))
    // the cut as a WINDOW aggregate over the lang partition, not a
    // groupBy-join-back: a second aggregate branch would re-scan and
    // re-SCORE the corpus (tokenize + distinct per doc — the expensive
    // part); the window form scores once and pays one lang-keyed exchange
    scored
      .withColumn("cut", round(
        expr(s"percentile(quality_score, $pct)")
          .over(Window.partitionBy(col("lang"))), 4))
      .where(col("quality_score") > col("cut"))
      .select(col("lang"), col("doc_id"), col("quality_score"), col("cut"))
      .orderBy("lang", "doc_id")
  }

  def adaptiveQualityFilterSql(pct: Double = 0.25): String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    round(0.5 * (len(list_distinct(toks)) * 1.0 / len(toks))
       |        + 0.5 * (1.0 - len(list_filter(toks, w -> w IN ('the','a'))) * 1.0 / len(toks)), 4)
       |      AS quality_score
       |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)),
       |cuts AS (
       |  SELECT lang, round(quantile_cont(quality_score, $pct), 4) AS cut
       |  FROM scored GROUP BY lang)
       |SELECT s.lang AS lang, doc_id, quality_score, cut
       |FROM scored s JOIN cuts c ON s.lang = c.lang
       |WHERE quality_score > cut
       |ORDER BY s.lang, doc_id""".stripMargin

  // ---- Bloom-prefiltered decontamination ---------------------------------

  /** The 100 TB form of [[decontaminate]]: a Bloom filter over the eval
    * set's 5-gram hashes prefilters the corpus gram stream before the
    * exact join. [[decontaminate]] broadcasts the full eval hash set —
    * right while eval suites are small, but the broadcast grows with the
    * eval corpus. Here the broadcast is a FIXED-size bitset (2^logM bits =
    * 2^logM/64 longs ≈ 8 KB at the default), independent of eval size:
    *
    *  - build: eval hashes → 2 probe positions each (disjoint slices of
    *    the 60-bit hash) → exploded → `bit_or` per 64-bit word — the
    *    bitset materializes as ≤ 2^logM/64 rows, broadcast-joined twice
    *    (word of probe 1, word of probe 2) into the corpus stream;
    *  - prefilter: a gram survives iff BOTH probed bits are set
    *    (fill ≈ 7% at sf0.01 → FP rate ≈ 0.5%, spec-measured);
    *  - exact verify: survivors — true hits + the FP trickle — join the
    *    real eval hash set, so the OUTPUT is bit-identical to
    *    [[decontaminate]] and shares its oracle. Only candidates reach
    *    the exact join: at 100 TB that join's input is ~0.5% of the
    *    corpus gram stream instead of all of it.
    */
  def decontaminateBloom(s: SparkSession, dir: String, logM: Int = 16): DataFrame = {
    val candidates = bloomCandidates(s, dir, logM)
    candidates
      .join(evalHashes(s, dir), "h") // exact verify; unhinted — AQE sizes the side
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  /** Shares [[decontaminateSql]]'s oracle — the Bloom stage is a
    * transparent prefilter.
    */
  val decontaminateBloomSql: String = decontaminateSql

  private[graft] def isEval = col("source").isin("src0", "src1")

  /** The eval set's DISTINCT 5-gram hashes, materialized once per
    * (session, dir) — both decontamination forms (and the Bloom build,
    * which probes the same hashes) read the materialization instead of
    * re-tokenizing the eval slice per query. Same IndexMemo discipline as
    * the shingle index.
    */
  private val evalHashCache =
    IndexMemo.cache[(SparkSession, String), DataFrame]()

  private[graft] def evalHashes(s: SparkSession, dir: String): DataFrame =
    IndexMemo(evalHashCache, (s, dir))(
      gramHashes(s, dir).where(isEval).select(col("h")).distinct().persist())

  /** (doc_id, source, h): the 5-gram hash stream of every document —
    * hashed inside the native [[graft.functions.GramHash60s]] pass, so the
    * explode emits 8-byte longs, never shingle strings (parity with the
    * declarative transform/concat_ws/md5 form pinned in LlmOpsSpec).
    */
  private def gramHashes(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.SimhashExpressions.gram_hash60s(tokens, 5)).as("h"))

  /** Corpus grams surviving the Bloom prefilter (true hits + FPs) —
    * exposed for the spec's selectivity measurement.
    */
  /** The two Bloom probe positions of a 60-bit gram hash — ONE definition
    * shared by the bitset build, the batch prefilter, and the streaming
    * per-row test, so build and test can never disagree (a mismatch would
    * produce false NEGATIVES, breaking exactness).
    */
  private[graft] def bloomP1(h: Column, m: Long): Column = pmod(h, lit(m))
  private[graft] def bloomP2(h: Column, m: Long): Column =
    pmod(shiftright(h, 20), lit(m))

  /** The eval set's Bloom bitset as (word index, 64-bit word) rows —
    * ≤ 2^logM/64 rows, built with one `bit_or` word aggregation. */
  private[graft] def bloomWords(s: SparkSession, dir: String, logM: Int): DataFrame = {
    val m = 1L << logM
    evalHashes(s, dir)
      .select(explode(array(bloomP1(col("h"), m), bloomP2(col("h"), m))).as("pos"))
      .select(expr("shiftright(pos, 6)").as("w"),
        expr("shiftleft(1L, cast(pos % 64 AS int))").as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("bits"))
  }

  /** The same bitset as a DENSE long array (2^logM/64 entries ≈ 8 KB at
    * the default) — the closure-shippable form the STREAMING
    * decontaminator tests per row. Fixed size in the eval-set size by
    * construction.
    */
  private[graft] def bloomWordArray(s: SparkSession, dir: String, logM: Int = 16): Array[Long] = {
    val arr = new Array[Long]((1L << logM >> 6).toInt)
    bloomWords(s, dir, logM).collect()
      .foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  private[graft] def bloomCandidates(s: SparkSession, dir: String, logM: Int = 16): DataFrame = {
    val m = 1L << logM
    def probes(d: DataFrame): DataFrame = d
      .withColumn("p1", bloomP1(col("h"), m))
      .withColumn("p2", bloomP2(col("h"), m))
    val words = bloomWords(s, dir, logM)
    val b1 = words.select(col("w").as("w1"), col("bits").as("bits1"))
    val b2 = words.select(col("w").as("w2"), col("bits").as("bits2"))
    probes(gramHashes(s, dir).where(!isEval))
      .join(broadcast(b1), expr("shiftright(p1, 6)") === col("w1"))
      .join(broadcast(b2), expr("shiftright(p2, 6)") === col("w2"))
      .where(
        (col("bits1").bitwiseAND(expr("shiftleft(1L, cast(p1 % 64 AS int))")) =!= 0) &&
          (col("bits2").bitwiseAND(expr("shiftleft(1L, cast(p2 % 64 AS int))")) =!= 0))
      .select(col("doc_id"), col("h"))
  }

  // ---- rolling-hash document fingerprint ---------------------------------

  /** Winnowing-style fingerprint: hash every 5-word shingle, keep the
    * minimum (one representative hash per document) plus the distinct
    * shingle count.
    *
    * Every shingle of a document comes from one input row, so the whole
    * reduction runs inside the native
    * [[graft.functions.FingerprintRowFp]] expression — no explode, no
    * shuffle (the earlier explode + groupBy(doc_id) form measured 3.3 s at
    * sf0.1; this is ~0.4 s). The only exchange left is the output orderBy.
    * The retired declarative form lives on as the oracle SQL and in the
    * TextOpsSpec parity case.
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        graft.functions.SimhashExpressions.fingerprint_row(tokens, 5).as("fp"))
      .select(col("doc_id"),
        col("fp.fingerprint").as("fingerprint"),
        col("fp.n_shingles").as("n_shingles"))
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
