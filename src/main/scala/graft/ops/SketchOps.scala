package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Mergeable-sketch and table-profiling operators — the "store sketches,
  * not raw data" tier a 100 TB pipeline leans on for monitoring and
  * cardinality questions.
  *
  * The scale argument for sketch REAGGREGATION (vs the single-shot
  * `approx_count_distinct` already covered by `q_hll_distinct`): a real
  * pipeline materializes one HLL sketch per (dimension, day) — kilobytes
  * per cell — and answers every coarser-grain distinct question (per week,
  * per month, per dimension overall, across dimensions) by UNIONING the
  * stored sketches, never rescanning the fact table. HLL register-max
  * union is exactly associative and commutative, so the merged estimate is
  * independent of merge order/partitioning — safe to reaggregate
  * distributively. Reference analog: the daily condition-report rollups
  * (`categorize-trail-conditions/src/report.py`) recompute distinct trail
  * counts per fetch; a sketch table makes that a merge.
  */
object SketchOps {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "events")

  /** lgConfigK = 14 → 2^14 registers, relative standard error
    * 1.04/√2^14 ≈ 0.8%; the gate below allows 3%, comfortably > 3σ. */
  private val LgK = 14
  private val HllRollupErrPctBound = 3.0

  /** Two-level distinct rollup THROUGH stored sketches: per-(event_type,
    * day) HLL sketches (the persistable artifact — this is the frame a
    * real pipeline writes to its metrics store) are merged per event_type
    * with `hll_union_agg` and estimated, then gated against the exact
    * distinct count. Output pins: the estimate is within the HLL error
    * bound AND the rollup really did merge >1 daily sketch per group.
    *
    * Plan shape: the sketch build is one partial+final hash aggregate over
    * events (map-side partials — each task sketches its split, merge is
    * register-max); the rollup aggregates the ~|types|×|days| sketch rows.
    * The exact branch (needed only for the gate) is a separate
    * countDistinct; at 100 TB you would ship ONLY the sketch branch.
    * Determinism: datasketches HLL is hash-based (no RNG) and union is
    * order-independent, so `days_merged`/`within_bound` are stable across
    * partitionings — the oracle can assert them as constants.
    */
  def sketchRollup(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), LgK).as("sk"))
    val merged = daily
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("days_merged"),
        hll_sketch_estimate(hll_union_agg(col("sk"), allowDifferentLgConfigK = false))
          .as("approx_users"))
    val exact = events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exact, Seq("event_type"))
      .select(
        col("event_type"),
        col("exact_users"),
        col("days_merged"),
        (abs(col("approx_users") - col("exact_users")) * 100.0 /
          col("exact_users") <= HllRollupErrPctBound).as("within_bound"))
      .orderBy("event_type")
  }

  /** Oracle: exact distincts + day counts; the sketch estimate itself is
    * engine-specific, so the oracle pins the bound (`within_bound = true`)
    * the way `q_hll_distinct` does. */
  val sketchRollupSql: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS exact_users,
      |  count(DISTINCT date_trunc('day', ts)) AS days_merged,
      |  true AS within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Distinct-INTERSECTION cardinality from sketches — the audience-overlap
    * question ("how many users did BOTH click and purchase?") that a plain
    * distinct-union sketch cannot answer. HLL supports only union, so the
    * intersection comes from inclusion-exclusion over three union-able
    * estimates: |A∩B| = |A| + |B| − |A∪B| — every term computable from the
    * SAME stored per-type sketches the rollup already maintains, so the
    * overlap matrix for any pair of dimensions never rescans raw events
    * and never shuffles raw user ids.
    *
    * Error note (documented, gated): inclusion-exclusion compounds the
    * three estimates' errors, and the RELATIVE error grows as the true
    * intersection shrinks — fine here (event-type audiences overlap
    * heavily; each user emits many event types) and for any
    * large-overlap monitoring question; for small intersections a Theta
    * sketch family (which intersects natively) is the right tool. The
    * oracle pins exact counts and the bound flag.
    */
  def sketchIntersect(s: SparkSession, dir: String): DataFrame = {
    val perType = events(s, dir)
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), LgK).as("sk"),
        countDistinct(col("user_id")).as("exact_n"))
    val a = perType.select(col("event_type").as("type_a"),
      col("sk").as("sk_a"), col("exact_n").as("n_a"))
    val b = perType.select(col("event_type").as("type_b"),
      col("sk").as("sk_b"), col("exact_n").as("n_b"))
    // exact gate: dedup to (user, type) FIRST (≤ |users|·|types| rows),
    // then self-join — never a raw event × event join
    val ut = events(s, dir).select(col("user_id"), col("event_type")).distinct()
    val exactBoth = ut.alias("x")
      .join(ut.alias("y"), Seq("user_id"))
      .where(col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(countDistinct(col("user_id")).as("exact_both"))
    a.join(b, col("type_a") < col("type_b"))
      .withColumn("approx_both",
        hll_sketch_estimate(col("sk_a")) + hll_sketch_estimate(col("sk_b")) -
          hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))))
      .join(exactBoth, Seq("type_a", "type_b"))
      .select(
        col("type_a"), col("type_b"), col("exact_both"),
        (abs(col("approx_both") - col("exact_both")) * 100.0 /
          greatest(col("exact_both"), lit(1L)) <= HllRollupErrPctBound * 3)
          .as("within_bound"))
      .orderBy("type_a", "type_b")
  }

  /** The exact-side oracle self-joins DISTINCT (user, type) pairs — the
    * same result as the engine's exact branch. */
  val sketchIntersectSql: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  count(DISTINCT a.user_id) AS exact_both,
      |  true AS within_bound
      |FROM ut a JOIN ut b
      |  ON a.user_id = b.user_id AND a.event_type < b.event_type
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- one-pass table profile --------------------------------------------

  /** Deequ-style column profile of the `documents` table in ONE scan: for
    * every column — null count, exact distinct count, min/max
    * representation, and a mean for the numeric ones. The aggregate
    * produces a single wide row (all measures in one pass); the long-form
    * per-column output is a driver-free `inline` over that row.
    *
    * Scale notes: multiple exact `countDistinct`s in one aggregate plan as
    * a single scan with an Expand (×5 row multiplier before partial
    * aggregation) — the honest exact form, and what the DuckDB oracle can
    * check. At 100 TB you flip `exact = false`: `approx_count_distinct`
    * partials are mergeable sketches, the Expand disappears, and the scan
    * is one pass with no multiplier (ProfileSpec pins approx within 2% of
    * exact). `text` is profiled by md5 (distinct) and length (min/max/avg)
    * so no full-text bytes ever enter the shuffle.
    */
  def profileTable(s: SparkSession, dir: String, exact: Boolean = true): DataFrame =
    profileTableOf(Tables.read(s, dir, "documents"), exact)

  /** Core form over any documents-shaped frame (ScaleProbe drives this at
    * synthetic 1×/10× corpus sizes; n_chars may be derived). */
  def profileTableOf(docsIn: DataFrame, exact: Boolean): DataFrame = {
    val docs =
      if (docsIn.columns.contains("n_chars")) docsIn
      else docsIn.withColumn("n_chars", length(col("text")).cast("long"))
    def dcount(c: Column): Column =
      if (exact) countDistinct(c) else approx_count_distinct(c, rsd = 0.01)
    def nulls(name: String): Column =
      sum(when(col(name).isNull, 1L).otherwise(0L))
    def profRow(name: String, distinctOf: Column, minC: Column, maxC: Column,
        meanC: Column): Column =
      struct(
        lit(name).as("column_name"),
        nulls(name).as("n_nulls"),
        dcount(distinctOf).as("n_distinct"),
        min(minC).cast("string").as("min_repr"),
        max(maxC).cast("string").as("max_repr"),
        round(meanC, 4).as("mean_numeric"))
    val wide = docs.agg(
      count(lit(1)).as("n_rows"),
      profRow("doc_id", col("doc_id"), col("doc_id"), col("doc_id"),
        avg(col("doc_id"))).as("p_doc_id"),
      profRow("text", md5(col("text")), length(col("text")), length(col("text")),
        avg(length(col("text")))).as("p_text"),
      profRow("lang", col("lang"), col("lang"), col("lang"),
        lit(null).cast("double")).as("p_lang"),
      profRow("source", col("source"), col("source"), col("source"),
        lit(null).cast("double")).as("p_source"),
      profRow("n_chars", col("n_chars"), col("n_chars"), col("n_chars"),
        avg(col("n_chars"))).as("p_n_chars"))
    wide.select(
      col("n_rows"),
      explode(array(col("p_doc_id"), col("p_text"), col("p_lang"),
        col("p_source"), col("p_n_chars"))).as("p"))
      .select(col("p.column_name"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_repr"), col("p.max_repr"),
        col("p.mean_numeric"))
      .orderBy("column_name")
  }

  /** One UNION ALL arm per column — the oracle may rescan; the engine may
    * not (the single-pass shape is the point of the Spark side). */
  val profileTableSql: String =
    """SELECT 'doc_id' AS column_name, count(*) AS n_rows,
      |  sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
      |  count(DISTINCT doc_id) AS n_distinct,
      |  min(doc_id)::VARCHAR AS min_repr, max(doc_id)::VARCHAR AS max_repr,
      |  round(avg(doc_id), 4) AS mean_numeric FROM documents
      |UNION ALL
      |SELECT 'text', count(*),
      |  sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT,
      |  count(DISTINCT md5(text)),
      |  min(length(text))::VARCHAR, max(length(text))::VARCHAR,
      |  round(avg(length(text)), 4) FROM documents
      |UNION ALL
      |SELECT 'lang', count(*),
      |  sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT,
      |  count(DISTINCT lang), min(lang), max(lang), NULL::DOUBLE FROM documents
      |UNION ALL
      |SELECT 'source', count(*),
      |  sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT,
      |  count(DISTINCT source), min(source), max(source), NULL::DOUBLE
      |FROM documents
      |UNION ALL
      |SELECT 'n_chars', count(*),
      |  sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT,
      |  count(DISTINCT n_chars), min(n_chars)::VARCHAR, max(n_chars)::VARCHAR,
      |  round(avg(n_chars), 4) FROM documents
      |ORDER BY column_name""".stripMargin
}
