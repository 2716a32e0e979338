package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.CorpusOps

/** Rate-controlled mixture admission — the STREAMING twin of
  * [[CorpusOps.mixtureSample]]. A continuously-ingesting pipeline cannot
  * rank the whole corpus to fill a mixture; it admits per source as
  * documents arrive and closes each source when its quota fills:
  *
  *  - quotas reuse the batch op's exact rounding contract
  *    (round(budget · fraction), independent per source);
  *  - admission is first-arrival within micro-batch, doc_id-ordered inside
  *    a batch so replays of the same file drop are deterministic (the same
  *    rule [[StreamingDedup.incrementalNearPairs]] uses);
  *  - sources not in the mixture spec have quota 0 — a mixture defines the
  *    OUTPUT corpus, not a filter over it (same contract as batch).
  *
  * State per source is ONE long (the admitted count) — bounded by the
  * mixture spec's size forever, regardless of stream length: the 100 TB
  * state story is |mixture| × 8 bytes. The batch form stays the right tool
  * for curriculum WEIGHTING (it ranks by the Efraimidis–Spirakis key);
  * this form is the admission-control gate a live ingest runs.
  */
object StreamingSampler {

  final case class Admitted(
      source: String, doc_id: Long, admit_seq: Long, target_k: Long)

  final case class TokenAdmitted(
      source: String, doc_id: Long, n_tok: Long, cum_tokens: Long, budget: Long)

  /** Token-budget admission — the STREAMING twin of
    * [[CorpusOps.tokenBudgetSelect]]'s budget contract. A live ingest
    * cannot rank the corpus by quality before admitting; it gates on
    * TOKENS as documents arrive: a doc is admitted iff its source's
    * admitted-token total plus its own tokens still fits that source's
    * budget (skipped docs do NOT close the gate — a later shorter doc may
    * still fit, the classic token-bucket rule). doc_id order within a
    * micro-batch makes file-drop replays deterministic.
    *
    * State per source is ONE long (admitted tokens) — |sources| × 8 bytes
    * forever. The batch form remains the right tool for QUALITY-ranked
    * selection; this is the admission-control gate in front of it.
    */
  def tokenBudgetAdmit(
      spark: SparkSession, docs: DataFrame,
      budgetPerSource: Long = 2000L): Dataset[TokenAdmitted] = {
    import spark.implicits._
    docs.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(String, Long, Long)], state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val admitted = rows.toVector.sortBy(_._2).flatMap { case (_, id, n) =>
            if (used + n <= budgetPerSource) {
              used += n
              Some(TokenAdmitted(src, id, n, used, budgetPerSource))
            } else None
          }
          state.update(used)
          admitted.iterator
      }
  }

  def mixtureAdmit(
      spark: SparkSession, docs: DataFrame,
      mixture: Seq[(String, Double)] = CorpusOps.DefaultMixture,
      budget: Int = 20): Dataset[Admitted] = {
    import spark.implicits._
    // same largest-remainder quotas as the batch op → streamed == batch
    val quota: Map[String, Long] = CorpusOps.apportion(mixture, budget).toMap
    val q = spark.sparkContext.broadcast(quota)
    docs.select(col("source"), col("doc_id")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val k = q.value.getOrElse(src, 0L)
          var n = state.getOption.getOrElse(0L)
          // doc_id order within the micro-batch → deterministic replay
          val admitted = rows.map(_._2).toVector.sorted.flatMap { id =>
            if (n < k) { n += 1; Some(Admitted(src, id, n, k)) } else None
          }
          state.update(n)
          admitted.iterator
      }
  }
}
