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
