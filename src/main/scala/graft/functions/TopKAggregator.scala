package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregate — the `Aggregator` tier SURVEY §2.11 names
  * for opaque per-group computations (reference anchor: the classifier ABC
  * of categorize-trail-conditions/src/classifier.py:7-17, whose plug-in
  * surface becomes exactly this shape when the model can't be expressed as
  * Catalyst expressions).
  *
  * Semantics: keep the k largest (score, id) pairs, ties broken to the
  * SMALLER id (deterministic, oracle-able). The buffer is a sorted
  * ≤k-element list, so:
  *  - `reduce` is O(k) per row and the buffer never grows past k — partial
  *    (map-side) aggregation holds per-partition state of k rows, not the
  *    row stream;
  *  - `merge` is a bounded merge of two ≤k lists — each shuffle partition
  *    emits k rows per group instead of its whole slice. At 100 TB the
  *    exchange for a grouped top-k moves groups·k rows, the same bound the
  *    WindowGroupLimit path achieves for ranked windows.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Seq.empty

  // descending score, ascending id on ties
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    val (front, back) = buf.span(better(_, x))
    (front ++ (x +: back)).take(k)
  }

  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, row)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
