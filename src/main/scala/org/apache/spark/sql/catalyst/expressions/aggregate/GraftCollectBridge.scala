package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** In-package accessor for Spark's [[CollectTopK]] (`private[aggregate]`):
  * a bounded-priority-queue collect whose aggregation buffer holds at
  * most `num` values per group — O(k) memory regardless of group size,
  * with map-side partial merges. The graft stats ledgers use it to
  * record per-file extreme-value prefixes without `collect_list`'s
  * O(rows-per-group) buffer.
  *
  * `reverse = false` keeps the LARGEST `num` values under the column
  * type's natural ordering, `reverse = true` the smallest (Spark's
  * rank-limit-pushdown semantics); element order inside the returned
  * array is heap order, so callers sort the ≤k results themselves.
  */
object GraftCollectBridge {
  def collectTopK(e: Expression, num: Int, reverse: Boolean): CollectTopK =
    CollectTopK(e, num, reverse)
}
