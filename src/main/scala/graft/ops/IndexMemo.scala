package graft.ops

import scala.collection.concurrent.TrieMap

/** Shared keyed memo for per-(session, input) materialized index tables —
  * shingle index, verified pair table, LSH signatures, k-means centroids,
  * PQ codebooks/codes. One place for the two rules every cache must obey:
  *
  *  - build-once under a lock: bare `TrieMap.getOrElseUpdate` may evaluate
  *    the thunk twice under concurrent first use, orphaning a persisted
  *    DataFrame that nothing can ever unpersist;
  *  - entries intentionally live for the session lifetime: each value is a
  *    bounded index artifact (∝ vocabulary / near-dup pairs / k·dim), the
  *    in-memory stand-in for the table a production run would materialize
  *    to storage once per corpus version. A long-lived service wanting
  *    eviction would add it HERE, not at six call sites.
  */
private[ops] object IndexMemo {
  def apply[K, V](cache: TrieMap[K, V], key: K)(build: => V): V =
    cache.synchronized { cache.getOrElseUpdate(key, build) }
}
