package graft.ops

import scala.collection.concurrent.TrieMap

/** Shared keyed memo for per-(session, input) materialized index tables —
  * shingle index, verified pair table, LSH signatures, k-means centroids,
  * PQ codebooks/codes. One place for the two rules every cache must obey:
  *
  *  - build-once PER KEY, concurrent across keys: the cache maps each key
  *    to a lazy holder installed atomically (`TrieMap.getOrElseUpdate` is
  *    atomic; a losing racer's holder is discarded unforced), and the
  *    holder's `lazy val` monitor is the build lock — so one key never
  *    builds twice (no orphaned persisted DataFrame), while two sessions
  *    building *different* keys proceed in parallel instead of serializing
  *    behind one global monitor for the full Spark-job duration;
  *  - entries intentionally live for the session lifetime: each value is a
  *    bounded index artifact (∝ vocabulary / near-dup pairs / k·dim), the
  *    in-memory stand-in for the table a production run would materialize
  *    to storage once per corpus version. A long-lived service wanting
  *    eviction would add it HERE, not at seven call sites.
  */
private[ops] object IndexMemo {
  /** Per-key build cell: the `lazy val` monitor is the per-key lock. */
  final class Lazily[V](build: () => V) { lazy val value: V = build() }

  type Cache[K, V] = TrieMap[K, Lazily[V]]

  def cache[K, V](): Cache[K, V] = TrieMap.empty

  def apply[K, V](c: Cache[K, V], key: K)(build: => V): V =
    c.getOrElseUpdate(key, new Lazily(() => build)).value
}
