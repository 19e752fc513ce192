package graft

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Central registry of the per-(session, dir) memoized build-stage maps
  * (the miner/CC/fused-retrieval/indicator-finals one-shot builds). Each
  * query pack still owns its map — registration only makes the
  * population OBSERVABLE, so the session-churn endurance probe
  * (VERDICT r13 #3) can assert the whole memo tier stays bounded: every
  * memo entry's eviction callback is wired to [[CacheScope.release]],
  * so bounded live CacheScope sessions (the [[CacheScope.maxSessions]]
  * high-water auto-release) implies a bounded memo tier — this registry
  * is how the probe checks that implication instead of assuming it.
  *
  * r15: key and value types are generic (key's first component must stay
  * the session — that is what the churn probe counts); the registry only
  * ever reads size and the session component, so the widening changes
  * nothing for the existing (session, dir) → DataFrame maps while
  * letting the TiledScan layout memo and the quality-filter fit memo
  * (richer keys, non-frame values) join the same observable tier.
  */
object Memos {
  private val maps = scala.collection.mutable.ArrayBuffer
    .empty[TrieMap[_ <: (SparkSession, Any), _]]

  private[graft] def register[K2, V](
      m: TrieMap[(SparkSession, K2), V])
      : TrieMap[(SparkSession, K2), V] = synchronized {
    maps += m
    m
  }

  /** Total entries across every registered memo. */
  private[graft] def totalEntries: Int = synchronized { maps.map(_.size).sum }

  /** Distinct sessions currently keying at least one memo entry. */
  private[graft] def sessionCount: Int =
    synchronized { maps.flatMap(_.keysIterator.map(_._1)).toSet.size }
}
