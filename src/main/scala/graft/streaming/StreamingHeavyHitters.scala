package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the streaming face of the Count-Min batch
  * query (`q_t_cms_heavy_hitters`): per-shard Misra-Gries summaries over
  * an unbounded term stream with HARD-BOUNDED state. Each term is
  * hash-assigned to one of `nShards` key groups upstream (stateless,
  * map-side — the [[StreamingCentroids]] assignment posture), and every
  * shard keeps at most `k` (term, count) entries: total state is
  * O(nShards · k) whatever the traffic.
  *
  * The Misra-Gries deal, honestly stated: counts never OVERcount, and
  * per shard the undercount is at most n_shard/(k+1) — so every term
  * with true shard frequency above n_shard/(k+1) is guaranteed present.
  * Because a term lives in exactly ONE shard (hash routing), the bound
  * needs no cross-summary merge slop. Unlike the HLL DAU sketch, an MG
  * summary is arrival-order-dependent, so different micro-batch splits
  * may produce different (all bound-satisfying) summaries — the spec
  * pins the BOUNDS and the coverage guarantee, not bit-equality, which
  * is the real contract of this sketch family. Within a batch, rows
  * fold in (ts, seq) order — the [[StatefulDedup]] determinism
  * discipline — so a fixed split replays identically.
  */
object StreamingHeavyHitters {

  case class TermIn(shard: Long, term: String, ts: Timestamp, seq: Long)
  case class MgState(counts: Map[String, Long], nItems: Long)
  case class ShardSummary(shard: Long, n_items: Long,
      entries: Map[String, Long])

  /** Stateless upstream shard router (JVM String.hashCode — fixed by the
    * JLS, so the routing replays anywhere).
    */
  def shardOf(term: String, nShards: Int): Long =
    math.floorMod(term.hashCode, nShards).toLong

  /** One Misra-Gries step: increment a tracked term, adopt an untracked
    * one while capacity remains, else decrement every tracked count
    * (dropping zeros) — the classic frequent-items fold.
    */
  private[streaming] def mgFold(st: MgState, k: Int,
      terms: Iterator[String]): MgState = {
    var counts = st.counts
    var n = st.nItems
    terms.foreach { t =>
      n += 1
      counts.get(t) match {
        case Some(c) => counts = counts.updated(t, c + 1)
        case None if counts.size < k => counts = counts.updated(t, 1L)
        case None =>
          counts = counts.iterator
            .map { case (w, c) => (w, c - 1) }
            .filter(_._2 > 0).toMap
      }
    }
    MgState(counts, n)
  }

  /** Attach to a shard-routed term stream; emits each touched shard's
    * current summary per micro-batch (Update mode). State never exceeds
    * k entries per shard.
    */
  def attach(terms: Dataset[TermIn], k: Int): Dataset[ShardSummary] = {
    import terms.sparkSession.implicits._
    terms
      .groupByKey(_.shard)
      .flatMapGroupsWithState[MgState, ShardSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Long, rows: Iterator[TermIn], state: GroupState[MgState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.seq))
          val st0 = state.getOption.getOrElse(MgState(Map.empty, 0L))
          val st = mgFold(st0, k, sorted.iterator.map(_.term))
          state.update(st)
          Iterator(ShardSummary(shard, st.nItems, st.counts))
      }
  }
}
