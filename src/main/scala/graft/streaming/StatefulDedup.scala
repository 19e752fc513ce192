package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact-hash streaming dedup with BOUNDED state — the piece the
  * incremental ingest gates (which probe a persisted, ever-growing corpus
  * index) deliberately leave open. One [[StatefulDedup.SeenState]] per
  * content key, evicted by EVENT-TIME timeout once the watermark passes
  * last-seen + TTL: state size is O(keys seen within the TTL window), not
  * O(corpus), which is what lets the gate run forever on a 100 TB/day
  * stream. Production pairs the two: TTL state catches the hot window's
  * duplicates cheaply; periodic compaction into the persisted band index
  * (NearDup.incrementalDedup) owns history.
  *
  * Semantics: the first arrival of a key within a TTL window passes
  * (`is_dup = false`, `first_doc` = itself); every later arrival while
  * the state lives is flagged with the surviving doc. Within a
  * micro-batch the group iterator is unordered, so rows fold in
  * (ts, doc_id) order — the same determinism contract as
  * [[StatefulIndicators]]. After eviction a re-arrival passes again — by
  * design: TTL dedup answers "seen RECENTLY", the corpus index answers
  * "seen EVER".
  */
object StatefulDedup {

  /** `key` is the content hash (e.g. [[graft.functions.RollingHash]] of
    * canonicalized text) — upstream computes it map-side.
    */
  case class DocIn(key: Long, doc_id: Long, ts: Timestamp)
  /** `timeoutMs` carries the last timeout we set so a later batch can
    * guarantee monotonicity (the public GroupState API can't read it
    * back); 0 = never set.
    */
  case class SeenState(firstDoc: Long, firstTsMs: Long,
      timeoutMs: Long = 0L)
  case class DedupOut(key: Long, doc_id: Long, ts: Timestamp,
      is_dup: Boolean, first_doc: Long)

  def attach(docs: Dataset[DocIn], watermarkDelay: String,
      ttlMs: Long): Dataset[DedupOut] = {
    import docs.sparkSession.implicits._
    docs.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[SeenState, DedupOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[DocIn], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var st = state.getOption
            val out = sorted.map { r =>
              st match {
                case Some(s0) =>
                  DedupOut(key, r.doc_id, r.ts, is_dup = true, s0.firstDoc)
                case None =>
                  st = Some(SeenState(r.doc_id, r.ts.getTime))
                  DedupOut(key, r.doc_id, r.ts, is_dup = false, r.doc_id)
              }
            }
            st.foreach { s0 =>
              val lastTs = sorted.lastOption.map(_.ts.getTime)
                .getOrElse(s0.firstTsMs)
              // Spark requires the timeout to sit strictly past the
              // current watermark (late-but-accepted rows can put
              // lastTs + ttl behind it → IllegalArgumentException kills
              // the query), and a late-rows-only batch must never pull
              // an already-set timeout earlier — clamp to both; the
              // previously-set value rides in the state because the
              // public GroupState API can't read it back.
              val timeout = math.max(
                math.max(lastTs + ttlMs, state.getCurrentWatermarkMs() + 1),
                s0.timeoutMs)
              state.update(s0.copy(timeoutMs = timeout))
              state.setTimeoutTimestamp(timeout)
            }
            out.iterator
          }
      }
  }
}
