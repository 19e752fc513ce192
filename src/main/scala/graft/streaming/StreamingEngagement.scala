package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming DAU — distinct users per day over an unbounded event stream
  * with BOUNDED state: one dense HyperLogLog sketch (p=12 → 4096 byte
  * registers ≈ 4 KiB) per in-flight day, instead of the per-day user SET a
  * naive `dropDuplicates` holds (O(users/day) — the thing that does not
  * survive a 100 TB/day firehose). Closed days are evicted by event-time
  * timeout once the watermark passes day-end + TTL, so live state is
  * O(days in flight) × 4 KiB — the calendar, not the traffic.
  *
  * Determinism contract (stronger than most sketch pipelines): the HLL
  * register update is a per-register MAX, so the fold is commutative,
  * associative and idempotent — the final registers are BIT-IDENTICAL
  * under ANY micro-batch split, any within-batch iterator order, and
  * re-delivery of the same rows. StreamingSpec pins stream == batch fold
  * equality and split-invariance exactly (no tolerance). The estimator
  * avoids `Math.pow`/`Math.log` platform drift: ranks are exact powers of
  * two (1/2^r) and the small-range branch uses StrictMath.log.
  *
  * The day key arrives as epoch-days (computed map-side upstream — same
  * stateless-assignment posture as [[StreamingCentroids]]); `ts` carries
  * event time for the watermark.
  */
object StreamingEngagement {

  val P: Int = 12
  val M: Int = 1 << P

  case class EventIn(day: Long, user_id: Long, ts: Timestamp)
  /** `timeoutMs` mirrors [[StatefulDedup.SeenState]]: the public
    * GroupState API can't read back the last timeout, so it rides in the
    * state to keep eviction monotone.
    */
  case class DayState(regs: Array[Byte], timeoutMs: Long = 0L)
  case class DayUsers(day: Long, users_est: Long, filled_registers: Int)

  /** SplitMix64 finalizer — public-domain integer avalanche; fixed here so
    * stream, batch twin, and any replay hash identically.
    */
  def hash64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Fold user ids into registers: top P hash bits pick the register, the
    * rank is leading-zeros-of-the-rest + 1 (capped at 64-P+1). Per-register
    * MAX — order-independent by construction.
    */
  def fold(regs: Array[Byte], users: Iterator[Long]): Array[Byte] = {
    val out = if (regs.isEmpty) new Array[Byte](M) else regs.clone()
    users.foreach(foldOne(out, _))
    out
  }

  /** One user id into the registers in place — the streaming hot path. */
  private def foldOne(out: Array[Byte], u: Long): Unit = {
    val h = hash64(u)
    val idx = (h >>> (64 - P)).toInt
    val rest = h << P
    val rank =
      (if (rest == 0L) (64 - P) + 1
       else java.lang.Long.numberOfLeadingZeros(rest) + 1).toByte
    if (rank > out(idx)) out(idx) = rank
  }

  /** Standard dense-HLL estimate with the linear-counting small-range
    * correction. Pure function of the registers; exact powers of two and
    * StrictMath keep it bit-stable across JVMs.
    */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1.0 / (1L << regs(i)).toDouble
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val e = alpha * m * m / sum
    val est =
      if (e <= 2.5 * m && zeros > 0) m * StrictMath.log(m.toDouble / zeros)
      else e
    StrictMath.rint(est).toLong
  }

  def filled(regs: Array[Byte]): Int = regs.count(_ != 0)

  /** Attach to a day-keyed event stream; emits the touched days' running
    * estimates each micro-batch (Update mode). `ttlMs` is how long past a
    * day's last event the sketch stays resident before event-time
    * eviction.
    */
  def attach(events: Dataset[EventIn], watermarkDelay: String,
      ttlMs: Long): Dataset[DayUsers] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.day)
      .flatMapGroupsWithState[DayState, DayUsers](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (day: Long, rows: Iterator[EventIn], state: GroupState[DayState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st0 = state.getOption.getOrElse(DayState(Array.empty))
            // ONE streaming pass over the group iterator: the fold is a
            // per-register max (order-independent), so nothing requires
            // materializing the (day x micro-batch) rows — a firehose
            // day's batch slice streams through in O(1) heap where a
            // toSeq would hold it whole (the order-DEPENDENT siblings —
            // StatefulDedup, StatefulIndicators, heavy hitters — must
            // sort and so must buffer; this op need not).
            val regs =
              if (st0.regs.isEmpty) new Array[Byte](M) else st0.regs.clone()
            var maxTs = Long.MinValue
            var any = false
            rows.foreach { r =>
              any = true
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
              foldOne(regs, r.user_id)
            }
            // Timeout clamp: past the watermark, never backward — the
            // StatefulDedup monotonicity contract (ADVICE r6).
            val wm = state.getCurrentWatermarkMs()
            val dataTimeout = if (any) maxTs + ttlMs else Long.MinValue
            val timeout =
              math.max(math.max(dataTimeout, wm + 1), st0.timeoutMs)
            state.update(DayState(regs, timeout))
            state.setTimeoutTimestamp(timeout)
            Iterator(DayUsers(day, estimate(regs), filled(regs)))
          }
      }
  }
}
